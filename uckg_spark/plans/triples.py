"""Triple emission as Catalyst plans — the RML mapper, re-expressed.

Every emitter mirrors an oracle emitter in uckg_spark.oracle.emitters
(set-equality tested on fixtures). Declarative DataFrame ops only: the
emission is explode + project + filter + union — no Python in the row path
(SURVEY.md §4: everything Catalyst-visible). At 10^12-doc scale these
emitters run over mention-filtered entity sets, so their inputs are small;
the same plans also run over full dictionary batches for reference parity.

Semantics notes (shared with the oracle, see oracle/emitters.py docstring):
null ⇒ no triple AND "" ⇒ no triple (P7); booleans always emit;
ucorelatedWeakness never emits (dual RML typo); F3 repair drops the whole
fraction of >3-digit dateTime literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel import templates as T

TRIPLE_COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]


def _lit_plan(df: DataFrame, subj: Column, plan: list[tuple[str, Column, str | None]]) -> DataFrame:
    """Explode a (pred, obj, datatype) literal plan; P7 filter applied."""
    arr = F.array(*[
        F.struct(
            F.lit(p).alias("pred"),
            o.cast("string").alias("obj"),
            F.lit(dt).cast("string").alias("dt"),
        )
        for (p, o, dt) in plan
    ])
    return (
        df.select(subj.alias("subj"), F.explode(arr).alias("t"))
        .filter(F.col("t.obj").isNotNull() & (F.col("t.obj") != ""))
        .select(
            "subj",
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.lit(True).alias("obj_is_literal"),
            F.col("t.dt").alias("obj_datatype"),
        )
    )


def _bool_col(c: Column) -> Column:
    return F.when(c, F.lit("true")).otherwise(F.lit("false"))


def _uri_plan(df: DataFrame, subj: Column, plan: list[tuple[str, Column]]) -> DataFrame:
    """Edge triples (pred, obj_uri). Null objs dropped (P7 on templates)."""
    arr = F.array(*[
        F.struct(F.lit(p).alias("pred"), o.cast("string").alias("obj"))
        for (p, o) in plan
    ])
    return (
        df.select(subj.alias("subj"), F.explode(arr).alias("t"))
        .filter(F.col("t.obj").isNotNull())
        .select(
            "subj",
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_datatype"),
        )
    )


def _type_plan(df: DataFrame, pairs: list[tuple[Column, str]]) -> DataFrame:
    """rdf:type triples for (subject_expr, class) pairs."""
    arr = F.array(*[
        F.struct(s.cast("string").alias("subj"), F.lit(c).alias("obj"))
        for (s, c) in pairs
    ])
    return (
        df.select(F.explode(arr).alias("t"))
        .filter(F.col("t.subj").isNotNull())
        .select(
            F.col("t.subj").alias("subj"),
            F.lit(T.RDF_TYPE).alias("pred"),
            F.col("t.obj").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_datatype"),
        )
    )


def _union(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------------------
# F2 / F3 datetime expressions (kernel parity: kernel/datetimes.py)
# ---------------------------------------------------------------------------


def format_datetime_col(c: Column) -> Column:
    """F2: "D H:M:S.ffffff" → "DTH:M:S.fff" (keep FIRST ≤3 fractional
    digits) — cve_collection.py:208-221."""
    return F.regexp_replace(c, r"^(\S+) ([^.]+)\.(\d{1,3})\d*$", "$1T$2.$3")


def repair_and_dedup(triples: DataFrame) -> DataFrame:
    """F3 (ontology_updater.py:19-23: WHOLE fraction dropped when >3
    digits) + A1 global set dedup (rdflib Graph semantics)."""
    fixed = F.when(
        F.col("obj_datatype") == T.XSD_DATETIME,
        F.regexp_replace(F.col("obj"), r"\.\d{4,}$", ""),
    ).otherwise(F.col("obj"))
    return triples.withColumn("obj", fixed).dropDuplicates(
        ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]
    )


# ---------------------------------------------------------------------------
# CVE batch — record build (P1/P6/P9/P10/J1/F2) + emission (cve_rml.ttl)
# ---------------------------------------------------------------------------


def build_cve_stage(
    cve_dim: DataFrame, cwe_dim: DataFrame, cpe_dim: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (records, cwe_pairs, cpe_pairs) — the collector's projection
    (cve_collection.py:380-446) as Catalyst plans:

    - P10 truncation: configurations after the first structurally-invalid
      one (empty nodes / empty cpeMatch) are dropped via higher-order
      functions — no Python, no explode until the valid prefix is known.
    - P9 first-match: nodes[0].cpeMatch[0] via element_at(..., 1).
    - P6 membership: broadcast join on TRIM(value) == id_value, original
      value kept (the strip-check/emit-original quirk, :384-389).
    - J1 dictionary lookup: broadcast LEFT join, dictionary_found flag
      (:396-420). Miss rows carry only cpeName (+flag), like the
      reference's minimal struct.
    """
    # first structurally-invalid configuration (1-based); 0 → none invalid.
    # F.get (0-based, null on out-of-range) instead of element_at: ANSI mode
    # (Spark 4 default) makes element_at throw on empty arrays.
    invalid_flags = F.transform(
        "configurations",
        lambda c: (F.size(c) == 0) | (F.size(F.get(c, 0)) == 0),
    )
    pos = F.array_position(invalid_flags, F.lit(True))
    first_invalid = F.when(pos == 0, F.size("configurations") + 1).otherwise(pos)

    records = (
        cve_dim.withColumn("_first_invalid", first_invalid)
        .withColumn(
            "valid_criteria",
            F.filter(
                F.transform(
                    F.filter(
                        F.transform(
                            "configurations",
                            lambda c, i: F.struct(c.alias("cfg"), i.alias("idx")),
                        ),
                        lambda s: s["idx"] < F.col("_first_invalid") - 1,
                    ),
                    lambda s: F.get(F.get(s["cfg"], 0), 0),
                ),
                lambda crit: crit.isNotNull() & (crit != ""),
            ),
        )
        .withColumn("published", format_datetime_col(F.col("published_raw")))
        .withColumn("lastModified", format_datetime_col(F.col("lastModified_raw")))
        .drop("_first_invalid")
    )

    # P6/J2: explode weakness values, broadcast membership join
    cwe_pairs = (
        records.select(F.col("id").alias("cve_id"), F.explode("weakness_values").alias("wv"))
        .join(
            F.broadcast(cwe_dim.select(F.col("id_value").alias("_cwe_id"))),
            F.trim(F.col("wv")) == F.col("_cwe_id"),
            "inner",
        )
        .select("cve_id", F.col("wv").alias("cwe_value"))
    )

    # J1: explode valid criteria, broadcast left join vs CPE dictionary
    cpe_pairs = (
        records.select(F.col("id").alias("cve_id"), F.explode("valid_criteria").alias("criteria"))
        .join(
            F.broadcast(
                cpe_dim.select(
                    F.col("cpeName").alias("_cpeName"),
                    F.col("cpeNameId").alias("_cpeNameId"),
                    F.col("lastModified").alias("_lastModified"),
                    F.col("titles_lang_lit").alias("_titles"),
                )
            ),
            F.col("criteria") == F.col("_cpeName"),
            "left",
        )
        .select(
            "cve_id",
            F.coalesce(F.col("_cpeName"), F.col("criteria")).alias("cpeName"),
            F.col("_cpeNameId").alias("cpeNameId"),
            F.col("_lastModified").alias("cpeLastModified"),
            F.col("_titles").alias("titles"),
            F.col("_cpeName").isNotNull().alias("dictionary_found"),
        )
    )
    return records, cwe_pairs, cpe_pairs


def emit_cve_batch(
    records: DataFrame, cwe_pairs: DataFrame, cpe_pairs: DataFrame
) -> DataFrame:
    """mapping/cve/cve_rml.ttl — all five TriplesMaps."""
    vuln = F.concat(F.lit(T.UCO_HASH + "VULN-"), F.col("id"))
    cve = F.concat(F.lit(T.UCO_HASH), F.col("id"))

    parts = [
        # VULMap types + datatype predicates (:20-66)
        _type_plan(records, [(vuln, T.CL_VULNERABILITY), (cve, T.CL_CVE)]),
        _lit_plan(records, vuln, [
            (T.P_PUBLISHED, F.col("published"), T.XSD_DATETIME),
            (T.P_LAST_MODIFIED, F.col("lastModified"), T.XSD_DATETIME),
        ]),
        _lit_plan(
            records.select("id", F.explode("descriptions").alias("d")),
            F.concat(F.lit(T.UCO_HASH + "VULN-"), F.col("id")),
            [(T.P_SUMMARY, F.col("d.value"), T.XSD_STRING)],
        ),
        _uri_plan(records, vuln, [(T.P_HAS_CVE_ID, cve)]),
        # CVEMap (:69-145)
        _lit_plan(records, cve, [
            (T.RDFS_LABEL, F.col("id"), T.XSD_STRING),
            (T.P_VULN_STATUS, F.col("vulnStatus"), T.XSD_STRING),
            (T.P_VECTOR_STRING, F.col("vectorString"), T.XSD_STRING),
            (T.P_BASE_SEVERITY, F.col("baseSeverity"), T.XSD_STRING),
            (T.P_EXPLOITABILITY, F.col("exploitabilityScore"), T.XSD_STRING),
            (T.P_IMPACT, F.col("impactScore"), T.XSD_STRING),
            (T.P_OBTAIN_ALL_PRIV, _bool_col(F.col("obtainAllPrivilege")), T.XSD_BOOLEAN),
            (T.P_USER_INTERACTION, _bool_col(F.col("userInteractionRequired")), T.XSD_BOOLEAN),
            (T.P_EVALUATOR_SOLUTION, F.col("evaluatorSolution"), T.XSD_STRING),
        ]),
    ]

    cve_of_pair = F.concat(F.lit(T.UCO_HASH), F.col("cve_id"))
    cpe_uri = F.concat(F.lit(T.EX_HASH), F.col("cpeName"))
    parts += [
        # ucoexhasCPE edges + object types (:72-78)
        _uri_plan(cpe_pairs, cve_of_pair, [(T.P_HAS_CPE, cpe_uri)]),
        _type_plan(cpe_pairs, [(cpe_uri, T.CL_CPE)]),
        # CPEMap (:146-194)
        _lit_plan(cpe_pairs, cpe_uri, [
            (T.P_CPE_NAME, F.col("cpeName"), T.XSD_STRING),
            (T.P_CPE_NAME_ID, F.col("cpeNameId"), T.XSD_STRING),
            (T.P_CPE_LAST_MODIFIED, F.col("cpeLastModified"), T.XSD_DATETIME),
            (T.P_CPE_TITLES, F.col("titles"), T.RDF_JSON),
            (T.P_DICTIONARY_FOUND, _bool_col(F.col("dictionary_found")), T.XSD_BOOLEAN),
        ]),
    ]

    et = F.concat(F.lit(T.UCO_HASH + "ExploitTarget-"), F.col("cwe_value"))
    cwe_uri = F.concat(F.lit(T.UCO_HASH), F.col("cwe_value"))
    vuln_of_pair = F.concat(F.lit(T.UCO_HASH + "VULN-"), F.col("cve_id"))
    parts += [
        # CWEMap + CWETypeMap (:197-236)
        _type_plan(cwe_pairs, [
            (et, T.CL_EXPLOIT_TARGET),
            (vuln_of_pair, T.CL_VULNERABILITY),
            (cwe_uri, T.CL_CWE),
        ]),
        _uri_plan(cwe_pairs, et, [
            (T.P_HAS_VULNERABILITY, vuln_of_pair),
            (T.P_HAS_WEAKNESS, cwe_uri),
        ]),
    ]
    return _union(parts)


# ---------------------------------------------------------------------------
# CWE batch (mapping/cwe/cwe_rml.ttl)
# ---------------------------------------------------------------------------

CWE_LIT_PLAN: list[tuple[str, str, str]] = [
    (T.P_CWE_DESCRIPTION, "description", T.XSD_STRING),
    (T.P_CWE_ID, "id_value", T.XSD_STRING),
    (T.P_COMMON_CONSEQUENCES, "common_consequences", T.XSD_STRING),
    (T.P_TIME_OF_INTRODUCTION, "time_of_introduction", T.XSD_DATETIME),
    (T.P_CWE_SUMMARY, "summary", T.XSD_STRING),
    (T.P_CWE_EXT_SUMMARY, "extended_summary", T.XSD_STRING),
    (T.P_CWE_NAME, "name", T.XSD_STRING),
    (T.P_APPLICABLE_PLATFORM, "applicable_platforms", T.XSD_STRING),
    (T.P_MODES_OF_INTRODUCTION, "modes_of_introduction", T.XSD_STRING),
    (T.P_LIKELIHOOD_OF_EXPLOIT, "likelihood_of_exploit", T.XSD_STRING),
    (T.P_DETECTION_METHODS, "detection_methods", T.XSD_STRING),
    (T.P_POTENTIAL_MITIGATIONS, "potential_mitigations", T.XSD_STRING),
    (T.P_DEMONSTRATIVE_EXAMPLES, "demonstrative_examples", T.XSD_STRING),
    (T.P_REFERENCES, "references", T.XSD_STRING),
    (T.P_MAPPING_NOTES, "mapping_notes", T.XSD_STRING),
    (T.P_RELATED_ATTACK_PATTERNS, "related_attack_patterns_lit", T.XSD_STRING),
    (T.P_ABSTRACTION, "abstraction", T.XSD_STRING),
    (T.P_STRUCTURE, "structure", T.XSD_STRING),
    (T.P_STATUS, "status", T.XSD_STRING),
]


def emit_cwe_batch(cwe_dim: DataFrame) -> DataFrame:
    wid = F.col("id_value")
    et = F.concat(F.lit(T.UCO_HASH + "ExploitTarget-"), wid)
    cwe_uri = F.concat(F.lit(T.UCO_HASH), wid)
    obs = cwe_dim.select(
        "id_value", F.explode("observed_examples").alias("e")
    ).select(
        "id_value",
        F.concat(F.lit(T.EX_HASH), F.col("e.cwe_id"), F.lit("-"), F.col("e.Reference")).alias("ex_uri"),
        F.col("e.Description").alias("ex_desc"),
        F.concat(F.lit(T.UCO_HASH), F.col("e.Reference")).alias("cve_uri"),
    )
    return _union([
        _type_plan(cwe_dim, [(et, T.CL_EXPLOIT_TARGET), (cwe_uri, T.CL_CWE)]),
        # J3 self-join on id_value is identity — emitted directly (:74-83)
        _uri_plan(cwe_dim, et, [(T.P_HAS_WEAKNESS, cwe_uri)]),
        _lit_plan(cwe_dim, cwe_uri, [
            (p, F.col(f), dt) for (p, f, dt) in CWE_LIT_PLAN
        ]),
        # ObservedExampleMap (:20-43) + hasObservedExample (:271-278)
        _type_plan(obs, [(F.col("ex_uri"), T.CL_OBSERVED_EXAMPLE),
                         (F.col("cve_uri"), T.CL_CVE)]),
        _lit_plan(obs, F.col("ex_uri"), [(T.P_OBS_DESCRIPTION, F.col("ex_desc"), T.XSD_STRING)]),
        _uri_plan(obs, F.col("ex_uri"), [(T.P_EXAMPLE_OBSERVED_IN, F.col("cve_uri"))]),
        _uri_plan(obs, F.concat(F.lit(T.UCO_HASH), F.col("id_value")),
                  [(T.P_HAS_OBSERVED_EXAMPLE, F.col("ex_uri"))]),
    ])


# ---------------------------------------------------------------------------
# ATT&CK batch (mapping/attack/attack_rml.ttl)
# ---------------------------------------------------------------------------


def emit_attack_entities(ent_df: DataFrame) -> DataFrame:
    uri = F.concat(F.lit(T.EX_HASH), F.col("ID"))
    cls = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in T.ATTACK_ENTITY_CLASS.items() for x in kv]),
        F.col("kind"),
    )
    types = (
        ent_df.select(uri.alias("subj"), cls.alias("obj"))
        .filter(F.col("obj").isNotNull())
        .select(
            "subj", F.lit(T.RDF_TYPE).alias("pred"), "obj",
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_datatype"),
        )
    )
    lits = _lit_plan(ent_df, uri, [
        (T.P_EX_NAME, F.col("name"), T.XSD_STRING),
        (T.P_EX_DESCRIPTION, F.col("description"), T.XSD_STRING),
        (T.P_EX_URL, F.col("url"), T.XSD_STRING),
        (T.P_EX_DOMAIN, F.col("domain"), T.XSD_STRING),
    ])
    return types.unionByName(lits)


def emit_attack_relationships(ent_df: DataFrame, rel_df: DataFrame) -> DataFrame:
    """7 typed relationship maps (attack_rml.ttl:253-403): P3 null-source
    drop, P5 type-pair filter, J4 inner join validates the target FK."""
    pred_map = F.create_map(*[
        F.lit(x)
        for (st, tt), (pred, _sc, _tc) in T.ATTACK_REL_CATALOG.items()
        for x in (st + "|" + tt, pred)
    ])
    subj_cls_map = F.create_map(*[
        F.lit(x)
        for (st, tt), (_p, subj_cls, _tc) in T.ATTACK_REL_CATALOG.items()
        for x in (st + "|" + tt, subj_cls)
    ])
    pair = F.concat_ws("|", "source_type", "target_type")
    joined = (
        rel_df.filter(F.col("source_id").isNotNull())  # P3 (parse.py:231-234)
        .withColumn("pred", F.try_element_at(pred_map, pair))
        .withColumn("subj_cls", F.try_element_at(subj_cls_map, pair))
        .filter(F.col("pred").isNotNull())  # P5 type-pair predicate
        .join(
            F.broadcast(ent_df.select(F.col("ID").alias("_tid"))),
            F.col("target_id") == F.col("_tid"),
            "inner",  # J4 dangling-FK drop (attack_rml.ttl:267-271)
        )
    )
    subj = F.concat(F.lit(T.EX_HASH), F.col("source_id"))
    obj = F.concat(F.lit(T.EX_HASH), F.col("target_id"))
    edges = joined.select(
        subj.alias("subj"), F.col("pred"), obj.alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_datatype"),
    )
    types = joined.select(
        subj.alias("subj"), F.lit(T.RDF_TYPE).alias("pred"),
        F.col("subj_cls").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_datatype"),
    )
    return edges.unionByName(types)


def emit_attack_batch(ent_df: DataFrame, rel_df: DataFrame) -> DataFrame:
    return emit_attack_entities(ent_df).unionByName(
        emit_attack_relationships(ent_df, rel_df)
    )


# ---------------------------------------------------------------------------
# CAPEC batch (mapping/capec/capec_rml.ttl)
# ---------------------------------------------------------------------------

CAPEC_ARRAY_PLAN: list[tuple[str, str]] = [
    (T.P_CAPEC_EXT_DESCRIPTION, "Extended_Description"),
    (T.P_CAPEC_RELATED_ATT, "Related_Attack_Patterns"),
    (T.P_CAPEC_EXEC_FLOW, "Execution_Flow"),
    (T.P_CAPEC_PREREQUISITES, "Prerequisites"),
    (T.P_CAPEC_SKILLS, "Skills_Required"),
    (T.P_CAPEC_RESOURCES, "Resources_Required"),
    (T.P_CAPEC_MITIGATIONS, "Mitigations"),
    (T.P_CAPEC_EXAMPLE, "Example_Instances"),
    (T.P_CAPEC_RELATED_WEAKNESSES, "Related_Weaknesses"),
    (T.P_CAPEC_TAXONOMY_ATTACK, "Taxonomy_Mappings"),
    (T.P_CAPEC_CONSEQUENCES, "Consequences"),
]


def emit_capec_batch(capec_dim: DataFrame) -> DataFrame:
    uri = F.concat(
        F.lit("https://capec.mitre.org/data/definitions/"), F.col("ID"), F.lit(".html")
    )
    parts = [
        _type_plan(capec_dim, [(uri, T.CL_CAPEC)]),
        _lit_plan(capec_dim, uri, [
            (T.RDFS_LABEL,
             F.concat(F.lit("CAPEC-"), F.col("ID"), F.lit(": "), F.col("Name")),
             T.XSD_STRING),
            (T.P_CAPEC_ID, F.col("ID"), T.XSD_STRING),
            (T.P_CAPEC_NAME, F.col("Name"), T.XSD_STRING),
            (T.P_CAPEC_ABSTRACTION, F.col("Abstraction"), T.XSD_STRING),
            (T.P_CAPEC_LIKELIHOOD, F.col("Likelihood_Of_Attack"), T.XSD_STRING),
            (T.P_CAPEC_SEVERITY, F.col("Typical_Severity"), T.XSD_STRING),
            (T.P_CAPEC_DESCRIPTION, F.col("Description"), T.XSD_STRING),
        ]),
    ]
    # array-valued literal predicates: one triple per element
    for pred, field in CAPEC_ARRAY_PLAN:
        ex = capec_dim.select("ID", F.explode(field).alias("v"))
        parts.append(_lit_plan(
            ex,
            F.concat(F.lit("https://capec.mitre.org/data/definitions/"),
                     F.col("ID"), F.lit(".html")),
            [(pred, F.col("v"), T.XSD_STRING)],
        ))
    # URI-valued edges + object types (:34-40, :161-167 + type maps :175-196)
    rw = capec_dim.select("ID", F.explode("Related_Weaknesses").alias("w"))
    rw_uri = F.concat(F.lit(T.UCO_HASH), F.col("w"))
    tm = capec_dim.select("ID", F.explode("Taxonomy_Mappings").alias("t"))
    tm_uri = F.concat(F.lit(T.EX_HASH), F.col("t"))
    capec_uri_of = F.concat(
        F.lit("https://capec.mitre.org/data/definitions/"), F.col("ID"), F.lit(".html")
    )
    parts += [
        _uri_plan(rw, capec_uri_of, [(T.P_HAS_RELATED_WEAKNESS, rw_uri)]),
        _type_plan(rw, [(rw_uri, T.CL_CWE)]),
        _uri_plan(tm, capec_uri_of, [(T.P_HAS_TAXONOMY_MAPPING, tm_uri)]),
        _type_plan(tm, [(tm_uri, T.CL_ATTACK)]),
    ]
    return _union(parts)


# ---------------------------------------------------------------------------
# D3FEND batch (mapping/d3fend/d3fend_rml.ttl)
# ---------------------------------------------------------------------------


def emit_d3fend_batch(d3_dim: DataFrame) -> DataFrame:
    uri = F.concat(F.lit(T.EX_HASH), F.col("id"))
    off = d3_dim.filter(F.col("off_tech_id").isNotNull() & (F.col("off_tech_id") != ""))
    off_uri = F.concat(F.lit(T.EX_HASH), F.col("off_tech_id"))
    return _union([
        _type_plan(d3_dim, [(uri, T.CL_D3FEND)]),
        # NO ucoexMITRED3FEND_ID triples: rml:reference "d3f:d3fend-id'"
        # stray-quote typo (d3fend_rml.ttl:29) — reproduced
        _lit_plan(d3_dim, uri, [
            (T.P_D3FEND_DEFINITION, F.col("definition"), T.XSD_STRING),
            (T.P_D3FEND_LABEL, F.col("label"), T.XSD_STRING),
        ]),
        _uri_plan(off, F.concat(F.lit(T.EX_HASH), F.col("id")),
                  [(T.P_HAS_MITRE_ATTACK, off_uri)]),
        _type_plan(off, [(off_uri, T.CL_ATTACK)]),
    ])


def emit_all_dictionary_batches(
    cve_dim: DataFrame,
    cwe_dim: DataFrame,
    cpe_dim: DataFrame,
    attack_ents: DataFrame,
    attack_rels: DataFrame,
    capec_dim: DataFrame,
    d3_dim: DataFrame,
) -> DataFrame:
    """U2: union of all per-source batches + F3 repair + A1 dedup — the
    full-dictionary parity surface (what the reference emits for its whole
    dictionary corpus)."""
    records, cwe_pairs, cpe_pairs = build_cve_stage(cve_dim, cwe_dim, cpe_dim)
    all_t = _union([
        emit_cve_batch(records, cwe_pairs, cpe_pairs),
        emit_cwe_batch(cwe_dim),
        emit_attack_batch(attack_ents, attack_rels),
        emit_capec_batch(capec_dim),
        emit_d3fend_batch(d3_dim),
    ])
    return repair_and_dedup(all_t)
