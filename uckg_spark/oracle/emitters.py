"""Pure-Python triple emitters — the semantic definition of §2.9.

Each emitter consumes fixture-shaped dicts (uckg_spark.fixtures.dicts) and
yields Triple tuples. The Spark plans (uckg_spark.plans.triples) must match
these outputs EXACTLY (set equality on fixtures, tests/test_triples_*).

Documented interpretation choices (reference is non-executable here):
- ``rr:class`` inside an objectMap emits the object's rdf:type triple
  (matches SURVEY.md §2.9's reading, e.g. "typed ucoCVE" for
  cve_rml.ttl:60-61).
- Null ⇒ no triple, AND empty string ⇒ no triple (P7; RML drops
  unresolvable references; the collectors' "" defaults behave like absent
  fields once mapped).
- Booleans always emit ("true"/"false" — JSON false is a present value,
  cve_collection.py:441-442 defaults).
- ucorelatedWeakness emits NOTHING: the string form references
  ``cwe.related_weakness`` (cwe_rml.ttl:152) but the collector writes
  ``related_weaknesses`` (cwe_collection.py:381), and the URI form's
  template capitalizes ``Related_Weaknesses`` (cwe_rml.ttl:160) against the
  lowercase collector key — both JSONPaths never resolve. Reproduced, like
  the D3FEND ``_ID`` stray-quote typo (d3fend_rml.ttl:29).
- Array-valued references emit one triple per element whether or not the
  RML wrote ``[*]`` (rmlmapper list flattening; capec_rml.ttl:107 vs :114).
- Object-valued references (structs) serialize via the shared
  ``jsonenc.dumps_reference`` kernel.
- D3FEND ``off_tech_id == ""`` ⇒ no ucoexhasMITREATTACK edge (P7 applied
  to templates whose single reference is empty).
"""

from __future__ import annotations

from typing import Iterable, NamedTuple

from ..kernel import templates as T
from ..kernel.datetimes import format_datetime_string, repair_datetime_literal
from ..kernel.jsonenc import dumps_reference, titles_lang_map_literal


class Triple(NamedTuple):
    subj: str
    pred: str
    obj: str
    obj_is_literal: bool
    obj_datatype: str | None


def _lit(s: str, p: str, o: str | None, dt: str = T.XSD_STRING) -> list[Triple]:
    """P7: None/empty ⇒ no triple."""
    if o is None or o == "":
        return []
    if not isinstance(o, str):
        o = dumps_reference(o)
    return [Triple(s, p, o, True, dt)]


def _bool(s: str, p: str, o: bool) -> list[Triple]:
    return [Triple(s, p, "true" if o else "false", True, T.XSD_BOOLEAN)]


def _uri(s: str, p: str, o: str, o_class: str | None = None) -> list[Triple]:
    out = [Triple(s, p, o, False, None)]
    if o_class:
        out.append(Triple(o, T.RDF_TYPE, o_class, False, None))
    return out


def _type(s: str, cls: str) -> Triple:
    return Triple(s, T.RDF_TYPE, cls, False, None)


# ---------------------------------------------------------------------------
# CVE record building (the collector's projection, cve_collection.py:380-446)
# ---------------------------------------------------------------------------


def latest_cpe_index(cpe_rows: list[dict]) -> dict[str, dict]:
    """Deterministic upsert: keep the row with max (lastModified, cpeNameId)
    per cpeName — replaces the reference's nondeterministic
    completion-order INSERT OR REPLACE (cve_collection.py:185-188, A3)."""
    best: dict[str, dict] = {}
    for r in cpe_rows:
        cur = best.get(r["cpeName"])
        if cur is None or (r["lastModified"], r["cpeNameId"]) > (
            cur["lastModified"],
            cur["cpeNameId"],
        ):
            best[r["cpeName"]] = r
    return best


def build_cve_records(
    cve_rows: list[dict], cwe_ids: set[str], cpe_index: dict[str, dict]
) -> list[dict]:
    """Mirror of the collector loop at cve_collection.py:380-446:
    - P6 membership: check on .strip(), emit ORIGINAL value (:384-389)
    - P9 first-match: nodes[0].cpeMatch[0] per configuration (:390-395)
    - J1 left lookup with dictionary_found flag; miss-struct carries ONLY
      cpeName/cve_id/dictionary_found (:396-420)
    - P10: any exception silently truncates cwes+cpes (bare except :421-422)
    - F2 datetime formatting on published/lastModified (:208-221)
    """
    import json as _json

    out = []
    for row in cve_rows:
        cve_id = row["id"]
        cwes: list[dict] = []
        cpes: list[dict] = []
        try:
            for wval in row["weakness_values"]:
                if wval.strip() in cwe_ids:
                    cwes.append({"id": wval, "cve_id": cve_id})
            for config in row["configurations"]:
                crit = config[0][0]  # nodes[0].cpeMatch[0] — raises on empty (P10)
                if crit:
                    hit = cpe_index.get(crit)
                    if hit:
                        titles = titles_lang_map_literal(
                            _json.loads(hit["titles_json"])
                        )
                        cpes.append(
                            {
                                "cpeName": hit["cpeName"],
                                "cpeNameId": hit["cpeNameId"],
                                "lastModified": hit["lastModified"],
                                "titles": titles,
                                "cve_id": cve_id,
                                "dictionary_found": True,
                            }
                        )
                    else:
                        cpes.append(
                            {
                                "cpeName": crit,
                                "cve_id": cve_id,
                                "dictionary_found": False,
                            }
                        )
        except Exception:
            pass
        out.append(
            {
                "id": cve_id,
                "published": format_datetime_string(row["published_raw"]),
                "lastModified": format_datetime_string(row["lastModified_raw"]),
                "descriptions": row["descriptions"],
                "vulnStatus": row["vulnStatus"],
                "vectorString": row["vectorString"],
                "baseSeverity": row["baseSeverity"],
                "exploitabilityScore": row["exploitabilityScore"],
                "impactScore": row["impactScore"],
                "obtainAllPrivilege": row["obtainAllPrivilege"],
                "userInteractionRequired": row["userInteractionRequired"],
                "cwes": cwes,
                "cpes": cpes,
                "evaluatorSolution": row["evaluatorSolution"],
            }
        )
    return out


# ---------------------------------------------------------------------------
# batch emitters (one per RML file)
# ---------------------------------------------------------------------------


def emit_cve_batch(records: Iterable[dict]) -> list[Triple]:
    """mapping/cve/cve_rml.ttl — VULMap, CVEMap, CPEMap, CWEMap, CWETypeMap."""
    out: list[Triple] = []
    for r in records:
        vuln = T.uri_vuln(r["id"])
        cve = T.uri_uco(r["id"])
        # VULMap (:20-66)
        out.append(_type(vuln, T.CL_VULNERABILITY))
        out += _lit(vuln, T.P_PUBLISHED, r["published"], T.XSD_DATETIME)
        out += _lit(vuln, T.P_LAST_MODIFIED, r["lastModified"], T.XSD_DATETIME)
        for d in r["descriptions"]:
            out += _lit(vuln, T.P_SUMMARY, d["value"])
        out += _uri(vuln, T.P_HAS_CVE_ID, cve, T.CL_CVE)
        # CVEMap (:69-145)
        out.append(_type(cve, T.CL_CVE))
        for c in r["cpes"]:
            out += _uri(cve, T.P_HAS_CPE, T.uri_ucoex(c["cpeName"]), T.CL_CPE)
        out += _lit(cve, T.RDFS_LABEL, r["id"])
        out += _lit(cve, T.P_VULN_STATUS, r["vulnStatus"])
        out += _lit(cve, T.P_VECTOR_STRING, r["vectorString"])
        out += _lit(cve, T.P_BASE_SEVERITY, r["baseSeverity"])
        out += _lit(cve, T.P_EXPLOITABILITY, r["exploitabilityScore"])
        out += _lit(cve, T.P_IMPACT, r["impactScore"])
        out += _bool(cve, T.P_OBTAIN_ALL_PRIV, r["obtainAllPrivilege"])
        out += _bool(cve, T.P_USER_INTERACTION, r["userInteractionRequired"])
        out += _lit(cve, T.P_EVALUATOR_SOLUTION, r["evaluatorSolution"])
        # CPEMap (:146-194)
        for c in r["cpes"]:
            cpe_uri = T.uri_ucoex(c["cpeName"])
            out.append(_type(cpe_uri, T.CL_CPE))
            out += _lit(cpe_uri, T.P_CPE_NAME, c.get("cpeName"))
            out += _lit(cpe_uri, T.P_CPE_NAME_ID, c.get("cpeNameId"))
            out += _lit(cpe_uri, T.P_CPE_LAST_MODIFIED, c.get("lastModified"), T.XSD_DATETIME)
            out += _lit(cpe_uri, T.P_CPE_TITLES, c.get("titles"), T.RDF_JSON)
            out += _bool(cpe_uri, T.P_DICTIONARY_FOUND, c["dictionary_found"])
        # CWEMap + CWETypeMap (:197-236)
        for w in r["cwes"]:
            et = T.uri_exploit_target(w["id"])
            out.append(_type(et, T.CL_EXPLOIT_TARGET))
            out += _uri(et, T.P_HAS_VULNERABILITY, T.uri_vuln(w["cve_id"]), T.CL_VULNERABILITY)
            out += _uri(et, T.P_HAS_WEAKNESS, T.uri_uco(w["id"]), T.CL_CWE)
            out.append(_type(T.uri_uco(w["id"]), T.CL_CWE))
    return out


# (predicate, field, datatype) plan for the CWE datatype predicates — the
# string-form ucorelatedWeakness is ABSENT by the dual-typo rule above.
CWE_DATATYPE_PLAN: list[tuple[str, str, str]] = [
    (T.P_CWE_DESCRIPTION, "description", T.XSD_STRING),  # cwe_rml.ttl:87
    (T.P_CWE_ID, "id_value", T.XSD_STRING),  # :96
    (T.P_COMMON_CONSEQUENCES, "common_consequences", T.XSD_STRING),  # :105
    (T.P_TIME_OF_INTRODUCTION, "time_of_introduction", T.XSD_DATETIME),  # :114
    (T.P_CWE_SUMMARY, "summary", T.XSD_STRING),  # :123
    (T.P_CWE_EXT_SUMMARY, "extended_summary", T.XSD_STRING),  # :132
    (T.P_CWE_NAME, "name", T.XSD_STRING),  # :141
    (T.P_APPLICABLE_PLATFORM, "applicable_platforms", T.XSD_STRING),  # :167
    (T.P_MODES_OF_INTRODUCTION, "modes_of_introduction", T.XSD_STRING),  # :176
    (T.P_LIKELIHOOD_OF_EXPLOIT, "likelihood_of_exploit", T.XSD_STRING),  # :185
    (T.P_DETECTION_METHODS, "detection_methods", T.XSD_STRING),  # :194
    (T.P_POTENTIAL_MITIGATIONS, "potential_mitigations", T.XSD_STRING),  # :203
    (T.P_DEMONSTRATIVE_EXAMPLES, "demonstrative_examples", T.XSD_STRING),  # :212
    (T.P_REFERENCES, "references", T.XSD_STRING),  # :221
    (T.P_MAPPING_NOTES, "mapping_notes", T.XSD_STRING),  # :230
    (T.P_RELATED_ATTACK_PATTERNS, "related_attack_patterns", T.XSD_STRING),  # :239
    (T.P_ABSTRACTION, "abstraction", T.XSD_STRING),  # :248
    (T.P_STRUCTURE, "structure", T.XSD_STRING),  # :256
    (T.P_STATUS, "status", T.XSD_STRING),  # :264
]


def emit_cwe_batch(weaknesses: Iterable[dict]) -> list[Triple]:
    """mapping/cwe/cwe_rml.ttl — ObservedExampleMap, ExploitTarget map (J3
    self-join), CWEMap2 datatype predicates, hasObservedExample edges."""
    out: list[Triple] = []
    for w in weaknesses:
        wid = w["id_value"]
        et = T.uri_exploit_target(wid)
        cwe_uri = T.uri_uco(wid)
        out.append(_type(et, T.CL_EXPLOIT_TARGET))  # :54-57
        # J3 self-join on id_value (:74-83) — 1:1, object typed by parent map
        out += _uri(et, T.P_HAS_WEAKNESS, cwe_uri)
        out.append(_type(cwe_uri, T.CL_CWE))  # :67-70
        for pred, field, dt in CWE_DATATYPE_PLAN:
            out += _lit(cwe_uri, pred, w.get(field), dt)
        obs = (w.get("observed_examples") or {}).get("observed_example") or []
        for ex in obs:
            ex_uri = T.uri_observed_example(ex["cwe_id"], ex["Reference"])
            out.append(_type(ex_uri, T.CL_OBSERVED_EXAMPLE))  # :27-28
            out += _lit(ex_uri, T.P_OBS_DESCRIPTION, ex.get("Description"))  # :31
            out += _uri(ex_uri, T.P_EXAMPLE_OBSERVED_IN, T.uri_uco(ex["Reference"]), T.CL_CVE)  # :38-41
            out += _uri(cwe_uri, T.P_HAS_OBSERVED_EXAMPLE, ex_uri, T.CL_OBSERVED_EXAMPLE)  # :272-275
    return out


def emit_attack_batch(entities: list[dict], relationships: list[dict]) -> list[Triple]:
    """mapping/attack/attack_rml.ttl — 6 entity maps (:21-249) + 7
    relationship maps (:253-403, J4 inner join on target ID == ID)."""
    out: list[Triple] = []
    for e in entities:
        uri = T.uri_ucoex(e["ID"])
        out.append(_type(uri, T.ATTACK_ENTITY_CLASS[e["kind"]]))
        out += _lit(uri, T.P_EX_NAME, e.get("name"))
        out += _lit(uri, T.P_EX_DESCRIPTION, e.get("description"))
        out += _lit(uri, T.P_EX_URL, e.get("url"))
        out += _lit(uri, T.P_EX_DOMAIN, e.get("domain"))
    ids = {e["ID"] for e in entities}
    for r in relationships:
        if r.get("source ID") is None:  # P3 null drop (parse.py:231-234)
            continue
        key = (r.get("source type"), r.get("target type"))
        cat = T.ATTACK_REL_CATALOG.get(key)
        if cat is None:  # no RML map for this type pair (P5)
            continue
        pred, subj_cls, _tgt_cls = cat
        if r["target ID"] not in ids:  # J4 inner-join drops dangling FK
            continue
        subj = T.uri_ucoex(r["source ID"])
        out.append(_type(subj, subj_cls))
        out += _uri(subj, pred, T.uri_ucoex(r["target ID"]))
    return out


CAPEC_ARRAY_PLAN: list[tuple[str, str]] = [
    (T.P_CAPEC_EXT_DESCRIPTION, "Extended_Description"),  # capec_rml.ttl:84-86
    (T.P_CAPEC_RELATED_ATT, "Related_Attack_Patterns"),  # :91-93
    (T.P_CAPEC_EXEC_FLOW, "Execution_Flow"),  # :98-100
    (T.P_CAPEC_PREREQUISITES, "Prerequisites"),  # :105-107
    (T.P_CAPEC_SKILLS, "Skills_Required"),  # :112-114
    (T.P_CAPEC_RESOURCES, "Resources_Required"),  # :119-121
    (T.P_CAPEC_MITIGATIONS, "Mitigations"),  # :126-128
    (T.P_CAPEC_EXAMPLE, "Example_Instances"),  # :133-135
    (T.P_CAPEC_RELATED_WEAKNESSES, "Related_Weaknesses"),  # :140-142
    (T.P_CAPEC_TAXONOMY_ATTACK, "Taxonomy_Mappings"),  # :147-149
    (T.P_CAPEC_CONSEQUENCES, "Consequences"),  # :154-156
]


def emit_capec_batch(patterns: Iterable[dict]) -> list[Triple]:
    """mapping/capec/capec_rml.ttl — CAPECMap + the two type-decl maps
    (:175-196, deduped away by set semantics)."""
    out: list[Triple] = []
    for p in patterns:
        uri = T.uri_capec(p["ID"])
        out.append(_type(uri, T.CL_CAPEC))  # :170-171
        out += _lit(uri, T.RDFS_LABEL, T.capec_label(p["ID"], p["Name"]))  # :26-32
        for rw in p.get("Related_Weaknesses") or []:
            out += _uri(uri, T.P_HAS_RELATED_WEAKNESS, T.uri_uco(rw), T.CL_CWE)  # :34-40
        for tm in p.get("Taxonomy_Mappings") or []:
            out += _uri(uri, T.P_HAS_TAXONOMY_MAPPING, T.uri_ucoex(tm), T.CL_ATTACK)  # :161-167
        out += _lit(uri, T.P_CAPEC_ID, p.get("ID"))
        out += _lit(uri, T.P_CAPEC_NAME, p.get("Name"))
        out += _lit(uri, T.P_CAPEC_ABSTRACTION, p.get("Abstraction"))
        out += _lit(uri, T.P_CAPEC_LIKELIHOOD, p.get("Likelihood_Of_Attack"))
        out += _lit(uri, T.P_CAPEC_SEVERITY, p.get("Typical_Severity"))
        out += _lit(uri, T.P_CAPEC_DESCRIPTION, p.get("Description"))
        for pred, field in CAPEC_ARRAY_PLAN:
            for v in p.get(field) or []:
                out += _lit(uri, pred, v)
    return out


def emit_d3fend_batch(items: Iterable[dict]) -> list[Triple]:
    """mapping/d3fend/d3fend_rml.ttl — NO _ID triples (stray-quote typo,
    :29); empty off_tech_id ⇒ no hasMITREATTACK edge (:47-53 + P7)."""
    out: list[Triple] = []
    for d in items:
        uri = T.uri_ucoex(d["@id"])
        out.append(_type(uri, T.CL_D3FEND))  # :55-56
        out += _lit(uri, T.P_D3FEND_DEFINITION, d.get("d3f:definition"))  # :33-39
        out += _lit(uri, T.P_D3FEND_LABEL, d.get("rdfs:label"))  # :40-46
        off = d.get("off_tech_id")
        if off:
            out += _uri(uri, T.P_HAS_MITRE_ATTACK, T.uri_ucoex(off), T.CL_ATTACK)  # :47-53
    return out


# ---------------------------------------------------------------------------
# graph-level post-processing
# ---------------------------------------------------------------------------


def repair_and_dedup(triples: Iterable[Triple]) -> set[Triple]:
    """F3 datetime repair (ontology_updater.py:7-30) + A1 set dedup
    (rdflib Graph semantics, ontology_updater.py:59-65)."""
    out: set[Triple] = set()
    for t in triples:
        if t.obj_is_literal and t.obj_datatype == T.XSD_DATETIME:
            fixed = repair_datetime_literal(t.obj)
            if fixed != t.obj:
                t = t._replace(obj=fixed)
        out.add(t)
    return out
