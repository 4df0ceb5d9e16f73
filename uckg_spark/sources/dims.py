"""Dimension (dictionary) DataFrames for the linking/emission joins.

The reference's dictionaries are SQLite tables and JSON files consulted by
point lookup (S7, /root/reference/data_collection/cve_collection.py:85-92,
:261-287). Here they are small Spark DataFrames, broadcast at join time
(SURVEY.md §2.4 J1/J2). Complex literals (the CPE titles language map, the
CWE related_attack_patterns struct) are PRE-SERIALIZED driver-side with the
shared kernel (``jsonenc``) so downstream emission is pure column selection
— byte-identical to the oracle and free of per-row Python at scale (the
dims are MBs; the corpus is the thing that's big).

Fixture-backed by default; a production deployment would load the same
schemas from parquet/Iceberg dictionary tables.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from ..fixtures import dicts as D
from ..kernel.jsonenc import dumps_reference, titles_lang_map_literal

# ---------------------------------------------------------------------------
# schemas (explicit — None-heavy fixture columns must not rely on inference)
# ---------------------------------------------------------------------------

_S = Ty.StringType()


def _schema(fields: list[tuple[str, Ty.DataType]]) -> Ty.StructType:
    return Ty.StructType([Ty.StructField(n, t, True) for n, t in fields])


CPE_SCHEMA = _schema([
    ("cpeName", _S), ("cpeNameId", _S), ("lastModified", _S),
    ("titles_json", _S), ("titles_lang_lit", _S),
    ("vendor", _S), ("product", _S),
])

CVE_SCHEMA = _schema([
    ("id", _S), ("published_raw", _S), ("lastModified_raw", _S),
    ("descriptions", Ty.ArrayType(_schema([("lang", _S), ("value", _S)]))),
    ("vulnStatus", _S), ("vectorString", _S), ("baseSeverity", _S),
    ("exploitabilityScore", _S), ("impactScore", _S),
    ("obtainAllPrivilege", Ty.BooleanType()),
    ("userInteractionRequired", Ty.BooleanType()),
    ("weakness_values", Ty.ArrayType(_S)),
    ("configurations", Ty.ArrayType(Ty.ArrayType(Ty.ArrayType(_S)))),
    ("evaluatorSolution", _S),
])

CWE_SCHEMA = _schema([
    ("id_value", _S), ("name", _S), ("abstraction", _S), ("structure", _S),
    ("status", _S), ("description", _S), ("extended_summary", _S),
    ("applicable_platforms", _S), ("modes_of_introduction", _S),
    ("common_consequences", _S), ("detection_methods", _S),
    ("potential_mitigations", _S), ("demonstrative_examples", _S),
    ("references", _S), ("mapping_notes", _S), ("time_of_introduction", _S),
    ("summary", _S), ("likelihood_of_exploit", _S),
    ("related_attack_patterns_lit", _S),
    ("observed_examples", Ty.ArrayType(_schema([
        ("cwe_id", _S), ("Reference", _S), ("Description", _S), ("Link", _S)]))),
])

ATTACK_ENT_SCHEMA = _schema([
    ("ID", _S), ("name", _S), ("description", _S), ("url", _S),
    ("domain", _S), ("kind", _S),
])

ATTACK_REL_SCHEMA = _schema([
    ("source_id", _S), ("source_type", _S), ("target_id", _S), ("target_type", _S),
])

CAPEC_SCHEMA = _schema([
    ("ID", _S), ("Name", _S), ("Abstraction", _S), ("Status", _S),
    ("Description", _S), ("Likelihood_Of_Attack", _S), ("Typical_Severity", _S),
    ("Extended_Description", Ty.ArrayType(_S)),
    ("Related_Attack_Patterns", Ty.ArrayType(_S)),
    ("Execution_Flow", Ty.ArrayType(_S)),
    ("Prerequisites", Ty.ArrayType(_S)),
    ("Skills_Required", Ty.ArrayType(_S)),
    ("Resources_Required", Ty.ArrayType(_S)),
    ("Consequences", Ty.ArrayType(_S)),
    ("Mitigations", Ty.ArrayType(_S)),
    ("Example_Instances", Ty.ArrayType(_S)),
    ("Related_Weaknesses", Ty.ArrayType(_S)),
    ("Taxonomy_Mappings", Ty.ArrayType(_S)),
])

D3FEND_SCHEMA = _schema([
    ("id", _S), ("d3fend_id", _S), ("definition", _S), ("label", _S),
    ("off_tech_id", _S),
])

ALIAS_SCHEMA = _schema([
    ("surface_form", _S), ("canonical_id", _S), ("kind", _S),
    ("prior", Ty.DoubleType()),
])


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def dim_cpe_raw(spark: SparkSession) -> DataFrame:
    """CPE dictionary incl. duplicate-key rows (pre-upsert)."""
    rows = []
    for r in D.dict_cpe():
        parts = r["cpeName"].split(":")
        rows.append((
            r["cpeName"], r["cpeNameId"], r["lastModified"], r["titles_json"],
            titles_lang_map_literal(json.loads(r["titles_json"])),
            parts[3], parts[4],
        ))
    return spark.createDataFrame(rows, CPE_SCHEMA)


def dim_cpe(spark: SparkSession) -> DataFrame:
    """A3 upsert-by-key as a deterministic window: keep max
    (lastModified, cpeNameId) per cpeName — replaces the reference's
    completion-order INSERT OR REPLACE (cve_collection.py:185-188)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("cpeName").orderBy(
        F.col("lastModified").desc(), F.col("cpeNameId").desc()
    )
    return (
        dim_cpe_raw(spark)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dim_cpe_by_vendor_product(spark: SparkSession) -> DataFrame:
    """canonical vendor:product → latest cpe row (fuzzy-link target)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("vendor", "product").orderBy(
        F.col("lastModified").desc(), F.col("cpeNameId").desc()
    )
    return (
        dim_cpe(spark)
        .withColumn("canonical_id", F.concat_ws(":", "vendor", "product"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dim_cve(spark: SparkSession) -> DataFrame:
    rows = [(
        r["id"], r["published_raw"], r["lastModified_raw"],
        [(d["lang"], d["value"]) for d in r["descriptions"]],
        r["vulnStatus"], r["vectorString"], r["baseSeverity"],
        r["exploitabilityScore"], r["impactScore"],
        r["obtainAllPrivilege"], r["userInteractionRequired"],
        r["weakness_values"], r["configurations"], r["evaluatorSolution"],
    ) for r in D.dict_cve()]
    return spark.createDataFrame(rows, CVE_SCHEMA)


def dim_cwe(spark: SparkSession) -> DataFrame:
    rows = []
    for w in D.dict_cwe():
        rap = w.get("related_attack_patterns")
        obs = (w.get("observed_examples") or {}).get("observed_example")
        rows.append((
            w["id_value"], w["name"], w["abstraction"], w["structure"],
            w["status"], w["description"], w["extended_summary"],
            w["applicable_platforms"], w["modes_of_introduction"],
            w["common_consequences"], w["detection_methods"],
            w["potential_mitigations"], w["demonstrative_examples"],
            w["references"], w["mapping_notes"], w["time_of_introduction"],
            w["summary"], w["likelihood_of_exploit"],
            dumps_reference(rap) if rap is not None else None,
            [(e.get("cwe_id"), e.get("Reference"), e.get("Description"),
              e.get("Link")) for e in obs] if obs else None,
        ))
    return spark.createDataFrame(rows, CWE_SCHEMA)


def dim_attack(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    ents, rels = D.dict_attack()
    ent_df = spark.createDataFrame(
        [(e["ID"], e["name"], e["description"], e["url"], e["domain"],
          e["kind"]) for e in ents],
        ATTACK_ENT_SCHEMA,
    )
    rel_df = spark.createDataFrame(
        [(r["source ID"], r["source type"], r["target ID"], r["target type"])
         for r in rels],
        ATTACK_REL_SCHEMA,
    )
    return ent_df, rel_df


def dim_capec(spark: SparkSession) -> DataFrame:
    rows = [(
        p["ID"], p["Name"], p["Abstraction"], p["Status"], p["Description"],
        p["Likelihood_Of_Attack"], p["Typical_Severity"],
        p["Extended_Description"], p["Related_Attack_Patterns"],
        p["Execution_Flow"], p["Prerequisites"], p["Skills_Required"],
        p["Resources_Required"], p["Consequences"], p["Mitigations"],
        p["Example_Instances"], p["Related_Weaknesses"], p["Taxonomy_Mappings"],
    ) for p in D.dict_capec()]
    return spark.createDataFrame(rows, CAPEC_SCHEMA)


def dim_d3fend(spark: SparkSession) -> DataFrame:
    rows = [(d["@id"], d["d3f:d3fend-id"], d["d3f:definition"],
             d["rdfs:label"], d["off_tech_id"])
            for d in D.dict_d3fend()]
    return spark.createDataFrame(rows, D3FEND_SCHEMA)


def dim_alias(spark: SparkSession) -> DataFrame:
    rows = [(a["surface_form"], a["canonical_id"], a["kind"], a["prior"])
            for a in D.alias_table()]
    return spark.createDataFrame(rows, ALIAS_SCHEMA)
