"""Dedicated tests for each reference quirk (SURVEY.md §7.3 risk 3) at the
oracle level, plus the Spark expressions that must agree with the kernels."""

from pyspark.sql import functions as F

from uckg_spark.fixtures import dicts as D
from uckg_spark.kernel import templates as T
from uckg_spark.kernel.datetimes import format_datetime_string
from uckg_spark.oracle import emitters as E
from uckg_spark.plans.triples import format_datetime_col


def _records():
    cpe_index = E.latest_cpe_index(D.dict_cpe())
    cwe_ids = {w["id_value"] for w in D.dict_cwe()}
    return {r["id"]: r for r in E.build_cve_records(D.dict_cve(), cwe_ids, cpe_index)}


class TestCveBuildQuirks:
    def test_p6_membership_checks_strip_emits_original(self):
        # i%9==0 rows carry " CWE-x " — membership on strip, id = original
        recs = _records()
        padded = [
            w for r in recs.values() for w in r["cwes"]
            if w["id"] != w["id"].strip()
        ]
        assert padded, "expected padded weakness values to survive"

    def test_p6_decoys_dropped(self):
        recs = _records()
        for r in recs.values():
            for w in r["cwes"]:
                assert w["id"].strip().startswith("CWE-")

    def test_p9_first_config_node_match_only(self):
        # decoy criteria placed at nodes[0].cpeMatch[1] and nodes[1] must
        # never appear
        recs = _records()
        all_names = {c["cpeName"] for r in recs.values() for c in r["cpes"]}
        assert not any("ignoredvendor" in n or "ignoredprod" in n for n in all_names)

    def test_p10_exception_truncates(self):
        # CVE-2024-0017 has an empty-nodes config appended after valid ones:
        # the bare-except truncates nothing before it but drops everything
        # from the bad config on (cve_collection.py:421-422)
        recs = _records()
        r17 = recs["CVE-2024-0017"]
        raw17 = next(x for x in D.dict_cve() if x["id"] == "CVE-2024-0017")
        assert len(r17["cpes"]) == len(raw17["configurations"]) - 1

    def test_j1_miss_struct_minimal(self):
        recs = _records()
        misses = [c for r in recs.values() for c in r["cpes"] if not c["dictionary_found"]]
        assert misses
        for c in misses:
            assert set(c) == {"cpeName", "cve_id", "dictionary_found"}

    def test_a3_upsert_latest_wins(self):
        idx = E.latest_cpe_index(D.dict_cpe())
        dup_name = D.dict_cpe()[0]["cpeName"]
        assert idx[dup_name]["lastModified"] == "2024-03-01T00:00:00.000"


class TestDatetimeParity:
    def test_spark_f2_matches_kernel(self, spark):
        raws = [r["published_raw"] for r in D.dict_cve()] + [
            "2024-01-01 00:00:00.1", "2024-01-01 23:59:59.99999"
        ]
        df = spark.createDataFrame([(x,) for x in raws], ["raw"])
        got = [r["out"] for r in
               df.select(format_datetime_col(F.col("raw")).alias("out")).collect()]
        assert got == [format_datetime_string(x) for x in raws]


class TestEmissionQuirks:
    def test_boolean_defaults_always_emit(self):
        recs = _records()
        t = E.emit_cve_batch([recs["CVE-2024-0010"]])
        bools = [x for x in t if x.pred in (T.P_OBTAIN_ALL_PRIV, T.P_USER_INTERACTION)]
        assert len(bools) == 2

    def test_empty_string_no_triple(self):
        recs = _records()
        # CVEs with metrics_present=False have "" scores → no triples
        r = next(v for k, v in recs.items() if v["vectorString"] == "")
        t = E.emit_cve_batch([r])
        assert not any(x.pred == T.P_VECTOR_STRING for x in t)

    def test_attack_dangling_and_null_dropped(self):
        ents, rels = D.dict_attack()
        t = E.emit_attack_batch(ents, rels)
        objs = {x.obj for x in t if x.pred == T.P_MITIGATES}
        assert T.uri_ucoex("T9999") not in objs  # dangling FK
        # the null-source row and the unknown type-pair row emit nothing:
        preds = {x.pred for x in t}
        assert T.P_MITIGATES in preds and len(
            [x for x in t if x.pred == T.P_MITIGATES]) == 3

    def test_capec_empty_arrays_emit_nothing(self):
        empty = [p for p in D.dict_capec() if not p["Related_Weaknesses"]][0]
        t = E.emit_capec_batch([empty])
        assert not any(x.pred == T.P_HAS_RELATED_WEAKNESS for x in t)
        assert any(x.pred == T.P_CAPEC_DESCRIPTION for x in t)

    def test_d3fend_empty_off_tech_no_edge(self):
        rows = D.dict_d3fend()
        t = E.emit_d3fend_batch(rows)
        empty_row = next(r for r in rows if r["off_tech_id"] == "")
        uri = T.uri_ucoex(empty_row["@id"])
        assert not any(x.subj == uri and x.pred == T.P_HAS_MITRE_ATTACK for x in t)

    def test_observed_example_edges(self):
        w = next(x for x in D.dict_cwe() if x["observed_examples"])
        t = E.emit_cwe_batch([w])
        exs = [x for x in t if x.pred == T.P_HAS_OBSERVED_EXAMPLE]
        assert len(exs) == len(w["observed_examples"]["observed_example"])
        # example subjects are typed and linked to the CVE
        assert any(x.pred == T.P_EXAMPLE_OBSERVED_IN for x in t)

    def test_all_none_cwe_emits_types_only(self):
        w = next(x for x in D.dict_cwe() if x["id_value"] == "CWE-400")
        t = E.emit_cwe_batch([w])
        lits = [x for x in t if x.obj_is_literal]
        # only ucocweID survives (id_value itself is never None)
        assert {x.pred for x in lits} == {T.P_CWE_ID}
