"""Kernel unit tests: extraction, id gazetteers, datetime quirks, JSON
encoding, linking determinism. Pure Python — no Spark session."""

import json

from uckg_spark.kernel.datetimes import (
    date_midnight_suffix,
    format_datetime_string,
    repair_datetime_literal,
)
from uckg_spark.kernel.extract import extract_text, xml_clean_text
from uckg_spark.kernel.ids import AhoCorasick, cwe_prefix, scan_ids
from uckg_spark.kernel.jsonenc import titles_lang_map_literal, titles_literal
from uckg_spark.kernel.linking import build_idf, score_candidates


class TestExtract:
    def test_concat_no_separators_and_strip(self):
        # itertext() semantics: no separators inserted, ends stripped
        # (cwe_collection.py:71-74)
        assert extract_text("<p>a</p><p>b</p>") == "ab"
        assert extract_text("  <div> x </div>  ") == "x"

    def test_interior_whitespace_preserved(self):
        assert extract_text("<p>a   \n b</p>") == "a   \n b"

    def test_script_style_dropped(self):
        html = "<style>.c{}</style><script>var x='CVE-2024-1111';</script><b>ok</b>"
        assert extract_text(html) == "ok"

    def test_nested_script_end(self):
        assert extract_text("<div><script>if(a<b){}</script>t</div>") == "t"

    def test_entity_refs_decoded(self):
        assert extract_text("<p>&amp; &lt; &#x2019;</p>") == "& < ’"

    def test_namespaced_tags(self):
        assert extract_text("<xhtml:p>para</xhtml:p>") == "para"
        # namespaced script is still script
        assert extract_text("<xhtml:script>x</xhtml:script>y") == "y"

    def test_bytes_and_none(self):
        assert extract_text("<p>ü</p>".encode()) == "ü"
        assert extract_text(None) is None

    def test_xml_clean_text(self):
        assert xml_clean_text([" a", None, "b "]) == "ab"


class TestIds:
    def test_scan_well_formed(self):
        text = ("See CVE-2024-0001 and CWE-79, CAPEC-66, T1003.001 and "
                "cpe:2.3:a:acmesoft:webgate:1.0:*:*:*:*:*:*:*")
        kinds = {k for k, _t, _o in scan_ids(text)}
        assert kinds == {"cve", "cwe", "capec", "attack", "cpe"}

    def test_decoys_rejected(self):
        # FIXTURES.md decoys must not match
        for decoy in ["CVE-123", "CWE-", "T99999", "CVE-2024-12",
                      "XCVE-2024-1111", "CAPEC-", "T123"]:
            assert scan_ids(f"x {decoy} y") == [], decoy

    def test_boundary_discipline(self):
        assert scan_ids("xCVE-2024-1234") == []
        assert scan_ids("CVE-2024-1234z") == []
        # sub-technique matched whole, not as T1059 + .003
        hits = scan_ids("uses T1059.003 here")
        assert hits == [("attack", "T1059.003", 5)]

    def test_sentence_punctuation_ok(self):
        assert scan_ids("Fixed CVE-2024-0007.")[0][1] == "CVE-2024-0007"
        assert scan_ids("(CWE-89)")[0][1] == "CWE-89"

    def test_prefixers(self):
        assert cwe_prefix(" 79 ") == "CWE- 79"  # strip AFTER concat (:126)

    def test_aho_whole_word(self):
        a = AhoCorasick(["Acme Soft", "webgate"])
        hits = a.find("acme soft webgate and notwebgate")
        surfs = [s for s, _ in hits]
        assert "acme soft" in surfs and "webgate" in surfs
        assert surfs.count("webgate") == 1  # 'notwebgate' rejected

    def test_aho_leftmost_longest(self):
        a = AhoCorasick(["credential vault", "credential vault dredging"])
        assert a.find("uses credential vault dredging here") == [
            ("credential vault dredging", 5)
        ]

    def test_regex_and_trie_engines_equivalent(self):
        from uckg_spark.fixtures import dicts as D
        from uckg_spark.fixtures.pages import generate_pages
        from uckg_spark.kernel.extract import extract_text

        pats = [x["surface_form"] for x in D.alias_table()]
        fast = AhoCorasick(pats)
        trie = AhoCorasick(pats)
        trie._regex = None  # force the trie engine
        for p in generate_pages(150):
            t = extract_text(p["html"])
            assert fast.find(t) == trie.find(t)


class TestDatetimes:
    def test_format_keeps_first_3(self):
        assert format_datetime_string("2024-01-05 08:30:15.123456") == "2024-01-05T08:30:15.123"
        assert format_datetime_string("2024-01-05 08:30:15.1") == "2024-01-05T08:30:15.1"

    def test_repair_drops_whole_fraction(self):
        # ontology_updater.py:19-23 — full fraction removed, not truncated
        assert repair_datetime_literal("2024-02-01T10:00:00.123456") == "2024-02-01T10:00:00"
        assert repair_datetime_literal("2024-02-01T10:00:00.123") == "2024-02-01T10:00:00.123"

    def test_midnight_suffix(self):
        assert date_midnight_suffix("2019-01-15") == "2019-01-15T00:00:00"


class TestJson:
    def test_titles_byte_format(self):
        t = [{"title": "A B", "lang": "en"}]
        assert titles_literal(t) == '[{"title": "A B", "lang": "en"}]'

    def test_lang_map_insertion_order(self):
        t = [{"title": "x", "lang": "en"}, {"title": "y", "lang": "es"}]
        assert titles_lang_map_literal(t) == '{"en": "x", "es": "y"}'

    def test_ensure_ascii(self):
        assert titles_literal([{"title": "ü", "lang": "de"}]) == '[{"title": "\\u00fc", "lang": "de"}]'


class TestLinking:
    def test_exact_token_identity_full_score(self):
        idf = build_idf(["acmesoft webgate", "globex dbcore"])
        hit = score_candidates("AcmeSoft-WebGate",
                               [("acmesoft:webgate", 0.9)], idf)
        assert hit == ("acmesoft:webgate", 0.9)

    def test_tie_break_on_id(self):
        idf = build_idf(["x y"])
        hit = score_candidates("x y", [("b:x", 1.0), ("a:x", 1.0)], idf)
        # equal scores → lexicographically smaller id wins
        assert hit is not None and hit[0] == "a:x"

    def test_threshold(self):
        idf = build_idf(["completely different"])
        assert score_candidates("zzz qqq", [("completely:different", 1.0)], idf) is None
