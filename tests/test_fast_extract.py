"""The fast HTML text scanner must be byte-identical to the html.parser
extractor on every input — on the fast path by construction, elsewhere by
falling back to the parser itself. These tests pin both halves:
equivalence on the fixture corpus + adversarial constructs, and the
guarantee that fixture/bench pages actually TAKE the fast path (otherwise
the optimization silently evaporates)."""

import pytest

from uckg_spark.fixtures.pages import generate_pages, page_row
from uckg_spark.kernel.extract import _FALLBACK, _fast_extract, extract_text


def _parser_extract(html: str) -> str:
    from uckg_spark.kernel.extract import _TextExtractor

    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


def test_fixture_corpus_byte_identical_and_fast_path():
    for row in generate_pages(300, seed=7):
        html = row["html"].decode("utf-8", errors="replace")
        fast = _fast_extract(html)
        assert fast is not _FALLBACK, "fixture page fell off the fast path"
        assert fast == _parser_extract(html)


def test_bench_filler_pages_take_fast_path():
    for i in range(50):
        html = page_row(i, seed=42, filler_paras=50)["html"].decode("utf-8")
        fast = _fast_extract(html)
        assert fast is not _FALLBACK
        assert fast == _parser_extract(html)


ADVERSARIAL = [
    "",
    "plain text only",
    "a < b and c > d",
    "ends with <",
    "<p>unclosed",
    "<p>x</p ",                       # unterminated end tag
    "<p class=\"a>b\">quoted gt</p>",  # '>' inside quoted attr
    "<p a='1' b=2 c>bare attrs</p>",
    "<P>CASE</P>",
    "<xhtml:p>ns text</xhtml:p>",
    "<script>var x = '<p>not text</p>';</script>after",
    "<script >spaced</script >tail",
    "<SCRIPT>upper</SCRIPT>ok",
    "<script>no end tag at all",
    "<script>a</scriptx></script>b",  # near-miss end tag inside cdata
    "<style>.x { color: red }</style>text",
    "<script/>selfclosed is text",
    "<xhtml:script>ns script parsed as normal</xhtml:script>tail",
    "<xhtml:script>outer<script>inner</script>still off</xhtml:script>on",
    "&amp; &copy &nbsp; &#x2019; &#65; &bogus; &",
    "& loose amp",
    "<!-- comment <p>inside</p> -->after",
    "<!-- unterminated comment",
    "<!---->tight comment",
    "<!DOCTYPE html><p>doc</p>",
    "<!doctype html\nmultiline ><i>x</i>",
    "<![CDATA[marked section]]>tail",
    "<?php echo 1; ?>pi tail",
    "<? unterminated pi",
    "<!bogus comment>tail",
    "</>empty end</p>",
    "</ spaced>odd",
    "<1notatag>text",
    "<p attr='<'>lt in value</p>",
    "<div><span>a</span><b>b</b></div>",
    "text<br/>more<hr />even",
    "<td>   tabs\tand  spaces  </td>",
    "\n  leading and trailing  \n",
    "<p>&unterminated entity at end &am",
]


@pytest.mark.parametrize("html", ADVERSARIAL)
def test_adversarial_byte_identity(html):
    assert extract_text(html) == _parser_extract(html)


def test_fuzz_composed_fragments_byte_identity():
    import random

    frags = ADVERSARIAL + [
        "<p>", "</p>", "<script>", "</script>", "<style>", "</style>",
        "&amp;", "&", "<", ">", "--", "-->", "<!--", " ", "\t", "x y z",
        "<b a=1>", "<xhtml:script>", "</xhtml:script>", "<![", "<!x>",
    ]
    rng = random.Random(20260822)
    for _ in range(400):
        html = "".join(rng.choices(frags, k=rng.randint(1, 12)))
        try:
            want = _parser_extract(html)
        except AssertionError:
            # stdlib html.parser itself explodes on some malformed marked
            # sections (<![<!-- …); the fast path falls back to that very
            # parser for <![, so behavior is identical by construction
            continue
        assert extract_text(html) == want, html


def test_bytes_and_none_paths():
    assert extract_text(None) is None
    assert extract_text(b"<p>caf\xc3\xa9</p>") == "café"
    assert extract_text(b"\xff<p>bad utf8</p>") == \
        _parser_extract(b"\xff<p>bad utf8</p>".decode("utf-8", "replace"))
