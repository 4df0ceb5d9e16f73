"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Schema = BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Each page embeds 0–8 mentions from the dictionary fixtures; HTML bodies
exercise the extraction kernel: nested tags, ``<xhtml:p>`` splits (cf.
CAPEC paragraph handling, /root/reference/parse.py:278-291), entity refs
and homoglyph text (cf. the CWE-1007 sample in
/root/reference/mapping/cwe/cwes.json:17-23), whitespace runs, and
script/style payloads that must be dropped.

Skew: HOT_CVES + HOT_VENDORS appear in ~20% of pages. ~2% of pages are
duplicate urls with identical html.
"""

from __future__ import annotations

import datetime as _dt
import random

from . import dicts as D

_DECOYS = ["CVE-123", "CWE-", "T99999", "CVE-2024-12", "cve:2.3:a:x:y",
           "XCVE-2024-1111", "CAPEC-", "T123",
           "D3-fx00",   # lowercase after D3- → not a d3fend id
           "G123",      # 3 digits → not an ATT&CK group id
           "TA99",      # tactics need 4 digits
           "D3-FX99"]   # well-formed but out-of-dictionary d3fend id

_FILLER = (
    "advisory bulletin reports a newly tracked issue affecting enterprise "
    "deployments. Administrators should review exposure and apply vendor "
    "guidance. Detection content and indicators follow."
).split()


_CPE_ROWS = None
_ALIAS_ROWS = None


def _dims() -> tuple[list[dict], list[dict]]:
    global _CPE_ROWS, _ALIAS_ROWS
    if _CPE_ROWS is None:
        _CPE_ROWS = D.dict_cpe()
        _ALIAS_ROWS = D.alias_table()
    return _CPE_ROWS, _ALIAS_ROWS


def _mentions_for_page(rng: random.Random, hot: bool) -> list[str]:
    cves = D.cve_ids()
    cpe_rows, alias_rows = _dims()
    toks: list[str] = []
    n = rng.randint(0, 8)
    if hot:
        toks.append(rng.choice(D.HOT_CVES))
        v = rng.choice(D.HOT_VENDORS)
        p = "webgate" if v == "acmesoft" else "dbcore"
        toks.append(f"{v.capitalize()} {p.capitalize()}")
        n = max(n, 2)
    for _ in range(n):
        kind = rng.randrange(9)
        if kind == 0:
            toks.append(rng.choice(cves))
        elif kind == 1:
            toks.append(rng.choice(D.CWE_IDS))
        elif kind == 2:
            toks.append(rng.choice(D.CAPEC_IDS))
        elif kind == 3:
            toks.append(rng.choice(D.TECHNIQUE_IDS))
        elif kind == 4:
            # a literal CPE 2.3 name (exact-id path); mostly in-dictionary
            row = rng.choice(cpe_rows)
            toks.append(row["cpeName"])
        elif kind == 5:
            # fuzzy vendor/product surface form (alias/TF-IDF path)
            row = rng.choice(alias_rows)
            toks.append(row["surface_form"])
        elif kind == 6:
            # non-technique ATT&CK entity ids (groups/software/campaigns/
            # mitigations/tactics) — exercise the full R7 rel catalog
            toks.append(rng.choice(D.ATTACK_OTHER_IDS))
        elif kind == 7:
            # d3fend technique ids (R8)
            toks.append(rng.choice(D.D3FEND_IDS))
        else:
            toks.append(rng.choice(_DECOYS))
    rng.shuffle(toks)
    return toks


def _html_body(rng: random.Random, toks: list[str], i: int) -> str:
    paras: list[str] = []
    cursor = 0
    for t in toks:
        filler = " ".join(rng.choices(_FILLER, k=rng.randint(4, 12)))
        style = rng.randrange(5)
        if style == 0:
            paras.append(f"<p>{filler} {t} {filler}</p>")
        elif style == 1:
            paras.append(f"<xhtml:p>{filler}\n  {t}&nbsp;&mdash; details follow.</xhtml:p>")
        elif style == 2:
            paras.append(f"<div><span>{filler} <b>{t}</b></span> trailing&#x2019;s note</div>")
        elif style == 3:
            paras.append(f"<li>{t}: {filler} &amp; more</li>")
        else:
            paras.append(f"<td>   {t}\t{filler}  </td>")
        cursor += 1
    rng.shuffle(paras)
    script = "<script>var CVE = 'CVE-2024-9999'; /* must not surface */</script>"
    style_blk = "<style>.cve { color: red } /* CWE-79 inside style is not text */</style>"
    return (
        "<html><head><title>Fixture advisory "
        + str(i)
        + "</title>"
        + style_blk
        + "</head><body>"
        + script
        + "<h1>Advisory &num; "
        + str(i)
        + "</h1>"
        + "".join(paras)
        + "<footer>generated fixture &copy; fixture.test</footer></body></html>"
    )


def page_row(i: int, seed: int = 42, filler_paras: int = 0) -> dict:
    """One page, deterministically derived from (seed, i) alone — safe to
    evaluate on any executor in any order. ``filler_paras`` pads the html
    with mention-free prose paragraphs (~180 bytes each) to reach realistic
    Common-Crawl page sizes for benchmarking."""
    rng = random.Random(f"{seed}:{i}")
    hot = rng.random() < 0.20
    toks = _mentions_for_page(rng, hot)
    html = _html_body(rng, toks, i)
    if filler_paras:
        pad = "".join(
            f"<p>{' '.join(rng.choices(_FILLER, k=24))}</p>"
            for _ in range(filler_paras)
        )
        html = html.replace("<footer>", pad + "<footer>", 1)
    lang_roll = rng.random()
    lang = "en"
    if lang_roll < 0.025:
        lang = "de"
    elif lang_roll < 0.05:
        lang = "fr"
    elif lang_roll < 0.06:
        lang = ""
    base_ts = _dt.datetime(2024, 1, 1, 0, 0, 0)
    return {
        "url": f"https://fixture.test/advisory/{i:06d}",
        "warc_ts": base_ts + _dt.timedelta(seconds=137 * i),
        "html": html.encode("utf-8"),
        "text": html[:100],
        "lang": lang,
    }


def synthesize_pages_df(spark, n: int, seed: int = 42, filler_paras: int = 0,
                        partitions: int | None = None):
    """Distributed page synthesis: spark.range → mapInPandas(page_row).
    Generation happens ON EXECUTORS (the driver never holds the corpus),
    which is the only generator shape that survives large n — and the bench
    shape that matches a real job reading an Iceberg pages table."""
    from pyspark.sql import types as Ty

    schema = Ty.StructType([
        Ty.StructField("url", Ty.StringType(), False),
        Ty.StructField("warc_ts", Ty.TimestampType(), True),
        Ty.StructField("html", Ty.BinaryType(), True),
        Ty.StructField("text", Ty.StringType(), True),
        Ty.StructField("lang", Ty.StringType(), True),
    ])

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = [page_row(int(i), seed, filler_paras) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    parts = partitions or spark.sparkContext.defaultParallelism * 2
    return spark.range(n, numPartitions=parts).mapInPandas(gen, schema)


def generate_pages(n: int = 200, seed: int = 42) -> list[dict]:
    """Returns row dicts (url, warc_ts, html: bytes, text, lang)."""
    rng = random.Random(seed)
    base_ts = _dt.datetime(2024, 1, 1, 0, 0, 0)
    rows: list[dict] = []
    for i in range(n):
        hot = rng.random() < 0.20
        toks = _mentions_for_page(rng, hot)
        html = _html_body(rng, toks, i)
        lang_roll = rng.random()
        lang = "en"
        if lang_roll < 0.025:
            lang = "de"
        elif lang_roll < 0.05:
            lang = "fr"
        elif lang_roll < 0.06:
            lang = ""
        rows.append({
            "url": f"https://fixture.test/advisory/{i:06d}",
            "warc_ts": base_ts + _dt.timedelta(seconds=137 * i),
            "html": html.encode("utf-8"),
            "text": html[:100],  # lossy pre-extracted column; pipeline must use html
            "lang": lang,
        })
    # ~2% duplicate urls with identical html (idempotent re-emission)
    n_dup = max(1, n // 50)
    for j in range(n_dup):
        rows.append(dict(rows[j * 7 % n]))
    return rows
