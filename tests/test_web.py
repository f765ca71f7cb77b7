"""URL canonicalization + HTML extraction (functions/web.py): pinned
transformation semantics, Spark↔DuckDB engine parity, idempotence."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from camden_spark.functions.web import (
    canonicalize_url,
    canonicalize_url_sql,
    html_to_text,
    html_to_text_sql,
)

URL_CASES = [
    # (raw, expected canonical)
    ("HTTPS://WWW.Example.COM:443/Path/Doc?utm_source=a&utm_campaign=b#frag",
     "https://www.example.com/Path/Doc"),
    ("http://site.example:80/x?id=7&utm_medium=rss",
     "http://site.example/x?id=7"),
    ("https://site.example/x?a=1&fbclid=XY123&b=2",
     "https://site.example/x?a=1&b=2"),
    ("https://site.example/x?fbclid=XY123&a=1",
     "https://site.example/x?a=1"),
    ("https://site.example/x?utm_source=only",
     "https://site.example/x"),
    ("HTTP://NOPORT.EXAMPLE/plain",
     "http://noport.example/plain"),
    # :443 is NOT default for http — must survive
    ("http://site.example:443/x", "http://site.example:443/x"),
    # path/query case is significant
    ("https://Site.Example/CaseS?Q=Vv", "https://site.example/CaseS?Q=Vv"),
    # boundary discipline: params that merely END in a tracking name survive
    ("https://site.example/x?xgclid=5&myutm_x=3",
     "https://site.example/x?xgclid=5&myutm_x=3"),
    # an unencoded value containing a tracking-looking substring survives
    ("https://site.example/x?q=see+utm_a%3Db&keep=1",
     "https://site.example/x?q=see+utm_a%3Db&keep=1"),
    # mixed: real tracking params drop, look-alikes stay
    ("https://site.example/x?xfbclid=1&gclid=real&keep=2",
     "https://site.example/x?xfbclid=1&keep=2"),
    # consecutive tracking params all drop (each match eats its own separator)
    ("https://site.example/x?utm_a=1&utm_b=2&keep=1",
     "https://site.example/x?keep=1"),
]

HTML_CASES = [
    ("<html><body><p>hello <b>world</b></p></body></html>", "hello world"),
    ("<p>a</p><script>var x = '<p>not text</p>';</script><p>b</p>", "a b"),
    ("<style>p { color: red }</style>visible", "visible"),
    ("before<!-- hidden comment -->after", "before after"),
    ("one&nbsp;two &amp; three &lt;tag&gt; &quot;q&quot; &#39;s&#39;",
     'one two & three <tag> "q" \'s\''),
    # &amp; decodes LAST: "&amp;lt;" is the literal text "&lt;"
    ("x &amp;lt; y", "x &lt; y"),
    ("  <div>\n spaced \t text </div>  ", "spaced text"),
    ("<SCRIPT a=b>s</SCRIPT>kept", "kept"),
    # cross-close must NOT terminate the block: a stray </style> inside a
    # <script> block (and vice versa) is script text, dropped with the block
    ("<script>a '</style>' b</script>after", "after"),
    ("<style>s '</script>' t</style>after", "after"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in URL_CASES], ["url"])
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in URL_CASES]


def test_html_to_text_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in HTML_CASES], ["html"])
    got = [r[0] for r in df.select(html_to_text(F.col("html"))).collect()]
    assert got == [want for _, want in HTML_CASES]


def test_duckdb_mirrors_agree(spark):
    """The SQL builders state the SAME transformation: byte-identical output
    on every pinned case (the engine-parity property the driver hash check
    relies on)."""
    con = duckdb.connect()
    for raw, want in URL_CASES:
        got = con.execute(
            f"WITH t(v) AS (SELECT ?) SELECT {canonicalize_url_sql('v')} FROM t",
            [raw],
        ).fetchone()[0]
        assert got == want, f"duckdb canon({raw!r}) = {got!r}"
    for raw, want in HTML_CASES:
        got = con.execute(
            f"WITH t(v) AS (SELECT ?) SELECT {html_to_text_sql('v')} FROM t",
            [raw],
        ).fetchone()[0]
        assert got == want, f"duckdb html({raw!r}) = {got!r}"


def test_canonicalize_idempotent(spark):
    """canon(canon(x)) == canon(x) — canonical forms are fixed points."""
    df = spark.createDataFrame([(r,) for r, _ in URL_CASES], ["url"])
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = [r[0] for r in once.select(canonicalize_url(F.col("c"))).collect()]
    assert twice == [r[0] for r in once.collect()]


@pytest.mark.parametrize("name", ["url_canonicalize", "html_extract"])
def test_driver_queries_nonvacuous(spark, name):
    import os

    from camden_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        pytest.skip("driver testdata not present")
    rows = QUERIES[name](spark, sf).limit(10).collect()
    assert rows and all(r[-1] is not None for r in rows)


def test_pipeline_canonicalize_urls_collapses_crawl_dups(spark):
    """With canonicalize_urls=True, urls that differ only by tracking params
    / case / fragment become ONE key, so byte-identical texts under messy
    url variants cluster in the exact stage under the canonical key."""
    import datetime as _dt

    from camden_spark.config import DedupConfig
    from camden_spark.plans.pipeline import DedupPipeline

    ts = _dt.datetime(2025, 1, 1)
    rows = [
        ("https://site.example/a?utm_source=x", ts, None, "same text", "en"),
        ("HTTPS://Site.Example/a#frag", _dt.datetime(2025, 1, 2), None,
         "same text", "en"),
        ("https://site.example/b", ts, None, "other text", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    res = DedupPipeline(cfg=DedupConfig(canonicalize_urls=True)).run(df)
    rows_out = res.clusters.collect()
    res.release()
    # both messy variants now carry the canonical key and, being
    # byte-identical, form one exact-dup cluster under it
    assert len(rows_out) == 3
    by_url = {}
    for r in rows_out:
        by_url.setdefault(r["url"], []).append(r["cluster_id"])
    assert set(by_url) == {"https://site.example/a", "https://site.example/b"}
    assert by_url["https://site.example/a"] == ["https://site.example/a"] * 2
    assert by_url["https://site.example/b"] == ["https://site.example/b"]


def test_pipeline_webtext_bounded_exact_collapse(spark):
    """The end-to-end webtext row's planted mirror group (doc_id % 40 == 3,
    byte-identical extracted bodies under distinct urls) must collapse at
    the EXACT stage — one survivor feeds near-dup — and the whole group
    must share one cluster id in the output."""
    from camden_spark.entry_queries import (
        _WEBTEXT_SHARED_BODY,
        _webtext_pages,
        q_pipeline_webtext_bounded,
    )

    sf_dir = "/root/testdata/sf0.001"
    pages = _webtext_pages(spark, sf_dir)
    planted = pages.filter(F.col("doc_id") % 40 == 3).select("text").collect()
    texts = {r["text"] for r in planted}
    # variable fields (lang, source) live only in stripped html regions, so
    # extraction is byte-identical across the mirror group
    assert len(planted) == 5 and len(texts) == 1
    assert _WEBTEXT_SHARED_BODY in next(iter(texts))

    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in q_pipeline_webtext_bounded(spark, sf_dir).collect()
    }
    assert len(out) == 199
    group = [out[i] for i in (3, 43, 83, 123, 163)]
    cids = {c for c, _ in group}
    assert len(cids) == 1  # one cluster for the whole mirror group
    # exactly one member of the group is the cluster canonical
    assert sum(1 for c, canon in group if canon) == 1
