"""Web-page column functions: URL canonicalization + HTML text extraction.

The reference dedups filesystem paths; the north rule's table is keyed by
``url`` with an ``html`` payload column (BASELINE input_hint), so a
Common-Crawl-scale deployment needs BOTH of these before the exact stage:
url canonicalization collapses crawl-duplicate keys (scheme/host case,
default ports, tracking params, fragments), and text extraction is what
produces the ``text`` column whose bytes the checksum stage fingerprints
("byte-identical extracted text per url").

Everything here is Catalyst builtins (regexp_replace / regexp_extract /
replace chains — whole-stage codegen, zero UDFs), and every regex is
written in the Java∩RE2 common subset (no lookarounds, no backreferences)
so a DuckDB oracle can state the transformation verbatim.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: query parameters that never affect page identity (tracking/click ids)
TRACKING_PARAMS = r"(utm_[a-zA-Z]+|fbclid|gclid|msclkid|ref_src)"

#: html entities decoded after tag stripping, in apply order.  ``&amp;``
#: must decode LAST or it would re-introduce decodable entities
#: ("&amp;lt;" means the literal text "&lt;", not "<").
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) url — pure builtins.

    Steps (each SQL-statable; tests/test_web.py pins the semantics):

    1. strip the fragment (``#...``)
    2. lowercase the scheme+authority (path/query stay case-sensitive)
    3. drop default ports (``:80`` for http, ``:443`` for https)
    4. remove tracking query params (TRACKING_PARAMS), then repair the
       separators they leave behind (``?&`` → ``?``, ``&&`` runs → ``&``,
       trailing ``?``/``&`` dropped)

    The tracking-param match is anchored on its ``[?&]`` separator (kept via
    backreference in the replacement), so a param that merely *ends* in a
    tracking name (``?xgclid=5``, ``&myutm_x=3``) survives intact — the same
    boundary discipline as the reference's suffix-anchored extension match
    (src/scanner.rs:71-79).  A global pass handles runs of tracking params
    because each match consumes its own separator, and the repair passes
    absorb the separators the replacement re-emits.
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    head = F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    rest = F.substring(no_frag, F.length(head) + 1, F.lit(1 << 30))
    head = F.lower(head)
    head = F.when(
        head.startswith("http://"), F.regexp_replace(head, r":80$", "")
    ).when(
        head.startswith("https://"), F.regexp_replace(head, r":443$", "")
    ).otherwise(head)
    rest = F.regexp_replace(rest, r"([?&])" + TRACKING_PARAMS + r"=[^&#]*", r"$1")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    return F.concat(head, rest)


def html_to_text(html: Column) -> Column:
    """Extract visible text from an html string column — pure builtins.

    script/style subtrees and comments are dropped wholesale, every other
    tag becomes a space (block boundaries must separate words), the common
    entities decode (HTML_ENTITIES order — ``&amp;`` last), and whitespace
    collapses to single spaces.  A regex pass, not a spec-complete parser:
    exactly the trade a petabyte-scale extraction stage makes (parsing is
    per-row CPU; the dedup semantics only need DETERMINISTIC bytes, which
    this is — same input, same output, either engine).

    script and style blocks strip through SEPARATE regexes (not an
    alternation on both sides, which would let ``</style>`` close a
    ``<script>`` block) — still backreference-free Java∩RE2.  Known
    documented trade: ``<[^>]+>`` truncates at a literal ``>`` inside an
    attribute value (``<a title="a>b">`` leaves ``b">`` behind) —
    deterministic on both engines, acceptable for dedup fingerprinting."""
    out = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, rep in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.trim(F.regexp_replace(out, r"[ \t\n\f\r]+", " "))
    return out


# --- DuckDB mirrors (verbatim transformation, RE2 flavor) -------------------

def canonicalize_url_sql(expr: str) -> str:
    """DuckDB SQL stating canonicalize_url over ``expr`` verbatim."""
    no_frag = f"regexp_replace({expr}, '#.*$', '', 'g')"
    head = f"regexp_extract({no_frag}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)"
    lhead = f"lower({head})"
    head_fixed = (
        f"CASE WHEN {lhead} LIKE 'http://%' THEN regexp_replace({lhead}, ':80$', '') "
        f"WHEN {lhead} LIKE 'https://%' THEN regexp_replace({lhead}, ':443$', '') "
        f"ELSE {lhead} END"
    )
    rest = f"substr({no_frag}, length({head}) + 1)"
    rest = (
        f"regexp_replace({rest}, '([?&]){TRACKING_PARAMS}=[^&#]*', '\\1', 'g')"
    )
    rest = f"regexp_replace({rest}, '&&+', '&', 'g')"
    rest = f"regexp_replace({rest}, '\\?&', '?', 'g')"
    rest = f"regexp_replace({rest}, '[?&]+$', '', 'g')"
    return f"({head_fixed} || {rest})"


def html_to_text_sql(expr: str) -> str:
    """DuckDB SQL stating html_to_text over ``expr`` verbatim."""
    out = (
        f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    )
    out = f"regexp_replace({out}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    out = f"regexp_replace({out}, '(?s)<!--.*?-->', ' ', 'g')"
    out = f"regexp_replace({out}, '<[^>]+>', ' ', 'g')"
    for ent, rep in HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({out}, '[ \\t\\n\\f\\r]+', ' ', 'g'))"
