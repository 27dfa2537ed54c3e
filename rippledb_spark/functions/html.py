"""HTML → text extraction as a pure codegen regexp chain (engine tier).

The step between a WARC crawl and a documents table: strip markup,
decode the common entities, normalize whitespace. Real pipelines layer
readability heuristics on top (main-content detection, link-density
pruning); this is the deterministic, oracle-able core those heuristics
refine — C4 itself starts from exactly this class of tag-strip + line
rules.

Everything is ``regexp_replace`` / ``replace`` column expressions (no
UDF), inside the Java-regex ∩ RE2 subset (no backreferences, no
lookaround — the same discipline as operators/pii.py), so the chain
rides in whole-stage codegen AND the DuckDB oracle reproduces it
byte-for-byte.

Chain order matters and is part of the contract:

1. script/style elements (content dropped whole, non-greedy, (?is));
2. HTML comments;
3. block-closing tags → newline (paragraph structure survives);
4. every remaining tag → space;
5. entity decode — ``&amp;`` LAST so ``&amp;lt;`` yields the literal
   ``&lt;`` (single decode, per the spec's parsing of the source text);
   decoded ``<``/``>`` can no longer form tags because stripping is done;
6. whitespace normalization: horizontal runs → one space, newline runs
   (with surrounding spaces) → one newline, then trim.

Known regex-class limitation (documented, shared by both engines): a
literal ``>`` inside a quoted attribute value terminates that tag early
— full HTML5 tokenization is not regular, and the miss is identical on
both sides of the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# (pattern, replacement) — Java ∩ RE2; keep in lock-step with the SQL twin.
_TAG_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # after the tag name: end-of-tag, whitespace, or '/', so that e.g.
    # <brand> or </party> fall through to the generic tag→space step
    # instead of prefix-matching br / /p (no lookahead in Java∩RE2, so
    # the boundary is spelled as the optional whitespace-led suffix).
    # The class is spelled out rather than \s: Java's \s includes \x0B
    # but RE2's does not, and the contract is byte-for-byte parity.
    (r"(?i)<(?:br|hr|/p|/div|/li|/tr|/h[1-6]|/title)(?:[ \t\n\r\f\x0B/][^>]*)?>", "\n"),
    (r"<[^>]*>", " "),
]

_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last: single-decode semantics
]

_WS_STEPS: list[tuple[str, str]] = [
    # \x0B, not \v: Java's \v is the VERTICAL-WHITESPACE CLASS (it would
    # swallow \n); RE2's \v is the vertical tab — \x0B means the same
    # single character in both engines
    (r"[ \t\r\f\x0B]+", " "),
    (r" ?\n[ \n]*", "\n"),
    (r"^[ \n]+|[ \n]+$", ""),
]


def strip_html(col: Column | str) -> Column:
    """Markup-stripped, entity-decoded, whitespace-normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _TAG_STEPS:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for pat, repl in _WS_STEPS:
        c = F.regexp_replace(c, pat, repl)
    return c


def strip_html_sql(col: str) -> str:
    """DuckDB twin: the identical chain over RE2 with the 'g' flag."""

    def q(s: str) -> str:
        # DuckDB single-quoted literals keep backslashes as-is; only the
        # quote needs doubling
        return s.replace("'", "''")

    expr = col
    for pat, repl in _TAG_STEPS:
        r = "chr(10)" if repl == "\n" else f"'{repl}'"
        expr = f"regexp_replace({expr}, '{q(pat)}', {r}, 'g')"
    for ent, ch in _ENTITIES:
        expr = f"replace({expr}, '{q(ent)}', '{q(ch)}')"
    for pat, repl in _WS_STEPS:
        r = "chr(10)" if repl == "\n" else f"'{repl}'"
        expr = f"regexp_replace({expr}, '{q(pat)}', {r}, 'g')"
    return expr


# anchor-href extraction: the (?is) flags make it case-insensitive and
# let attributes span lines; group 1 is the quoted href value. The SAME
# pattern compiles under Java regex (Spark) and RE2 (DuckDB) — no
# backreferences, no lookarounds (the Java∩RE2 contract of this module).
_HREF_RE = "(?is)<a[^>]*href\\s*=\\s*[\"']([^\"']+)[\"']"


def extract_links(col: Column | str) -> Column:
    """→ array<string> of every ``<a href="...">`` target in document
    order (quoted hrefs, single or double; unquoted hrefs are rare
    enough in modern HTML that the frontier treats them as no-link)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_HREF_RE), 1)


def extract_links_sql(col: str) -> str:
    """DuckDB twin of :func:`extract_links`."""
    pat = _HREF_RE.replace("'", "''")
    return f"regexp_extract_all({col}, '{pat}', 1)"


# sitemap <loc> extraction (sitemaps.org protocol): the other half of
# frontier discovery beside <a href>. Same Java∩RE2 contract.
_SITEMAP_LOC_RE = "(?is)<loc>\\s*([^<]+?)\\s*</loc>"


def extract_sitemap_urls(col: Column | str) -> Column:
    """→ array<string> of every ``<loc>`` URL in a sitemap.xml document
    (also matches ``<sitemap><loc>`` index entries — callers decide
    whether a target is a page or a nested sitemap)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_SITEMAP_LOC_RE), 1)


def extract_sitemap_urls_sql(col: str) -> str:
    """DuckDB twin of :func:`extract_sitemap_urls`."""
    pat = _SITEMAP_LOC_RE.replace("'", "''")
    return f"regexp_extract_all({col}, '{pat}', 1)"
