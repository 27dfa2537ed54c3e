"""URL canonicalization as pure column expressions (engine tier).

The crawl-dedup step BEFORE any content hashing: CCNet and RefinedWeb
both deduplicate at URL granularity first, because two fetches of the
same canonical URL are duplicates regardless of byte differences
(timestamps, ads), and because URL-level dedup costs one shuffle on a
short key instead of content shingling. The canonical form here is the
deterministic, oracle-able core of that step:

1. strip the fragment (``#...`` never reaches the server);
2. lowercase the scheme and host (RFC 3986 §6.2.2.1 — scheme and host
   are case-insensitive; path and query are NOT and stay untouched);
3. drop userinfo (``user:pass@``) from the authority;
4. drop the scheme's default port (``:80`` for http, ``:443`` for https);
5. empty path → ``/`` (RFC 3986 §6.2.3);
6. query params: drop tracking params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid``, bare ``ref``) and empty fragments from
   ``&&`` runs, then SORT the remainder — param order is almost always
   semantically irrelevant and is the top source of spurious URL
   variants in crawl frontiers;
7. non-http(s) inputs (mailto:, ftp:, relative references) → NULL, so
   a downstream ``WHERE url_norm IS NOT NULL`` is the scheme gate.

Everything is ``regexp_extract`` / ``regexp_replace`` / higher-order
array expressions in the Java-regex ∩ RE2 subset (the same discipline
as functions/html.py), so the chain rides whole-stage codegen and the
DuckDB twin reproduces it byte-for-byte.

100 TB shape: per-row column expressions (no UDF, no shuffle); the
dedup that follows is one hash-shuffle on the canonical-url key, and
per-host accounting is a second short-key aggregation — both map-side
combinable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Java ∩ RE2 (no lookaround, no backreferences); keep in lock-step with
# the SQL twin below.
_SCHEME_RX = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RX = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RX = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RX = r"\?([^#]*)"
# one query param that is pure tracking noise: utm_* family, click ids,
# mailer ids, bare ref — matched against the full `k=v` fragment
_TRACKING_RX = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)(=|$)"


def url_host(col: Column | str) -> Column:
    """Lowercased host (+ non-default port) of an absolute URL; '' when
    the input has no ``scheme://authority`` prefix."""
    c = F.col(col) if isinstance(col, str) else col
    base = F.regexp_replace(c, "#.*", "")
    auth = F.regexp_extract(base, _AUTH_RX, 1)
    host = F.lower(F.regexp_replace(auth, "^[^@]*@", ""))
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RX, 1))
    return (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )


def url_normalize(col: Column | str) -> Column:
    """Canonical form of an http(s) URL (module docstring chain); NULL
    for any other scheme or a relative reference."""
    c = F.col(col) if isinstance(col, str) else col
    base = F.regexp_replace(c, "#.*", "")
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RX, 1))
    host = url_host(c)
    path = F.regexp_extract(base, _PATH_RX, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(base, _QUERY_RX, 1)
    qn = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda x: (x != "") & ~x.rlike(_TRACKING_RX),
            )
        ),
        "&",
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qn == "", F.lit("")).otherwise(F.concat(F.lit("?"), qn)),
    )
    return F.when(scheme.isin("http", "https"), rebuilt).otherwise(F.lit(None))


def _q(s: str) -> str:
    # DuckDB single-quoted literals keep backslashes as-is; only the
    # quote character needs doubling
    return s.replace("'", "''")


def url_host_sql(col: str) -> str:
    """DuckDB twin of :func:`url_host` (RE2; identical chain)."""
    base = f"regexp_replace({col}, '#.*', '', 'g')"
    auth = f"regexp_extract({base}, '{_q(_AUTH_RX)}', 1)"
    host = f"lower(regexp_replace({auth}, '^[^@]*@', ''))"
    scheme = f"lower(regexp_extract({base}, '{_q(_SCHEME_RX)}', 1))"
    return (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )


def url_normalize_sql(col: str) -> str:
    """DuckDB twin of :func:`url_normalize` (RE2; identical chain)."""
    base = f"regexp_replace({col}, '#.*', '', 'g')"
    scheme = f"lower(regexp_extract({base}, '{_q(_SCHEME_RX)}', 1))"
    host = url_host_sql(col)
    path0 = f"regexp_extract({base}, '{_q(_PATH_RX)}', 1)"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    q = f"regexp_extract({base}, '{_q(_QUERY_RX)}', 1)"
    # COALESCE: DuckDB's array_to_string is NULL on an EMPTY list where
    # Spark's array_join is '' — the all-params-filtered case must agree
    qn = (
        "COALESCE(array_to_string(list_sort(list_filter(string_split("
        + q
        + ", '&'), x -> x <> '' AND NOT regexp_matches(x, '"
        + _q(_TRACKING_RX)
        + "'))), '&'), '')"
    )
    rebuilt = (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qn} = '' THEN '' ELSE '?' || {qn} END"
    )
    return (
        f"CASE WHEN {scheme} IN ('http', 'https') THEN {rebuilt} "
        f"ELSE NULL END"
    )
