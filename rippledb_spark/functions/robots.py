"""robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
the crawl-politeness gate every fetch pipeline runs before touching a
URL, as PURE column expressions (parse with split/window, match with
LIKE) so both the plan and the DuckDB oracle are whole-stage relational.

Scope (the subset a distributed bulk gate needs):

- group parsing per RFC: consecutive ``User-agent`` lines open ONE
  group; the group's rules are the Allow/Disallow lines that follow;
  comments (``#…``) strip; field names are case-insensitive, rule PATHS
  keep their case; empty-value rules drop. Only the ``*`` group is
  evaluated (a bulk crawler matches the global group — per-product
  groups select differently but identically in shape);
- matching per RFC: a rule matches a path by prefix with ``*`` as any-
  sequence wildcard and a trailing ``$`` anchoring the end; precedence
  is the LONGEST pattern (octet length), Allow winning length ties;
  no matching rule → allowed. Implemented as one LIKE-join: robots
  patterns compile to SQL LIKE patterns (escape ``\\%_``, ``*``→``%``,
  trailing ``$`` drops the implicit suffix wildcard) — identical
  semantics in Spark and DuckDB.

Scale shape: parsing is one explode + two windows per robots file
(host-keyed — bounded by the largest single file, never the corpus);
the decision join is rules×URLs per HOST (robots files are small, so
the per-host rule set is tiny and broadcastable); one row_number window
picks the winning rule. No UDFs anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def robots_rules(df: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """(host, robots.txt text) → DataFrame(host, rule_type, pattern,
    rule_len, like_pat): the ``*`` group's Allow/Disallow rules with
    their compiled LIKE patterns."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    )
    stripped = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    has_colon = F.instr(stripped, ":") > 0
    field = F.lower(F.trim(F.substring_index(stripped, ":", 1)))
    value = F.trim(F.expr(
        "substring(trim(regexp_replace(raw, '#.*$', '')),"
        " instr(trim(regexp_replace(raw, '#.*$', '')), ':') + 1)"
    ))
    tagged = lines.select(
        "host",
        "line_no",
        F.when(has_colon, field).otherwise(F.lit("")).alias("field"),
        F.when(has_colon, value).otherwise(F.lit("")).alias("value"),
    ).withColumn("is_ua", F.col("field") == "user-agent")
    w = Window.partitionBy("host").orderBy("line_no")
    grouped = tagged.withColumn(
        "new_group",
        F.col("is_ua")
        & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
    ).withColumn(
        "group_id",
        F.sum(F.col("new_group").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    gw = Window.partitionBy("host", "group_id")
    in_star = grouped.withColumn(
        "star_group",
        F.max(
            (F.col("is_ua") & (F.col("value") == "*")).cast("int")
        ).over(gw)
        == 1,
    )
    rules = in_star.where(
        F.col("star_group")
        & F.col("field").isin("allow", "disallow")
        & (F.col("value") != "")
    ).select(
        "host",
        F.col("field").alias("rule_type"),
        F.col("value").alias("pattern"),
        F.length("value").alias("rule_len"),
    )
    # literal (non-regex) replaces, same semantics as DuckDB's replace():
    # escape LIKE metacharacters, then robots '*' becomes LIKE '%'
    starred = F.replace(
        F.replace(
            F.replace(
                F.replace(F.col("pattern"), F.lit("\\"), F.lit("\\\\")),
                F.lit("%"),
                F.lit("\\%"),
            ),
            F.lit("_"),
            F.lit("\\_"),
        ),
        F.lit("*"),
        F.lit("%"),
    )
    like_pat = F.when(
        F.col("pattern").endswith("$"),
        F.expr("substring(lp, 1, length(lp) - 1)"),
    ).otherwise(F.concat(F.col("lp"), F.lit("%")))
    return (
        rules.withColumn("lp", starred)
        .withColumn("like_pat", like_pat)
        .drop("lp")
    )


def robots_decisions(
    urls: DataFrame, rules: DataFrame, host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """URLs × rules → DataFrame(host, path, allowed, matched_rule):
    RFC 9309 precedence (longest pattern, Allow wins ties; no match →
    allowed). ``matched_rule`` is NULL for default-allowed paths."""
    u = urls.select(F.col(host_col).alias("host"), F.col(path_col).alias("path"))
    j = u.join(F.broadcast(rules), "host").where(
        F.expr("path LIKE like_pat ESCAPE '\\\\'")
    )
    w = Window.partitionBy("host", "path").orderBy(
        F.col("rule_len").desc(),
        (F.col("rule_type") == "allow").desc(),
        F.col("pattern"),
    )
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "host",
            "path",
            (F.col("rule_type") == "allow").alias("allowed"),
            F.col("pattern").alias("matched_rule"),
        )
    )
    return u.join(best, ["host", "path"], "left").select(
        "host",
        "path",
        F.coalesce("allowed", F.lit(True)).alias("allowed"),
        "matched_rule",
    )


def robots_rules_sql(table: str, host_col: str, text_col: str) -> str:
    """DuckDB CTE twin of :func:`robots_rules`; yields ``rb_rules``
    (host, rule_type, pattern, rule_len, like_pat)."""
    return f"""rb_lines AS (
      SELECT {host_col} AS host, i AS line_no,
             trim(regexp_replace(
               string_split({text_col}, chr(10))[CAST(i AS INT)],
               '#.*$', '')) AS s
      FROM {table},
           UNNEST(range(1, len(string_split({text_col}, chr(10))) + 1)) AS u(i)
    ),
    rb_tagged AS (
      SELECT host, line_no,
             CASE WHEN instr(s, ':') > 0
                  THEN lower(trim(string_split(s, ':')[1])) ELSE '' END
               AS field,
             CASE WHEN instr(s, ':') > 0
                  THEN trim(substring(s, instr(s, ':') + 1)) ELSE '' END
               AS value
      FROM rb_lines
    ),
    rb_marks AS (
      SELECT *,
             (is_ua AND NOT COALESCE(
                lag(is_ua) OVER (PARTITION BY host ORDER BY line_no),
                FALSE)) AS new_group
      FROM (SELECT *, field = 'user-agent' AS is_ua FROM rb_tagged)
    ),
    rb_grouped AS (
      SELECT *,
             SUM(CASE WHEN new_group THEN 1 ELSE 0 END)
               OVER (PARTITION BY host ORDER BY line_no
                     ROWS UNBOUNDED PRECEDING) AS group_id
      FROM rb_marks
    ),
    rb_star AS (
      SELECT *,
             MAX(CASE WHEN is_ua AND value = '*' THEN 1 ELSE 0 END)
               OVER (PARTITION BY host, group_id) = 1 AS star_group
      FROM rb_grouped
    ),
    rb_rules AS (
      SELECT host, field AS rule_type, value AS pattern,
             CAST(length(value) AS INT) AS rule_len,
             CASE WHEN value LIKE '%$'
                  THEN substring(lp, 1, length(lp) - 1)
                  ELSE lp || '%' END AS like_pat
      FROM (
        SELECT *,
               replace(replace(replace(replace(value,
                 '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%') AS lp
        FROM rb_star
        WHERE star_group AND field IN ('allow', 'disallow') AND value <> ''
      )
    )"""


def robots_decisions_sql(urls_rel: str) -> str:
    """DuckDB CTE twin of :func:`robots_decisions` over ``rb_rules`` and
    a (host, path) relation; yields ``rb_decisions``."""
    return f"""rb_matches AS (
      SELECT u.host, u.path, r.rule_type, r.pattern, r.rule_len,
             row_number() OVER (
               PARTITION BY u.host, u.path
               ORDER BY r.rule_len DESC,
                        (r.rule_type = 'allow') DESC,
                        r.pattern) AS rn
      FROM {urls_rel} u
      JOIN rb_rules r ON r.host = u.host
        AND u.path LIKE r.like_pat ESCAPE '\\'
    ),
    rb_decisions AS (
      SELECT u.host, u.path,
             COALESCE(m.rule_type = 'allow', TRUE) AS allowed,
             m.pattern AS matched_rule
      FROM {urls_rel} u
      LEFT JOIN (SELECT * FROM rb_matches WHERE rn = 1) m
        ON m.host = u.host AND m.path = u.path
    )"""
