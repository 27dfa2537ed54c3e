"""PII detection and scrubbing for training corpora (engine tier).

The standard pre-training redaction pass (e.g. what C4/RefinedWeb-style
pipelines run before tokenization): detect and mask emails, IPv4
addresses, and phone-shaped digit runs with typed placeholder tokens,
keeping per-document match counts as filterable facts.

Everything is JVM-side column expressions — ``regexp_replace`` /
``regexp_count`` chains, no UDFs — so the scrub rides inside whole-stage
codegen and costs one projection over the corpus at any scale. The
patterns deliberately stay inside the regex intersection of Java's
engine (Spark) and RE2 (DuckDB): character classes, bounded repetition,
word boundaries — no backreferences or lookaround — so the DuckDB oracle
reproduces the scrub byte-for-byte.

Detection-order note: IPv4 runs before the phone pattern would also
match dotted digit runs, so each pattern is COUNTED on the original text
but APPLIED in a fixed chain (emails → IPv4 → phones), each over the
previous stage's output; the placeholder tokens contain no digits or
'@', so later patterns cannot re-match earlier replacements.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Placeholder tokens: no digits/'@'/dots so no pattern re-matches them.
EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# Java-regex ∩ RE2 — keep in lock-step with the *_SQL twins below.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}[- .]\d{3,4}[- .]\d{4}\b"


def pii_counts(col: str) -> tuple[Column, Column, Column]:
    """(n_emails, n_ipv4, n_phones) detected in ``col`` — counted on the
    ORIGINAL text, independent of scrub order."""
    c = F.col(col)
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)),
        F.regexp_count(c, F.lit(IPV4_RE)),
        F.regexp_count(c, F.lit(PHONE_RE)),
    )


def scrub_text(col: str) -> Column:
    """The masked text: emails → <EMAIL>, IPv4 → <IP>, phone-shaped digit
    runs → <PHONE>, applied in that fixed chain."""
    c = F.col(col)
    c = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, IPV4_RE, IP_TOKEN)
    c = F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)
    return c


def scrub_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ DataFrame(id, scrubbed_text, n_emails, n_ipv4, n_phones): one
    codegen projection per document, no shuffle."""
    emails, ips, phones = pii_counts(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        scrub_text(text_col).alias("scrubbed_text"),
        emails.alias("n_emails"),
        ips.alias("n_ipv4"),
        phones.alias("n_phones"),
    )


def pii_sql(col: str) -> dict[str, str]:
    """DuckDB twins of the count/scrub expressions (oracle parity).
    DuckDB's regexp engine is RE2; the patterns above are chosen to mean
    the same thing there."""
    email, ip, phone = (
        EMAIL_RE.replace("'", "''"),
        IPV4_RE.replace("'", "''"),
        PHONE_RE.replace("'", "''"),
    )
    return {
        "n_emails": f"len(regexp_extract_all({col}, '{email}'))",
        "n_ipv4": f"len(regexp_extract_all({col}, '{ip}'))",
        "n_phones": f"len(regexp_extract_all({col}, '{phone}'))",
        "scrubbed": (
            f"regexp_replace(regexp_replace(regexp_replace({col}, "
            f"'{email}', '{EMAIL_TOKEN}', 'g'), "
            f"'{ip}', '{IP_TOKEN}', 'g'), "
            f"'{phone}', '{PHONE_TOKEN}', 'g')"
        ),
    }
