"""PII scrubbing for training-data pipelines: redact emails, phone
numbers, and IPv4 addresses with placeholder tokens, counting each.

Scale design: pure Column expressions — ``regexp_count`` +
``regexp_replace`` run inside whole-stage codegen on the JVM (no
Python worker, no Arrow hop), so the scrub rides the same map-only
scan as any projection and shuffles nothing. Patterns are restricted
to the regex subset with identical semantics in Java (Spark) and RE2
(DuckDB) — character classes, bounded quantifiers, no backreferences
or lookaround — so the oracle can mirror them verbatim.

Counts and replacements are applied SEQUENTIALLY (emails → phones →
IPv4), each pattern counted on the text as left by the previous
scrub, so a token consumed by an earlier pattern can never be
double-counted by a later one. The mirror applies the same order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Java/RE2-portable patterns (see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

# (pattern, placeholder, count column) in application order
PII_RULES: list[tuple[str, str, str]] = [
    (EMAIL_RE, "<EMAIL>", "n_emails"),
    (PHONE_RE, "<PHONE>", "n_phones"),
    (IPV4_RE, "<IP>", "n_ips"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Redact PII in ``text_col``: returns the input plus one count
    column per rule (n_emails, n_phones, n_ips) and the scrubbed text
    in ``out_col`` (default: replace ``text_col`` in place).

    Each stage's (count, scrubbed text) pair is materialized behind a
    Generate (explode of a one-element struct array) before the next
    stage reads it — the same barrier as ``predict_language``. Without
    it CollapseProject inlines the replace chain into every consumer
    and the email regex runs 4× per row, phone 3×, IP 2× (visible in
    the collapsed plan's Project). Generate is codegen-capable, so the
    scrub stays one map-only whole-stage-codegen pass with no Python
    worker and no shuffle (plan-ratcheted in tests/test_plans.py)."""
    out_col = out_col or text_col
    keep = [c for c in df.columns if c != out_col]
    done: list[str] = []
    cur = df
    cur_text: Column = F.col(text_col)
    last = len(PII_RULES) - 1
    for i, (pat, placeholder, cnt_name) in enumerate(PII_RULES):
        stage = F.struct(
            F.regexp_count(cur_text, F.lit(pat)).alias("n"),
            F.regexp_replace(cur_text, pat, placeholder).alias("t"),
        )
        text_alias = out_col if i == last else "__pii_text"
        cur = cur.select(
            *keep, *done, F.explode(F.array(stage)).alias("__pii")
        ).select(
            *keep,
            *done,
            F.col("__pii.n").alias(cnt_name),
            F.col("__pii.t").alias(text_alias),
        )
        done.append(cnt_name)
        cur_text = F.col(text_alias)
    return cur
