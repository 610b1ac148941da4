"""PII detection + redaction over text columns.

A training-data pipeline must find and strip personally identifying
strings (emails, IPv4 addresses, phone numbers) before a corpus
ships. Both sides of the work are pure JVM-side column expressions —
`regexp_extract_all` to count, chained `regexp_replace` to redact —
so the scan parallelizes like any other projection: no UDF, no
shuffle beyond the final per-group aggregate, cost linear in corpus
bytes at any scale.

Cross-engine parity: the patterns below use only the regex subset on
which Java's engine (Spark) and RE2 (DuckDB) agree — character
classes, bounded quantifiers, `\\d`, `\\b` — no alternation, no
lookaround (RE2 has none), no capture groups (group 0 everywhere).
Greedy quantifier + leftmost-first matching behave identically, so
match counts and redacted text are byte-identical across engines and
the driver oracle checks them exactly.

Reference analog: ariadne's holdout/test-entity filters that keep
must-not-index material out of the analyzed set (P4,
`packages/core/src/project/detect_test_file.ts:21` — per-language
filename-pattern registries; here the registry is PII shape patterns
over content).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered registry: redaction applies in this order (order is part of
# the contract — a later pattern must not match inside an earlier
# pattern's replacement token, which the all-letter tokens guarantee).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind non-overlapping match counts in `text` (long each)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def redact(text: Column) -> Column:
    """`text` with every registry match replaced by its token, applied
    in registry order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_stats(
    df: DataFrame, text: Column, group_cols: list[str]
) -> DataFrame:
    """Per-group PII audit of `text`: document counts, per-kind match
    totals, the character delta redaction would apply, and a residual
    self-check (matches remaining AFTER redaction — 0 by construction,
    and the oracle checks that 0 exactly).

    Output columns: group_cols, n_docs, docs_with_pii, n_email, n_ipv4,
    n_phone, redacted_delta_chars, residual_matches (all long).
    """
    # materialize the chained-regex redaction ONCE per row: inlining
    # `red` into the residual counts and the length delta would run
    # the full replace chain 4x per row (Catalyst does not CSE across
    # projection expressions — same fix as the Bloom fingerprint)
    counts = pii_counts(text)
    staged = df.select(
        *group_cols,
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        F.length(text).cast("long").alias("len0"),
        redact(text).alias("red"),
    )
    residual = F.lit(0).cast("long")
    for _, pat, _ in PII_PATTERNS:
        residual = residual + F.size(
            F.regexp_extract_all(F.col("red"), F.lit(pat), F.lit(0))
        ).cast("long")
    per_doc = staged.select(
        *group_cols,
        *[F.col(f"n_{k}") for k, _, _ in PII_PATTERNS],
        (F.col("len0") - F.length("red")).cast("long").alias("delta"),
        residual.alias("residual"),
    )
    any_pii = sum(F.col(f"n_{k}") for k, _, _ in PII_PATTERNS)
    return per_doc.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((any_pii > 0).cast("long")).alias("docs_with_pii"),
        *[F.sum(f"n_{k}").alias(f"n_{k}") for k, _, _ in PII_PATTERNS],
        F.sum("delta").alias("redacted_delta_chars"),
        F.sum("residual").alias("residual_matches"),
    )


def _sql_count(text_sql: str, pat: str) -> str:
    return f"len(regexp_extract_all({text_sql}, '{pat}', 0))"


def _sql_redact(text_sql: str) -> str:
    out = text_sql
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def pii_stats_sql(table_sql: str, text_sql: str, group_cols: list[str]) -> str:
    """DuckDB twin of `pii_stats` (identical patterns, order, output).

    DuckDB regexp_replace needs the explicit 'g' flag (Spark's is
    global by default); RE2 never escapes `\\` inside a standard
    single-quoted SQL literal, so the patterns paste verbatim.

    residual_matches is a LITERAL 0 here, deliberately NOT a
    recomputation: the column is the redactor's completeness contract,
    and pinning the constant makes the driver's value-hash compare
    FAIL if Spark's computed residual ever becomes nonzero. A twin
    that recomputed the residual with the same regexes would pass on
    any incomplete redaction both engines agree on — parity without
    the guarantee.
    """
    g = ", ".join(group_cols)
    kinds = [(k, p) for k, p, _ in PII_PATTERNS]
    red = _sql_redact(text_sql)
    per_kind = ",\n                 ".join(
        f"CAST({_sql_count(text_sql, p)} AS BIGINT) AS n_{k}" for k, p in kinds
    )
    any_pii = " + ".join(f"n_{k}" for k, _ in kinds)
    sums = ",\n               ".join(
        f"CAST(sum(n_{k}) AS BIGINT) AS n_{k}" for k, _ in kinds
    )
    return f"""
        WITH per_doc AS (
          SELECT {g},
                 {per_kind},
                 CAST(length({text_sql}) - length({red}) AS BIGINT) AS delta
          FROM {table_sql})
        SELECT {g}, count(*) AS n_docs,
               CAST(sum(CASE WHEN {any_pii} > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_with_pii,
               {sums},
               CAST(sum(delta) AS BIGINT) AS redacted_delta_chars,
               CAST(0 AS BIGINT) AS residual_matches
        FROM per_doc GROUP BY {g}
    """
