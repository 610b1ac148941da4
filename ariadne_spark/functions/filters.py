"""Holdout / framework-entry predicate registry (SURVEY §2.2 P4-P5).

The reference filters its entry-point set twice before reporting:

- `is_test_file` — a per-LANGUAGE registry of filename-pattern
  detectors (`packages/core/src/project/detect_test_file.ts:21`
  dispatching to `.typescript/.javascript/.python/.rust.ts`); files
  matching their language's pattern are excluded from entry points.
- `should_filter_entry_point` — drops framework-invoked names (Python
  dunders `^__.*__$`,
  `trace_call_graph/filter_entry_points.ts:46-58`).

Both are *derived predicates over identity/payload columns*, not stored
flags — so the analogs here are Column factories, dispatched through
registry dicts exactly as the reference dispatches per language:

- holdout detection: per-key marker patterns over the text/caption
  payload (key = `lang` for documents, `fmt` for images); unknown keys
  default to NOT holdout, like the reference's unsupported-language
  fallback.
- framework-entry detection: an id-pattern filter (round ids are the
  "dunder names" of a numeric id space).

All predicates are pure column expressions (JVM-side, codegen-friendly)
with exact DuckDB-SQL twins used by the driver oracle (q39).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-language marker registry over `documents.text` — the
# detect_test_file.{language}.ts analog (one pattern per language)
HOLDOUT_TEXT_MARKERS: dict[str, str] = {
    # two-word phrases: ~5-12% of docs per lang (single common words
    # match nearly everything — a test-file detector must be selective)
    "en": "slow fast",
    "de": "hash agg",
    "es": "stream sort",
    "fr": "merge join",
    "zh": "window big",
}

# per-format marker registry over `images.caption` — same dispatch
# convention keyed by fmt instead of language
HOLDOUT_CAPTION_MARKERS: dict[str, str] = {
    "png": "zephyr",
    "jpeg": "nebula",
    "fjpg": "nebula",  # synth stand-in tag shares the jpeg marker
}

FRAMEWORK_ID_MOD = 100  # round ids ≅ dunder names: framework-invoked


def is_holdout(
    payload: Column, key: Column, markers: dict[str, str] | None = None
) -> Column:
    """True when the payload contains its key's marker pattern; False
    for keys absent from the registry (unsupported-language fallback,
    `detect_test_file.ts:21`)."""
    markers = HOLDOUT_TEXT_MARKERS if markers is None else markers
    expr = F.lit(False)
    for k, marker in sorted(markers.items()):
        expr = F.when(key == k, payload.contains(marker)).otherwise(expr)
    return expr


def is_framework_entry(id_col: Column, mod: int = FRAMEWORK_ID_MOD) -> Column:
    """Numeric-id analog of the dunder-name filter
    (`filter_entry_points.ts:46-58`): round ids are framework-invoked.
    String ids are matched on their trailing digits."""
    digits = F.regexp_extract(id_col.cast("string"), r"(\d+)$", 1)
    return (digits != "") & (digits.cast("long") % mod == 0)


def filter_entry_points(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "text",
    key_col: str = "lang",
    markers: dict[str, str] | None = None,
) -> DataFrame:
    """Drop holdout rows and framework-invoked ids — the composite the
    reference applies to detected entry points
    (`trace_call_graph/trace_call_graph.ts:102-136`)."""
    return df.where(
        ~is_holdout(F.col(payload_col), F.col(key_col), markers)
        & ~is_framework_entry(F.col(id_col))
    )


def holdout_sql(
    payload: str = "text", key: str = "lang", markers: dict[str, str] | None = None
) -> str:
    """DuckDB twin of `is_holdout` (drives the q39 oracle)."""
    markers = HOLDOUT_TEXT_MARKERS if markers is None else markers
    expr = "FALSE"
    for k, marker in sorted(markers.items()):
        m = marker.replace("'", "''")
        expr = (
            f"CASE WHEN {key} = '{k}' THEN contains({payload}, '{m}') "
            f"ELSE {expr} END"
        )
    return expr


def framework_entry_sql(id_col: str = "doc_id", mod: int = FRAMEWORK_ID_MOD) -> str:
    """DuckDB twin of `is_framework_entry`."""
    return (
        f"(regexp_extract(CAST({id_col} AS VARCHAR), '(\\d+)$', 1) <> '' AND "
        f"CAST(regexp_extract(CAST({id_col} AS VARCHAR), '(\\d+)$', 1) AS BIGINT) "
        f"% {mod} = 0)"
    )
