"""SQL-expressible derivation of spatial image attributes from doc_id.

The driver's correctness gate runs each engine query in Spark AND its
`oracle_sql()` twin in DuckDB over the same parquet, comparing value
hashes. Spatial queries therefore derive lat/lon/phash from `doc_id`
with pure integer arithmetic (LCG chains, 31-bit modulus so no BIGINT
multiply ever overflows DuckDB), emitted in two exactly-parallel forms:

- `*_col()`  -> pyspark Column expression (JVM, whole-stage codegen)
- `*_sql()`  -> ANSI SQL string for the DuckDB oracle

Both forms are generated from the same constants below; a dedicated
test asserts byte-identical results row-by-row.

The derived distribution mirrors the synth images table
(`synth/images.py`): 80% of points cluster at 4 hotspot centers
(intentional urban skew), phash values cluster into 16 perceptual
families (doc_id % 16) with <=16 low bits of noise, so banded kNN has
real neighborhoods to find.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = 2_147_483_648  # 2^31 — LCG modulus; a*x+c < 2^62 keeps DuckDB happy
A = 1_103_515_245
LON_SPAN = 360_000_000
LAT_SPAN = 180_000_000

# hotspot centers in microdegrees ((lon+180)*1e6, (lat+90)*1e6) —
# same places as synth.images.CENTERS
CENTER_LON = [106_000_000, 182_350_000, 319_700_000, 331_200_000]
CENTER_LAT = [130_700_000, 138_850_000, 125_700_000, 56_100_000]


# --- LCG chains ------------------------------------------------------------


def _lcg_sql(x: str, c: int) -> str:
    return f"(({A} * ({x}) + {c}) % {M31})"


def _lcg_col(x: Column, c: int) -> Column:
    return (F.lit(A) * x + F.lit(c)) % F.lit(M31)


def h_sql(x: str, stream: int) -> str:
    """stream-th hash of x: `stream` chained LCG steps with distinct c."""
    out = x
    for s in range(stream):
        out = _lcg_sql(out, 12345 + 1111 * s)
    return out


def h_col(x: Column, stream: int) -> Column:
    out = x
    for s in range(stream):
        out = _lcg_col(out, 12345 + 1111 * s)
    return out


# --- lon / lat (microdegrees) ----------------------------------------------


def _case4_sql(idx: str, vals: list[int]) -> str:
    whens = " ".join(f"WHEN {i} THEN {v}" for i, v in enumerate(vals))
    return f"(CASE ({idx}) {whens} END)"


def _case4_col(idx: Column, vals: list[int]) -> Column:
    expr = F.lit(vals[-1])
    for i in range(len(vals) - 1):
        expr = F.when(idx == i, F.lit(vals[i])).otherwise(expr)
    return expr


def lon_u_sql(doc: str = "doc_id") -> str:
    h1 = h_sql(doc, 1)
    center = _case4_sql(f"({doc}) % 4", CENTER_LON)
    hot = f"(({doc}) % 5) < 4"
    hot_val = f"(({center} + ({h1} % 1000000) - 500000 + {LON_SPAN}) % {LON_SPAN})"
    uni_val = f"(({h1} * 167) % {LON_SPAN})"
    return f"(CASE WHEN {hot} THEN {hot_val} ELSE {uni_val} END)"


def lon_u_col(doc: Column) -> Column:
    h1 = h_col(doc, 1)
    center = _case4_col(doc % 4, CENTER_LON)
    hot = (doc % 5) < 4
    hot_val = (center + (h1 % F.lit(1_000_000)) - F.lit(500_000) + F.lit(LON_SPAN)) % F.lit(LON_SPAN)
    uni_val = (h1 * F.lit(167)) % F.lit(LON_SPAN)
    return F.when(hot, hot_val).otherwise(uni_val).cast("long")


def lat_u_sql(doc: str = "doc_id") -> str:
    h2 = h_sql(doc, 2)
    center = _case4_sql(f"({doc}) % 4", CENTER_LAT)
    hot = f"(({doc}) % 5) < 4"
    hot_val = f"({center} + ({h2} % 1000000) - 500000)"
    uni_val = f"(({h2} * 83) % {LAT_SPAN})"
    return f"(CASE WHEN {hot} THEN {hot_val} ELSE {uni_val} END)"


def lat_u_col(doc: Column) -> Column:
    h2 = h_col(doc, 2)
    center = _case4_col(doc % 4, CENTER_LAT)
    hot = (doc % 5) < 4
    hot_val = center + (h2 % F.lit(1_000_000)) - F.lit(500_000)
    uni_val = (h2 * F.lit(83)) % F.lit(LAT_SPAN)
    return F.when(hot, hot_val).otherwise(uni_val).cast("long")


# --- phash (62-bit, 16 perceptual families + 16 bits of noise) -------------


def phash_sql(doc: str = "doc_id") -> str:
    fam = f"(({doc}) % 16)"
    b1 = h_sql(fam, 1)
    b2 = h_sql(fam, 2)
    base = f"({b1} * {M31} + {b2})"
    noise = f"({h_sql(doc, 3)} % 65536)"
    return f"xor({base}, {noise})"


def phash_col(doc: Column) -> Column:
    fam = doc % 16
    base = h_col(fam, 1) * F.lit(M31) + h_col(fam, 2)
    noise = h_col(doc, 3) % F.lit(65536)
    return base.bitwiseXOR(noise).cast("long")


# --- bbox regions derived from nation keys ---------------------------------
# nation n -> a box around hotspot center (n % 4); depth = n // 4 with
# smaller boxes at greater depth (nested around the same center), offset
# slightly so sibling boxes of equal depth never overlap across centers.


def region_box_sql(n: str = "n_nationkey") -> dict[str, str]:
    cx = _case4_sql(f"({n}) % 4", CENTER_LON)
    cy = _case4_sql(f"({n}) % 4", CENTER_LAT)
    depth = f"(({n}) // 4)"
    half = f"(800000 // (1 + {depth}))"
    return {
        "depth": depth,
        "xmin": f"({cx} - {half})",
        "xmax": f"({cx} + {half})",
        "ymin": f"({cy} - {half})",
        "ymax": f"({cy} + {half})",
    }


def region_box_cols(n: Column) -> dict[str, Column]:
    cx = _case4_col(n % 4, CENTER_LON)
    cy = _case4_col(n % 4, CENTER_LAT)
    depth = F.floor(n / 4).cast("long")
    half = F.floor(F.lit(800_000) / (1 + depth)).cast("long")
    return {
        "depth": depth,
        "xmin": (cx - half).cast("long"),
        "xmax": (cx + half).cast("long"),
        "ymin": (cy - half).cast("long"),
        "ymax": (cy + half).cast("long"),
    }
