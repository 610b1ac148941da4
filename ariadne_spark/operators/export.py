"""WebDataset/TFRecord-style binary record shards: the hand-off format
between this engine's curation output and a training loader.

`export_record_shards` packs each shard's records — in an explicit,
data-derived order — into ONE contiguous length-prefixed blob plus an
offset index, so a loader (or `read_token_window`'s byte-level analog)
streams a shard sequentially with zero parsing ambiguity or fetches any
single record by offset without scanning. `read_record_shards` is the
exact inverse; the roundtrip is byte-identical (pytest-pinned).

Record wire format (little-endian, fixed field order):

    u32 key_len | u32 meta_len | u64 payload_len | key utf8 | meta utf8
    | payload bytes

Offsets index entry i = byte offset of record i's header in the blob.

SCALE: one shard = one group = one task (assembly is sequential within
a shard BY DEFINITION — the blob is an ordered stream), so parallelism
is across shards, exactly how loaders consume them. The caller bounds
shard size with a data-derived shard key (same contract as
`pack_sequences`); a shard's blob must fit one Arrow batch, so size
shards to the usual 100 MB–1 GB tar-shard ballpark. Cost is one hash
shuffle on the shard key, then a linear per-shard pass. The per-shard
byte total is pure integer arithmetic (16 + utf8 lengths + payload
length summed), shared verbatim with the DuckDB oracle, so the
exported layout's accounting is driver-hash-checkable even though the
blob itself is not SQL-expressible.

Reference analog: ariadne serializes each indexed file's definitions
into one ordered payload with a range index for span lookups
(`packages/core/src/index_single_file/index_single_file.ts:98`); here
the payload is a training shard and the ranges are byte offsets.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HDR_FMT = "<IIQ"  # key_len, meta_len, payload_len
_HDR_SIZE = struct.calcsize(_HDR_FMT)

SHARD_SCHEMA = (
    "shard long, n_records long, n_bytes long, "
    "offsets array<long>, keys array<string>, blob binary"
)

RECORD_SCHEMA = "shard long, rec_idx long, key string, meta string, payload binary"


def export_record_shards(
    df: DataFrame,
    shard_col: str = "shard",
    order_col: str = "pos",
    key_col: str = "key",
    payload_col: str = "payload",
    meta_col: str | None = None,
) -> DataFrame:
    """Pack records into per-shard blobs. Input rows:
    (shard_col, order_col, key_col, payload_col[, meta_col]) with
    payload binary (NULL payload/meta encode as empty). Returns one row
    per shard: (shard, n_records, n_bytes, offsets, keys, blob), records
    ordered by (order_col, key_col) — explicit tie-break, so the blob is
    bit-identical at any parallelism."""
    cols = [
        F.col(shard_col).cast("long").alias("shard"),
        F.col(order_col).cast("long").alias("__ord"),
        F.col(key_col).cast("string").alias("key"),
        F.col(payload_col).cast("binary").alias("payload"),
        (
            F.col(meta_col).cast("string") if meta_col else F.lit("")
        ).alias("meta"),
    ]
    base = df.select(*cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ord", "key"], kind="mergesort")
        # keys must be unique per shard: fetch_record resolves by key,
        # so a duplicate would make later records unreachable — refuse
        # loudly at export time rather than silently at read time. The
        # check runs on the NORMALIZED keys (NULL -> '', exactly as the
        # offsets index stores them), so a NULL key and an ''-key in
        # one shard collide here, not silently at read time.
        norm = pdf["key"].fillna("")
        dup = norm.duplicated()
        if dup.any():
            raise ValueError(
                f"export_record_shards: duplicate key "
                f"{norm[dup].iloc[0]!r} in shard "
                f"{int(pdf['shard'].iloc[0])} (keys must be unique per "
                "shard for fetch_record by-key seeks)"
            )
        parts, offsets, keys = [], [], []
        off = 0
        for key, meta, payload in zip(pdf["key"], pdf["meta"], pdf["payload"]):
            kb = ("" if key is None else key).encode("utf-8")
            mb = ("" if meta is None else meta).encode("utf-8")
            pb = bytes(payload) if payload is not None else b""
            rec = struct.pack(_HDR_FMT, len(kb), len(mb), len(pb)) + kb + mb + pb
            offsets.append(off)
            keys.append("" if key is None else key)
            parts.append(rec)
            off += len(rec)
        blob = b"".join(parts)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_records": [len(parts)],
                "n_bytes": [off],
                "offsets": [offsets],
                "keys": [keys],
                "blob": [blob],
            }
        )

    return base.groupBy("shard").applyInPandas(pack, SHARD_SCHEMA)


def read_record_shards(shards: DataFrame) -> DataFrame:
    """Inverse of `export_record_shards`: explode each blob back into
    (shard, rec_idx, key, meta, payload) rows. Streams shard by shard
    (mapInPandas), parsing is a linear walk of the length prefixes —
    the offsets index is not required to read, only to seek."""

    def unpack(it):
        for pdf in it:
            out = {"shard": [], "rec_idx": [], "key": [], "meta": [], "payload": []}
            for shard, blob in zip(pdf["shard"], pdf["blob"]):
                buf = bytes(blob)
                off = 0
                i = 0
                while off < len(buf):
                    klen, mlen, plen = struct.unpack_from(_HDR_FMT, buf, off)
                    off += _HDR_SIZE
                    key = buf[off : off + klen].decode("utf-8"); off += klen
                    meta = buf[off : off + mlen].decode("utf-8"); off += mlen
                    payload = buf[off : off + plen]; off += plen
                    out["shard"].append(int(shard))
                    out["rec_idx"].append(i)
                    out["key"].append(key)
                    out["meta"].append(meta)
                    out["payload"].append(payload)
                    i += 1
            yield pd.DataFrame(out)

    return shards.select("shard", "blob").mapInPandas(unpack, RECORD_SCHEMA)


def fetch_record(shard_row, key: str) -> tuple[str, str, bytes]:
    """Random access WITHIN one already-fetched shard row: seek the
    record by its index entry and slice it out — no scan of the blob.
    `shard_row` is a Row/dict with offsets, keys, blob (one shard is
    loader-local by design; cross-shard lookup is a normal filter on
    the shards DataFrame first). Keys are unique per shard
    (export_record_shards enforces it); a missing key raises KeyError
    naming the shard."""
    keys = list(shard_row["keys"])
    try:
        i = keys.index(key)
    except ValueError:
        raise KeyError(
            f"key {key!r} not in shard {shard_row['shard']} "
            f"({len(keys)} records)"
        ) from None
    buf = bytes(shard_row["blob"])
    off = int(shard_row["offsets"][i])
    klen, mlen, plen = struct.unpack_from(_HDR_FMT, buf, off)
    off += _HDR_SIZE
    k = buf[off : off + klen].decode("utf-8"); off += klen
    m = buf[off : off + mlen].decode("utf-8"); off += mlen
    return k, m, buf[off : off + plen]


def shard_bytes_col() -> Column:
    """Per-record byte cost of the wire format as a Column expression
    over (key, meta, payload) — 16-byte header + utf8 + payload lengths.
    Shared verbatim with `shard_bytes_sql`, so per-shard n_bytes is
    cross-engine checkable without shipping blobs to SQL."""
    return (
        F.lit(16)
        + F.octet_length(F.coalesce(F.col("key"), F.lit("")))
        + F.octet_length(F.coalesce(F.col("meta"), F.lit("")))
        + F.coalesce(F.octet_length(F.col("payload")), F.lit(0))
    ).cast("long")


def shard_bytes_sql(key_sql: str, meta_sql: str, payload_sql: str) -> str:
    """DuckDB twin of `shard_bytes_col` (same 16 + lengths formula).
    DuckDB's byte-length of VARCHAR is strlen() (octet_length only
    binds to BLOB/BIT); Spark's octet_length(string) counts the same
    UTF-8 bytes, so the two stay identical on any unicode input."""
    return (
        f"CAST(16 + strlen(COALESCE({key_sql}, '')) + "
        f"strlen(COALESCE({meta_sql}, '')) + "
        f"COALESCE(octet_length({payload_sql}), 0) AS BIGINT)"
    )
