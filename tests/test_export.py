"""Binary record-shard export: byte-exact roundtrip, deterministic
blobs at any parallelism, index-seek random access, and the byte
accounting formula's python/Spark/DuckDB 3-way parity."""

import duckdb
import pandas as pd
import pytest

from ariadne_spark.operators.export import (
    export_record_shards,
    fetch_record,
    read_record_shards,
    shard_bytes_col,
    shard_bytes_sql,
)
from pyspark.sql import functions as F


def _records(spark, n=60):
    rows = []
    for i in range(n):
        payload = bytes([i % 256, 0, 255, (i * 7) % 256]) * (i % 9 + 1)
        rows.append((i % 4, i, f"img{i:04d}", payload, f"caption {i} é"))
    return spark.createDataFrame(
        rows, "shard long, pos long, key string, payload binary, meta string"
    )


def _expected_bytes(key, meta, payload):
    return 16 + len(key.encode("utf-8")) + len(meta.encode("utf-8")) + len(payload)


def test_roundtrip_byte_exact(spark):
    df = _records(spark)
    shards = export_record_shards(df, meta_col="meta")
    back = read_record_shards(shards).toPandas()
    src = df.toPandas()
    assert len(back) == len(src)
    merged = back.merge(src, on="key", suffixes=("_got", "_src"))
    assert len(merged) == len(src)
    for _, r in merged.iterrows():
        assert bytes(r["payload_got"]) == bytes(r["payload_src"]), r["key"]
        assert r["meta_got"] == r["meta_src"]
        assert r["shard_got"] == r["shard_src"]
    # rec_idx follows (pos, key) order within each shard
    for shard, g in back.groupby("shard"):
        srcg = src[src["shard"] == shard].sort_values(["pos", "key"])
        assert list(g.sort_values("rec_idx")["key"]) == list(srcg["key"])


def test_blob_parallelism_invariant(spark):
    df = _records(spark)
    blobs = []
    for parts in (1, 7):
        shards = export_record_shards(df.repartition(parts), meta_col="meta")
        blobs.append(
            {int(r["shard"]): bytes(r["blob"]) for r in shards.collect()}
        )
    assert blobs[0] == blobs[1]
    assert len(blobs[0]) == 4


def test_index_seek_matches_scan(spark):
    df = _records(spark)
    shards = export_record_shards(df, meta_col="meta").collect()
    src = {r["key"]: r for r in df.collect()}
    probed = 0
    for row in shards:
        for key in list(row["keys"])[::5]:
            k, m, p = fetch_record(row, key)
            assert k == key
            assert m == src[key]["meta"]
            assert p == bytes(src[key]["payload"])
            probed += 1
    assert probed > 5


def test_byte_accounting_three_way(spark):
    df = _records(spark)
    # python truth
    exp = {}
    for r in df.collect():
        exp[int(r["shard"])] = exp.get(int(r["shard"]), 0) + _expected_bytes(
            r["key"], r["meta"], bytes(r["payload"])
        )
    # the packed blob agrees
    shards = export_record_shards(df, meta_col="meta")
    got = {int(r["shard"]): int(r["n_bytes"]) for r in shards.collect()}
    assert got == exp
    for r in shards.collect():
        assert len(bytes(r["blob"])) == int(r["n_bytes"])
    # the Column formula agrees (what a driver entry would hash-check)
    col = (
        df.groupBy("shard")
        .agg(F.sum(shard_bytes_col()).alias("b"))
        .collect()
    )
    assert {int(r["shard"]): int(r["b"]) for r in col} == exp
    # the DuckDB twin agrees on the same rows
    pdf = df.toPandas()
    pdf["payload"] = pdf["payload"].map(bytes)
    con = duckdb.connect()
    con.register("t", pdf)
    frag = shard_bytes_sql("key", "meta", "payload")
    o = con.execute(
        f"SELECT shard, SUM({frag}) AS b FROM t GROUP BY shard"
    ).df()
    assert {int(r["shard"]): int(r["b"]) for _, r in o.iterrows()} == exp


def test_null_and_empty_payloads(spark):
    df = spark.createDataFrame(
        [
            (0, 0, "a", None, None),
            (0, 1, "b", b"", ""),
            (0, 2, "c", b"\x00\xff", "m"),
        ],
        "shard long, pos long, key string, payload binary, meta string",
    )
    shards = export_record_shards(df, meta_col="meta")
    back = read_record_shards(shards).toPandas().sort_values("rec_idx")
    assert list(back["key"]) == ["a", "b", "c"]
    assert [bytes(p) for p in back["payload"]] == [b"", b"", b"\x00\xff"]
    assert list(back["meta"]) == ["", "", "m"]


def test_image_shard_roundtrip_preserves_payloads(spark, tmp_path):
    """The loader hand-off on REAL image payloads: export the synth
    image table into record shards, read it back, and re-derive the
    perceptual hash from the roundtripped bytes — any corruption of the
    binary payload (truncation, encoding, offset slip) flips phash."""
    from ariadne_spark.functions.phash import phash_udf
    from ariadne_spark.synth.images import write_images, IMAGES_SCHEMA

    p = str(tmp_path / "img.parquet")
    write_images(p, 96)
    imgs = spark.read.schema(IMAGES_SCHEMA).parquet(p)
    recs = imgs.select(
        (F.crc32(F.col("image_id")) % 4).alias("shard"),
        F.col("image_id").alias("key"),
        F.col("bytes").alias("payload"),
        F.concat_ws("|", "fmt", "caption").alias("meta"),
    ).withColumn("pos", F.xxhash64("key"))
    shards = export_record_shards(
        recs.select("shard", "pos", "key", "payload", "meta"), meta_col="meta"
    )
    back = read_record_shards(shards)
    rejoined = back.select(
        "key",
        F.split("meta", "\\|").getItem(0).alias("fmt"),
        "payload",
    ).withColumn("rehash", phash_udf("payload", "fmt"))
    chk = rejoined.join(
        imgs.select(F.col("image_id").alias("key"), "phash"), "key"
    )
    n_total = chk.count()
    n_bad = chk.where(F.col("rehash") != F.col("phash")).count()
    assert n_total == 96 and n_bad == 0


def test_duplicate_key_in_shard_refused(spark):
    """fetch_record resolves by key, so duplicate keys within one shard
    would make later records unreachable — export refuses loudly."""
    rows = [(0, 0, "same", b"a", ""), (0, 1, "same", b"b", "")]
    df = spark.createDataFrame(
        rows, "shard long, pos long, key string, payload binary, meta string"
    )
    from py4j.protocol import Py4JJavaError
    import pyspark.errors

    with pytest.raises(
        (Py4JJavaError, pyspark.errors.PySparkException), match="duplicate key"
    ):
        export_record_shards(df, meta_col="meta").collect()
    # same key in DIFFERENT shards is fine (keys are shard-scoped)
    rows = [(0, 0, "same", b"a", ""), (1, 1, "same", b"b", "")]
    df = spark.createDataFrame(
        rows, "shard long, pos long, key string, payload binary, meta string"
    )
    assert export_record_shards(df, meta_col="meta").count() == 2


def test_fetch_record_missing_key_names_shard(spark):
    df = _records(spark, n=8)
    row = export_record_shards(df, meta_col="meta").collect()[0]
    with pytest.raises(KeyError, match=f"shard {row['shard']}"):
        fetch_record(row, "no-such-key")


def test_null_key_and_empty_key_collision_refused(spark):
    """The offsets index normalizes NULL keys to '' — so a NULL key and
    an ''-key in one shard are the SAME key at read time. The dup check
    runs on the normalized keys and refuses at export."""
    from py4j.protocol import Py4JJavaError
    import pyspark.errors

    rows = [(0, 0, None, b"a", ""), (0, 1, "", b"b", "")]
    df = spark.createDataFrame(
        rows, "shard long, pos long, key string, payload binary, meta string"
    )
    with pytest.raises(
        (Py4JJavaError, pyspark.errors.PySparkException), match="duplicate key"
    ):
        export_record_shards(df, meta_col="meta").collect()
