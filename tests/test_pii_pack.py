"""PII detection/redaction and sequence-packing tests.

PII: three-way agreement (python `re` oracle, Spark/Java regex, DuckDB
RE2) on adversarial edge strings the sf0.01 corpus can't hit — the
cross-engine contract claims the patterns live in the subset where all
engines match identically, so the test's job is to attack that claim.
Packing: pure-python concat-then-chunk oracle, parallelism invariance,
and window-boundary edge cases. Full-query parity at sf0.01 is covered
by tests/test_entry_contract.py (q48/q49)."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.curation import pack_sequences
from ariadne_spark.operators.pii import (
    PII_PATTERNS,
    pii_counts,
    pii_stats,
    redact,
)

EDGE_TEXTS = [
    "",
    "plain text no pii at all",
    "a@b.co",  # minimal email
    "x a@b.c y",  # 1-char TLD: no match ({2,})
    "john.doe+spam@sub.domain.example.com trailing",
    "dot-end a@b.com. next",  # trailing dot stays outside the match
    "two a@b.com c@d.org emails",
    "1.2.3.4",
    "prefix 999.999.999.999 suffix",  # octet range not validated, by design
    "run-on 1.2.3.4.5 chain",  # greedy leftmost: one match
    "digitglue 1555-123-4567 end",  # no \b inside digits: no phone
    "555-123-4567",  # exact-bounds phone
    "tel 555-123-4567, ip 10.0.0.1; mail u@例.com x@y.io",  # non-ASCII domain
    "v4-ish 1.2.3 and 1.2.3. and .1.2.3.4",
    "email@at-end.com",
    "adjacent a@b.com10.0.0.1",  # email eats the glued digits' start
]


def py_count(text: str, pat: str) -> int:
    return len(re.findall(pat, text))


def py_redact(text: str) -> str:
    for _, pat, token in PII_PATTERNS:
        text = re.sub(pat, token, text)
    return text


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "id long, t string"
    )


def test_pii_counts_match_python_oracle(spark, edge_df):
    counts = pii_counts(F.col("t"))
    rows = edge_df.select(
        "id", "t", *[c.alias(k) for k, c in counts.items()]
    ).collect()
    assert len(rows) == len(EDGE_TEXTS)
    for r in rows:
        for kind, pat, _ in PII_PATTERNS:
            assert r[kind] == py_count(r["t"], pat), (kind, r["t"])


def test_pii_redact_matches_python_and_is_complete(spark, edge_df):
    rows = edge_df.select("id", "t", redact(F.col("t")).alias("red")).collect()
    for r in rows:
        assert r["red"] == py_redact(r["t"]), r["t"]
        for kind, pat, _ in PII_PATTERNS:
            assert py_count(r["red"], pat) == 0, (kind, r["red"])


def test_pii_duckdb_re2_parity():
    """DuckDB's RE2 must count and redact byte-identically to python's
    backtracking engine on every edge string — the property the oracle
    SQL leans on."""
    con = duckdb.connect()
    for t in EDGE_TEXTS:
        red = t
        for kind, pat, token in PII_PATTERNS:
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?, 0))", [t, pat]
            ).fetchone()[0]
            assert n == py_count(t, pat), (kind, t)
            red = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [red, pat, token]
            ).fetchone()[0]
        assert red == py_redact(t), t


def test_pii_stats_aggregate(spark, edge_df):
    out = pii_stats(
        edge_df.select(F.lit("g").alias("g"), "t"), F.col("t"), ["g"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == len(EDGE_TEXTS)
    assert r["residual_matches"] == 0
    exp = {
        f"n_{kind}": sum(py_count(t, pat) for t in EDGE_TEXTS)
        for kind, pat, _ in PII_PATTERNS
    }
    for k, v in exp.items():
        assert r[k] == v, k
    assert r["docs_with_pii"] == sum(
        1
        for t in EDGE_TEXTS
        if any(py_count(t, pat) for _, pat, _ in PII_PATTERNS)
    )
    assert r["redacted_delta_chars"] == sum(
        len(t) - len(py_redact(t)) for t in EDGE_TEXTS
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

PACK_ROWS = [
    # (shard, doc_id, tokens) — includes: doc exactly filling a window,
    # doc spanning 3+ windows, 1-token docs straddling a boundary
    (0, 1, 8),
    (0, 2, 8),  # ends exactly at 16 == 2*ctx for ctx=8
    (0, 3, 1),  # starts a fresh window
    (0, 4, 30),  # spans windows 2..6 at ctx=8
    (1, 5, 3),
    (1, 6, 5),  # fills window 0 exactly with doc 5
    (1, 7, 9),  # spans two
    (2, 8, 1),
]
CTX = 8


def py_pack(rows, ctx):
    out = {}
    by_shard = {}
    for s, d, t in sorted(rows, key=lambda r: (r[0], r[1])):
        start = by_shard.get(s, 0)
        out[d] = (s, t, start, start // ctx, (start + t - 1) // ctx)
        by_shard[s] = start + t
    return out


@pytest.mark.parametrize("nparts", [1, 7])
def test_pack_sequences_matches_python_oracle(spark, nparts):
    df = spark.createDataFrame(
        PACK_ROWS, "shard long, doc_id long, tokens long"
    ).repartition(nparts)
    got = pack_sequences(df, F.col("tokens"), CTX, ["shard"], "doc_id").collect()
    exp = py_pack(PACK_ROWS, CTX)
    assert len(got) == len(PACK_ROWS)
    for r in got:
        s, t, start, fb, lb = exp[r["doc_id"]]
        assert (r["shard"], r["tokens"], r["start_tok"]) == (s, t, start)
        assert (r["first_bin"], r["last_bin"]) == (fb, lb)
        assert r["n_bins"] == lb - fb + 1


@pytest.mark.parametrize("nparts", [1, 5])
def test_pack_greedy_matches_python_oracle(spark, nparts):
    """Non-splitting packing: greedy next-fit per shard in doc order —
    no doc crosses a bin, over-ctx docs get their own bin, and the
    assignment is parallelism-invariant."""
    from ariadne_spark.operators.curation import pack_greedy

    rows = PACK_ROWS + [(2, 9, 30)]  # an over-ctx doc (ctx=8)
    df = spark.createDataFrame(
        rows, "shard long, doc_id long, tokens long"
    ).repartition(nparts)
    got = {
        r["doc_id"]: (r["shard"], r["tokens"], r["bin_id"], r["bin_fill"])
        for r in pack_greedy(df, F.col("tokens"), CTX, ["shard"], "doc_id").collect()
    }
    # python oracle
    exp = {}
    by_shard = {}
    for s, d, t in sorted(rows, key=lambda r: (r[0], r[1])):
        b, fill = by_shard.get(s, (0, 0))
        if fill > 0 and fill + t > CTX:
            b, fill = b + 1, 0
        fill += t
        by_shard[s] = (b, fill)
        exp[d] = (s, t, b, fill)
    assert got == exp
    # no bin holds two docs whose sum exceeds ctx (unless a single
    # over-ctx doc owns it)
    from collections import defaultdict

    bins = defaultdict(list)
    for d, (s, t, b, _f) in got.items():
        bins[(s, b)].append(t)
    for members in bins.values():
        assert sum(members) <= CTX or len(members) == 1
    # the over-ctx doc sits alone in its bin
    s9 = got[9]
    assert [t for (s, t, b, _f) in got.values() if (s, b) == (s9[0], s9[2])] == [30]


def test_temperature_sample_matches_python_oracle(spark):
    """Kept set == the integer-exact python definition; kept counts
    track sqrt(c_s) (flattening), smallest domain keeps everything."""
    from ariadne_spark.operators.curation import temperature_sample

    rows = []
    sizes = {"big": 400, "mid": 100, "tiny": 4}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src, (i * 2_654_435_761) % 2_147_483_647))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, fp long")
    got = {
        r["doc_id"]: (r["source"], r["fpb"], r["c_group"])
        for r in temperature_sample(df, "source", F.col("fp")).collect()
    }
    c_min = min(sizes.values())
    exp = {
        d: (s, fp % 1000, sizes[s])
        for d, s, fp in rows
        if (fp % 1000) ** 2 * sizes[s] < 1_000_000 * c_min
    }
    assert got == exp
    # the smallest domain keeps every row; bigger domains flatten
    kept = {s: sum(1 for v in got.values() if v[0] == s) for s in sizes}
    assert kept["tiny"] == sizes["tiny"]
    assert kept["big"] < sizes["big"]
    # kept ~ 1000-granular floor of sqrt(c_min*c_s): within quantization
    for s, n in sizes.items():
        import math

        rate = min(1.0, math.floor(1000 * math.sqrt(c_min / n)) / 1000)
        # fp stream is a Weyl sequence — allow generous slack
        assert abs(kept[s] - rate * n) <= max(5, 0.25 * n), (s, kept[s])


def test_temperature_sample_parallelism_invariant(spark):
    from ariadne_spark.operators.curation import temperature_sample

    rows = [(i, "s" + str(i % 3), (i * 48271) % 2_147_483_647) for i in range(300)]
    df1 = spark.createDataFrame(
        rows, "doc_id long, source string, fp long"
    ).repartition(1)
    df7 = spark.createDataFrame(
        rows, "doc_id long, source string, fp long"
    ).repartition(7)
    k1 = sorted(
        r["doc_id"] for r in temperature_sample(df1, "source", F.col("fp")).collect()
    )
    k7 = sorted(
        r["doc_id"] for r in temperature_sample(df7, "source", F.col("fp")).collect()
    )
    assert k1 == k7 and len(k1) > 0


def test_pack_sequences_stream_is_gapless(spark):
    """Within a shard, each doc starts exactly where the previous one
    ended — the concat-then-chunk invariant."""
    df = spark.createDataFrame(PACK_ROWS, "shard long, doc_id long, tokens long")
    rows = sorted(
        pack_sequences(df, F.col("tokens"), CTX, ["shard"], "doc_id").collect(),
        key=lambda r: (r["shard"], r["doc_id"]),
    )
    pos = {}
    for r in rows:
        assert r["start_tok"] == pos.get(r["shard"], 0)
        pos[r["shard"]] = r["start_tok"] + r["tokens"]


def test_pack_boundaries_tile_windows_exactly(spark):
    """Fragment index invariants: per (shard, bin) the fragments tile
    [0, ctx) contiguously with no gaps/overlaps (trailing bin tiles up
    to the stream end); python oracle equality; repartition-invariant."""
    from ariadne_spark.operators.curation import pack_boundaries

    ctx = 7
    rows = [(i % 2, i, (i * 2654435761 % 9) + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "shard long, doc_id long, w long")

    got = sorted(
        (r["shard"], r["bin"], r["doc_id"], r["start_in_bin"], r["frag_len"])
        for r in pack_boundaries(df, F.col("w"), ctx, ["shard"], "doc_id").collect()
    )

    # python oracle: concat docs per shard in doc_id order, slice
    want = []
    streams = {}
    for s, d, w in sorted(rows, key=lambda r: (r[0], r[1])):
        start = streams.get(s, 0)
        streams[s] = start + w
        b0, b1 = start // ctx, (start + w - 1) // ctx
        for b in range(b0, b1 + 1):
            fs, fe = max(start, b * ctx), min(start + w, (b + 1) * ctx)
            want.append((s, b, d, fs - b * ctx, fe - fs))
    assert got == sorted(want)

    # tiling: within each (shard, bin), fragments cover [0, X) exactly
    from collections import defaultdict
    per_bin = defaultdict(list)
    for s, b, _d, st, ln in got:
        per_bin[(s, b)].append((st, ln))
    for (s, b), frags in per_bin.items():
        frags.sort()
        pos = 0
        for st, ln in frags:
            assert st == pos and ln > 0, (s, b, frags)
            pos = st + ln
        full = streams[s] // ctx  # bins strictly before this are full
        assert pos == (ctx if b < full else streams[s] - full * ctx)

    got2 = sorted(
        (r["shard"], r["bin"], r["doc_id"], r["start_in_bin"], r["frag_len"])
        for r in pack_boundaries(
            df.repartition(9), F.col("w"), ctx, ["shard"], "doc_id"
        ).collect()
    )
    assert got2 == got


# ---------------------------------------------------------------------------
# pack_multimodal — interleaved image-text packing
# ---------------------------------------------------------------------------


def _mm_oracle(rows, ctx):
    """Pure-python twin of pack_multimodal's per-shard loop."""
    out = []
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r[0], []).append(r)
    for shard in by_shard:
        segs = sorted(by_shard[shard], key=lambda r: (r[1], r[2]))
        b, pos = 0, 0
        for _, doc, seq, kind, t in segs:
            if kind == "image":
                if pos + t > ctx:
                    out.append((shard, b, pos, None, None, "pad", 0, ctx - pos))
                    b, pos = b + 1, 0
                out.append((shard, b, pos, doc, seq, "image", 0, t))
                pos += t
                if pos == ctx:
                    b, pos = b + 1, 0
            else:
                lo = 0
                while lo < t:
                    take = min(t - lo, ctx - pos)
                    out.append((shard, b, pos, doc, seq, "text", lo, lo + take))
                    pos += take
                    lo += take
                    if pos == ctx:
                        b, pos = b + 1, 0
        if pos > 0:
            out.append((shard, b, pos, None, None, "pad", 0, ctx - pos))
    return set(out)


def _mm_rows():
    # 2 shards; docs interleave text and images; adversarial sizes:
    # text spanning multiple windows, image exactly filling a window,
    # image forcing a pad, zero-token text segment (dropped)
    return [
        # (shard, doc, seq, kind, n_tokens)
        (0, 1, 0, "text", 5),
        (0, 1, 1, "image", 4),
        (0, 1, 2, "text", 0),
        (0, 1, 3, "text", 13),   # spans windows
        (0, 2, 0, "image", 8),   # exactly one window
        (0, 2, 1, "text", 3),
        (1, 3, 0, "image", 7),
        (1, 3, 1, "image", 7),   # forces a pad (7+7 > 8)
        (1, 4, 0, "text", 2),
    ]


def test_pack_multimodal_matches_oracle_and_tiles_windows(spark):
    from ariadne_spark.operators.curation import pack_multimodal

    ctx = 8
    rows = _mm_rows()
    df = spark.createDataFrame(
        rows, "shard long, doc_id long, seq long, kind string, n_tokens long"
    )
    got_rows = pack_multimodal(df, ctx).collect()
    got = {
        (r["shard"], r["bin"], r["win_pos"], r["doc_id"], r["seq"],
         r["kind"], r["frag_lo"], r["frag_hi"])
        for r in got_rows
    }
    assert got == _mm_oracle(rows, ctx)

    # every (shard, bin) tiles [0, ctx) exactly — pads included
    by_win = {}
    for r in got_rows:
        by_win.setdefault((r["shard"], r["bin"]), []).append(r)
    for (shard, b), frs in by_win.items():
        frs.sort(key=lambda r: r["win_pos"])
        pos = 0
        for fr in frs:
            assert fr["win_pos"] == pos, (shard, b)
            pos += fr["frag_hi"] - fr["frag_lo"]
        assert pos == ctx, (shard, b)

    # image fragments are never split: each covers its full patch count
    img_in = {(r[1], r[2]): r[4] for r in rows if r[3] == "image"}
    img_out = [r for r in got_rows if r["kind"] == "image"]
    assert len(img_out) == len(img_in)
    for r in img_out:
        assert (r["frag_lo"], r["frag_hi"]) == (0, img_in[(r["doc_id"], r["seq"])])

    # zero-token text segments vanish
    assert not [r for r in got_rows if r["kind"] == "text" and r["frag_lo"] == r["frag_hi"]]


def test_pack_multimodal_parallelism_invariant(spark):
    from ariadne_spark.operators.curation import pack_multimodal

    df = spark.createDataFrame(
        _mm_rows(), "shard long, doc_id long, seq long, kind string, n_tokens long"
    )

    def key(r):
        return (r["shard"], r["bin"], r["win_pos"], r["doc_id"], r["seq"],
                r["kind"], r["frag_lo"], r["frag_hi"])

    a = sorted(key(r) for r in pack_multimodal(df.repartition(1), 8).collect())
    b = sorted(key(r) for r in pack_multimodal(df.repartition(7), 8).collect())
    assert a == b


def test_pack_multimodal_oversized_image_raises(spark):
    from ariadne_spark.operators.curation import pack_multimodal

    df = spark.createDataFrame(
        [(0, 1, 0, "image", 9)],
        "shard long, doc_id long, seq long, kind string, n_tokens long",
    )
    with pytest.raises(Exception, match="cannot split"):
        pack_multimodal(df, 8).collect()


def test_pack_multimodal_rejects_null_and_negative_segments(spark):
    """NULL doc/seq/n_tokens used to crash with an opaque int(NaN)
    TypeError and negative n_tokens was a silent no-op (while-loop
    never entered — the segment vanished without a trace); both must
    fail loudly, naming the offending segment."""
    from ariadne_spark.operators.curation import pack_multimodal

    schema = "shard long, doc_id long, seq long, kind string, n_tokens long"
    null_tok = spark.createDataFrame([(0, 1, 0, "text", None)], schema)
    with pytest.raises(Exception, match="NULL doc/seq/n_tokens"):
        pack_multimodal(null_tok, 8).collect()
    null_doc = spark.createDataFrame([(0, None, 0, "text", 3)], schema)
    with pytest.raises(Exception, match="NULL doc/seq/n_tokens"):
        pack_multimodal(null_doc, 8).collect()
    neg = spark.createDataFrame([(0, 1, 0, "text", -4)], schema)
    with pytest.raises(Exception, match="negative"):
        pack_multimodal(neg, 8).collect()
