"""Property-based tests (hypothesis) — the analog of the reference's
`persistence.property.test.ts` round-trip invariants: codecs must be
lossless (png/wav) or bounded-error (fjpg), and grid algebra must obey
containment laws for ALL inputs, not just fixture rows."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ariadne_spark.functions import cells, codecs, media

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=30, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1))
def test_png_roundtrip_lossless(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(px)), px)


@settings(max_examples=30, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1))
def test_fjpg_bounded_error_and_psnr(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    back = codecs.decode_fjpg(codecs.encode_fjpg(px))
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 3
    # exact zeros stay zero (occupancy-preserving)
    assert not back[px == 0].any()


@settings(max_examples=30, deadline=None)
@given(n=st.integers(1, 5000), seed=st.integers(0, 2**32 - 1))
def test_wav_roundtrip_lossless(n, seed):
    s = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, n)
        .astype(np.int16)
    )
    back, rate = media.decode_wav(media.encode_wav(s))
    np.testing.assert_array_equal(back, s)
    assert rate == media.WAV_RATE


@settings(max_examples=60, deadline=None)
@given(
    lon=st.integers(0, cells.LON_SPAN - 1),
    lat=st.integers(0, cells.LAT_SPAN - 1),
    res=st.integers(1, cells.MAX_RES),
)
def test_cell_parent_containment_law(lon, lat, res):
    """parent(encode(p, res)) == encode(p, res-1) for every point/res —
    the closed-form containment that replaces the reference's geometric
    scope-tree build."""
    lon_a, lat_a = np.array([lon]), np.array([lat])
    child = cells.np_cell_encode(lon_a, lat_a, res)
    parent_direct = cells.np_cell_encode(lon_a, lat_a, res - 1)
    assert cells.np_cell_parent(child, 1)[0] == parent_direct[0]


@settings(max_examples=30, deadline=None)
@given(
    lon=st.integers(0, cells.LON_SPAN - 1),
    lat=st.integers(0, cells.LAT_SPAN - 1),
    res=st.integers(0, cells.MAX_RES),
    steps=st.integers(1, 6),
)
def test_cell_multistep_parent(lon, lat, res, steps):
    steps = min(steps, res)
    if steps == 0:
        return
    lon_a, lat_a = np.array([lon]), np.array([lat])
    child = cells.np_cell_encode(lon_a, lat_a, res)
    expect = cells.np_cell_encode(lon_a, lat_a, res - steps)
    assert cells.np_cell_parent(child, steps)[0] == expect[0]


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_frames=st.integers(1, 12))
def test_fvid_seek_equals_sequential(seed, n_frames):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (10, 12, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    blob = media.encode_fvid(frames)
    for i in range(n_frames):
        np.testing.assert_array_equal(media.decode_fvid_frame(blob, i), frames[i])


@settings(max_examples=30, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_lossless(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


_mask = st.integers(0, (1 << 26) - 1)
_flips = st.lists(st.integers(0, 25), min_size=0, max_size=4, unique=True)


def _bands_of(m):
    from ariadne_spark.operators.dedup import BANDS

    return [(m >> s) & ((1 << w) - 1) for s, w in BANDS]


@settings(max_examples=300, deadline=None)
@given(ma=_mask, flips=_flips)
def test_band_pigeonhole_recall_law(ma, flips):
    """For ALL mask pairs: if floor(1000*|A∩B|/|A∪B|) >= 900 then the
    pair shares at least one of the 3 disjoint bands — the exactness
    guarantee of operators/dedup.py, independent of any fixture."""
    mb = ma
    for b in flips:
        mb ^= 1 << b
    union = bin(ma | mb).count("1")
    if union == 0:
        return
    j1000 = (bin(ma & mb).count("1") * 1000) // union
    if j1000 >= 900:
        assert any(x == y for x, y in zip(_bands_of(ma), _bands_of(mb)))


@settings(max_examples=300, deadline=None)
@given(ma=_mask, flips=_flips)
def test_first_match_band_counts_pair_once(ma, flips):
    """The first-match-band dedup predicate admits a colliding pair at
    EXACTLY one band (the earliest equal one)."""
    mb = ma
    for b in flips:
        mb ^= 1 << b
    eq = [x == y for x, y in zip(_bands_of(ma), _bands_of(mb))]
    admitted = sum(
        1 for i, e in enumerate(eq) if e and all(not eq[j] for j in range(i))
    )
    assert admitted == (1 if any(eq) else 0)


WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=5)


@settings(max_examples=60, deadline=None)
@given(st.lists(WORD, min_size=1, max_size=12), st.integers(2, 5))
def test_sql_word_ngrams_matches_python_for_all_inputs(words, n):
    """Property: the DuckDB n-gram fragment (q46/q47's oracle side)
    equals the pure-python definition for EVERY word list and n —
    including the sub-n short-text guard. (The Spark twin is pinned
    against the same python oracle in test_curation.py; this closes
    the triangle without a JVM per example.)"""
    import duckdb

    from ariadne_spark.operators.curation import sql_word_ngrams

    text = " ".join(words)
    want = [
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    ]
    got = duckdb.execute(
        f"SELECT {sql_word_ngrams('t', n)} FROM (SELECT ? AS t)", [text]
    ).fetchone()[0]
    assert got == want


# ---------------------------------------------------------------------------
# Cross-engine string-fingerprint bridge (everything sketch/Bloom/
# sampling hangs off rolling_fp + mix): DuckDB == python for ALL
# ASCII inputs, not just fixture rows. Spark == DuckDB on the same
# expressions is pinned by the oracle-checked entries (q25, q42, q46).
# ---------------------------------------------------------------------------

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=64
)


@settings(max_examples=60, deadline=None)
@given(s=ascii_text)
def test_rolling_fp_duckdb_equals_python(s):
    import duckdb

    from ariadne_spark.functions.sketch import rolling_fp_py, rolling_fp_sql

    got = duckdb.connect().execute(
        f"SELECT {rolling_fp_sql('s')} FROM (SELECT ? AS s)", [s]
    ).fetchone()[0]
    assert got == rolling_fp_py(s), repr(s)


@settings(max_examples=60, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**62 - 1))
def test_mix_duckdb_equals_python(x):
    import duckdb

    from ariadne_spark.functions.sketch import mix_py, mix_sql

    got = duckdb.connect().execute(f"SELECT {mix_sql(str(x))}").fetchone()[0]
    assert got == mix_py(x)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.lists(WORD, min_size=1, max_size=10), min_size=1, max_size=5),
    st.integers(2, 4),
)
def test_strip_dup_spans_sql_matches_python_for_all_corpora(doc_words, n):
    """Property: the DuckDB duplicate-span-removal twin (q47's oracle
    side) equals the pure-python definition for EVERY small corpus and
    n — covered-position union, order preservation, sub-n docs, fully-
    shared docs. Small alphabet + short words force heavy cross-doc
    gram collisions, the regime where interval union and double-count
    bugs live. (Spark == DuckDB on real data is pinned by the
    oracle-checked q47 entry and test_curation's 3-way case.)"""
    import duckdb

    from ariadne_spark.operators.curation import strip_dup_spans_sql

    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    wins = {
        d: [(i + 1, " ".join(t.split(" ")[i : i + n]))
            for i in range(max(0, len(t.split(" ")) - n + 1))]
        for d, t in docs
    }
    gram_docs: dict[str, set[int]] = {}
    for d, ws in wins.items():
        for _i, g in ws:
            gram_docs.setdefault(g, set()).add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = {}
    for d, t in docs:
        toks = t.split(" ")
        cov: set[int] = set()
        for i, g in wins[d]:
            if g in dup:
                cov.update(range(i, i + n))
        kept = [w for p, w in enumerate(toks, 1) if p not in cov]
        want[d] = (len(toks), len(kept), " ".join(kept))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}')" for d, t in docs)
        + ") AS v(doc_id, text)"
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(strip_dup_spans_sql(n=n)).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# round-5 codecs: the compression layers must roundtrip ALL inputs
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 8000), runlen=st.integers(1, 200),
       seed=st.integers(0, 2**32 - 1))
def test_packbits_roundtrip_all_inputs(n, runlen, seed):
    from ariadne_spark.functions.tiff import _packbits_decode, _packbits_encode

    rng = np.random.default_rng(seed)
    # mix literals with runs of hypothesis-chosen length (the 128-byte
    # literal/replicate boundaries are the bug surface)
    data = bytes(
        np.repeat(rng.integers(0, 256, max(n // max(runlen, 1), 1)),
                  runlen)[:n].astype(np.uint8)
    )
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


@settings(max_examples=30, deadline=None)
@given(n=st.integers(1, 20000), alphabet=st.integers(1, 256),
       seed=st.integers(0, 2**32 - 1))
def test_tiff_lzw_roundtrip_all_inputs(n, alphabet, seed):
    from ariadne_spark.functions.tiff import _tlzw_decode, _tlzw_encode

    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, alphabet, n, dtype=np.uint8))
    assert _tlzw_decode(_tlzw_encode(data), n) == data


@settings(max_examples=30, deadline=None)
@given(n=st.integers(1, 20000), ncodes=st.integers(1, 256),
       mcs=st.integers(2, 8), seed=st.integers(0, 2**32 - 1))
def test_gif_lzw_roundtrip_all_inputs(n, ncodes, mcs, seed):
    from ariadne_spark.functions.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(seed)
    ncodes = min(ncodes, 1 << mcs)  # symbols must fit the code space
    data = rng.integers(0, ncodes, n).astype(np.int64)
    out = _lzw_decode(_lzw_encode(data, mcs), mcs, n)
    np.testing.assert_array_equal(out, data.astype(np.uint8))


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, ncol=st.integers(1, 256), seed=st.integers(0, 2**32 - 1))
def test_gif_container_roundtrip_all_palettes(w, h, ncol, seed):
    from ariadne_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), np.uint8)
    px = pal[rng.integers(0, ncol, (h, w))]
    np.testing.assert_array_equal(decode_gif(encode_gif(px)), px)


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1),
       compression=st.sampled_from(["none", "packbits", "lzw"]))
def test_tiff_container_roundtrip_all_inputs(w, h, seed, compression):
    from ariadne_spark.functions.tiff import decode_tiff, encode_tiff

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(px, compression)), px
    )
