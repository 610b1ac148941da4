"""Curation-operator tests: decontamination and repetition stats vs
pure-python oracles (edge cases the driver's sf0.01 corpus can't hit),
plus the n-gram builder's Spark/DuckDB/python three-way agreement.
Cross-engine parity of the full q46/q47 queries is covered by
tests/test_entry_contract.py."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.curation import (
    decontaminate,
    repetition_stats,
    sql_word_ngrams,
    word_ngrams,
)

DOCS = [
    # (doc_id, text) — includes: shorter-than-n, exactly-n, heavy
    # repetition, and verbatim-overlap pairs
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "one two"),
    (2, "a b c d"),  # exactly 4 words -> exactly one 4-gram
    (3, "spam spam spam spam spam spam spam spam"),
    (4, "the quick brown fox jumps over a sleeping cat"),
    (5, "totally unrelated words appear in this document here"),
    (6, "x"),  # single word: no bigrams (n_bg = 0 path)
]


def py_ngrams(text: str, n: int) -> list[str]:
    ws = text.split(" ")
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("n", [2, 4])
def test_ngrams_three_way(spark, docs_df, n):
    got = {
        r["doc_id"]: r["g"]
        for r in docs_df.select("doc_id", word_ngrams("text", n).alias("g")).collect()
    }
    duck = duckdb.connect()
    sql = {
        did: g
        for did, g in duck.execute(
            f"SELECT doc_id, {sql_word_ngrams('text', n)} "
            "FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
            + ") AS t(doc_id, text)"
        ).fetchall()
    }
    for did, text in DOCS:
        want = py_ngrams(text, n)
        assert got[did] == want, f"spark ngrams doc {did}"
        assert sql[did] == want, f"duckdb ngrams doc {did}"


def test_decontaminate_python_oracle(spark, docs_df):
    bench = docs_df.where(F.col("doc_id") == 0)
    corpus = docs_df.where(F.col("doc_id") != 0)
    got = {
        r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=4, min_hits=2).collect()
    }
    bench_set = set(py_ngrams(DOCS[0][1], 4))
    for did, text in DOCS[1:]:
        hits = len(set(py_ngrams(text, 4)) & bench_set)
        assert got[did] == (hits, int(hits >= 2)), f"doc {did}"
    # doc 4 shares 'the quick brown fox'... 4-gram prefix with doc 0
    assert got[4][0] >= 1
    # sub-n docs are clean by construction, and present in the output
    assert got[1] == (0, 0) and got[6] == (0, 0)


def test_repetition_stats_python_oracle(spark, docs_df):
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["top_word_permille"],
            r["dup_bigram_permille"],
            r["repetitive"],
        )
        for r in repetition_stats(docs_df).collect()
    }
    for did, text in DOCS:
        ws = text.split(" ")
        top = max(ws.count(w) for w in set(ws))
        bgs = py_ngrams(text, 2)
        top_pm = top * 1000 // len(ws)
        dup_pm = (len(bgs) - len(set(bgs))) * 1000 // len(bgs) if bgs else 0
        want = (len(ws), top_pm, dup_pm, int(top_pm >= 150 or dup_pm >= 100))
        assert got[did] == want, f"doc {did}: {got[did]} != {want}"
    # the spam doc is maximally repetitive; the all-distinct doc is not
    assert got[3][3] == 1 and got[5][3] == 0
    # single-word doc survives the n_bg=0 guard
    assert got[6] == (1, 1000, 0, 1)


def test_decontaminate_output_is_corpus_sized(spark, docs_df):
    bench = docs_df.where(F.col("doc_id") % 3 == 0)
    corpus = docs_df.where(F.col("doc_id") % 3 != 0)
    out = decontaminate(corpus, bench, n=2, min_hits=1)
    assert out.count() == corpus.count()
    assert out.select("doc_id").distinct().count() == corpus.count()


def test_vocab_and_oov_duckdb_parity(spark):
    """build_vocab/oov_stats vs their DuckDB twins on the driver's
    sf0.01 documents table — byte-identical rows (the same cross-engine
    contract as the oracle-checked queries)."""
    import pandas as pd

    from ariadne_spark.operators.curation import (
        build_vocab,
        oov_sql,
        oov_stats,
        vocab_sql,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    duck = duckdb.connect()
    duck.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

    def cmp(sdf, sql):
        a = sdf.toPandas()
        b = duck.sql(sql).df()
        cols = sorted(a.columns)
        assert cols == sorted(b.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    vocab = build_vocab(docs, size=50)
    cmp(vocab, vocab_sql(50))
    cmp(oov_stats(docs, vocab), oov_sql(50))


def test_oov_python_oracle(spark, docs_df):
    """Edge cases on the tiny fixture: a 2-word vocab, docs fully OOV,
    permille floor division."""
    from ariadne_spark.operators.curation import build_vocab, oov_stats

    vocab = build_vocab(docs_df, size=2)
    vwords = {r["word"] for r in vocab.collect()}
    # python oracle for the same top-2 (count desc, word asc)
    from collections import Counter

    c = Counter(w for _i, t in DOCS for w in t.split(" "))
    want_v = {w for w, _n in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:2]}
    assert vwords == want_v
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_permille"])
           for r in oov_stats(docs_df, vocab).collect()}
    for did, text in DOCS:
        ws = text.split(" ")
        oov = sum(1 for w in ws if w not in want_v)
        assert got[did] == (len(ws), oov, oov * 1000 // len(ws)), f"doc {did}"


def test_curate_multimodal_funnel(spark):
    """The one-call composition: every doc gets exactly one disposition,
    each stage's drops match running that stage independently on the
    previous stage's survivors, and kept == reason='kept'."""
    from ariadne_spark.operators.curation import curate_multimodal
    from ariadne_spark.operators.semdedup import semdedup

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = curate_multimodal(docs, emb).persist()
    rows = out.collect()
    assert len(rows) == docs.count()  # total disposition coverage
    by_reason = {}
    for r in rows:
        by_reason.setdefault(r["reason"], set()).add(r["doc_id"])
        assert r["kept"] == int(r["reason"] == "kept")
    # mutual exclusivity is structural (one row per doc); check stage 1
    # against an independent computation
    import duckdb

    duck = duckdb.connect()
    duck.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want_exact = {
        r[0]
        for r in duck.sql(
            "SELECT doc_id FROM documents d WHERE doc_id <> ("
            "SELECT min(doc_id) FROM documents x WHERE md5(x.text) = md5(d.text))"
        ).fetchall()
    }
    assert by_reason.get("exact_dup", set()) == want_exact
    # stage 4 against independent semdedup over the stage-3 survivors
    surv = by_reason.get("kept", set()) | by_reason.get("sem_dup", set())
    emb_surv = emb.where(F.col("vec_id").isin([int(i) for i in surv]))
    sem = {
        r["vec_id"]
        for r in semdedup(emb_surv.select("vec_id", "embedding")).collect()
        if r["keep"] == 0
    }
    assert by_reason.get("sem_dup", set()) == sem
    assert rows and len(by_reason.get("kept", set())) > 0


# ---------------------------------------------------------------------------
# curate_images — the image-axis funnel
# ---------------------------------------------------------------------------


def test_curate_images_funnel(spark, images_df):
    """One disposition per image; constructed rows hit each metadata
    gate; exact/phash dup stages match independent recomputation over
    the same survivors (first-failing-wins precedence throughout)."""
    from pyspark.sql import functions as F

    from ariadne_spark.operators.curation import curate_images
    from ariadne_spark.operators.dedup import dup_clusters
    from ariadne_spark.operators.knn import knn_edges

    cols = ["image_id", "bytes", "w", "h", "fmt", "lon_u", "lat_u", "phash"]
    base = images_df.select(*cols).orderBy("image_id").limit(400)
    first = base.orderBy("image_id").first()

    def variant(img_id, **over):
        row = {c: first[c] for c in cols}
        row["image_id"] = img_id
        row.update(over)
        return spark.createDataFrame([tuple(row[c] for c in cols)], base.schema)

    adversarial = (
        # webp: unregistered (tiff joined the codec registry in round 5)
        variant("zz_badfmt", fmt="webp")
        .unionByName(variant("zz_nullbytes", bytes=None))
        .unionByName(variant("zz_tiny", w=2, h=2))
        .unionByName(variant("zz_wide", w=400, h=20))  # 8000 px, 20:1 aspect
        .unionByName(variant("zz_exactdup"))  # byte-identical to `first`
        # NULL metadata must fail CLOSED (bad_format), never fall
        # through every NULL-skipping gate to 'kept' — regression for
        # the fail-open bug (NULL fmt on a byte-duplicate shipped both
        # copies)
        .unionByName(variant("zz_nullfmt", fmt=None))
        .unionByName(variant("zz_nullw", w=None))
        # precedence: bad fmt AND tiny -> bad_format wins
        .unionByName(variant("zz_both", fmt="webp", w=1, h=1))
    )
    inp = base.unionByName(adversarial)

    out = {r["image_id"]: r for r in curate_images(inp).collect()}
    assert len(out) == inp.count()  # total coverage, one row per image
    for r in out.values():
        assert r["kept"] == int(r["reason"] == "kept")

    assert out["zz_badfmt"]["reason"] == "bad_format"
    assert out["zz_nullbytes"]["reason"] == "bad_format"
    assert out["zz_tiny"]["reason"] == "too_small"
    assert out["zz_wide"]["reason"] == "bad_aspect"
    assert out["zz_both"]["reason"] == "bad_format"
    assert out["zz_nullfmt"]["reason"] == "bad_format"
    assert out["zz_nullw"]["reason"] == "bad_format"
    assert out["zz_exactdup"]["reason"] == "exact_dup"
    assert out[first["image_id"]]["reason"] != "exact_dup"  # canonical survives

    # phash stage == independent knn+clusters over the same survivors
    meta_ok = {
        i
        for i, r in out.items()
        if r["reason"] not in ("bad_format", "too_small", "bad_aspect", "exact_dup")
    }
    surv = inp.where(F.col("image_id").isin(list(meta_ok)))
    pairs = knn_edges(surv, k=5, max_hamming=6).select(
        "src_image_id", "dst_image_id"
    )
    want_phash = {
        r["doc_id"]
        for r in dup_clusters(pairs, "src_image_id", "dst_image_id").collect()
        if r["doc_id"] != r["cluster_id"]
    }
    got_phash = {i for i, r in out.items() if r["reason"] == "phash_dup"}
    assert got_phash == want_phash
    # the synth corpus plants ~5% near-dups, so the stage must fire
    assert len(got_phash) > 0
    assert sum(1 for r in out.values() if r["kept"]) > 0


def test_dup_ngram_coverage_matches_python_oracle(spark, docs_df):
    """Cross-doc semantics: a gram repeated INSIDE one doc only is not
    a dup; sub-n docs report (0,0,0); permille is floor-exact."""
    from ariadne_spark.operators.curation import dup_ngram_coverage

    n = 4
    sets = {d: set(py_ngrams(t, n)) if len(t.split(" ")) >= n else set()
            for d, t in DOCS}
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_gram_permille"])
        for r in dup_ngram_coverage(docs_df, n=n).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for d, s in sets.items():
        dup = sum(
            1 for g in s if any(g in s2 for d2, s2 in sets.items() if d2 != d)
        )
        pm = (dup * 1000) // len(s) if s else 0
        assert got[d] == (len(s), dup, pm), d
    # fixture sanity: the overlap pair (docs 0/4) must actually fire
    assert got[0][1] > 0 and got[4][1] > 0
    assert got[1] == (0, 0, 0)  # 2-word doc: no 4-grams


def test_bloom_decontaminate_properties(spark, docs_df):
    """Bloom decontamination: no false negatives vs the exact operator
    at any m; a saturated (tiny-m) filter flags every gram; output is
    parallelism-invariant."""
    from ariadne_spark.operators.curation import (
        bloom_decontaminate,
        decontaminate,
    )

    bench = docs_df.where(F.col("doc_id") == 0)
    corpus = docs_df.where(F.col("doc_id") != 0)
    exact = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in decontaminate(corpus, bench, n=4, min_hits=2).collect()
    }
    bloom = {
        r["doc_id"]: r["bloom_hits"]
        for r in bloom_decontaminate(
            corpus, bench, n=4, m_bits=1 << 16, k=3, min_hits=2
        ).collect()
    }
    assert set(bloom) == set(exact)  # corpus-sized output
    for d, e in exact.items():
        assert bloom[d] >= e, f"false negative on doc {d}"

    # m_bits=1 saturates the filter: every position is occupied, so
    # every gram of every doc "hits" — the false-positive ceiling
    sat = {
        r["doc_id"]: (r["bloom_hits"], r["bloom_contaminated"])
        for r in bloom_decontaminate(
            corpus, bench, n=4, m_bits=1, k=3, min_hits=1
        ).collect()
    }
    for did, text in DOCS[1:]:
        n_grams = len(set(py_ngrams(text, 4)))
        assert sat[did] == (n_grams, int(n_grams >= 1)), did

    # parallelism invariance (approximation included)
    b7 = {
        r["doc_id"]: r["bloom_hits"]
        for r in bloom_decontaminate(
            corpus.repartition(7), bench.repartition(3),
            n=4, m_bits=1 << 16, k=3, min_hits=2,
        ).collect()
    }
    assert b7 == bloom


def test_token_dup_coverage_matches_python_oracle(spark, docs_df):
    """Position-level duplication: interval UNION of covered tokens
    (overlapping shared windows don't double-count); intra-doc-only
    repeats don't cover anything; sub-n docs report 0."""
    from ariadne_spark.operators.curation import token_dup_coverage

    n = 4
    wins = {
        d: [(i + 1, " ".join(t.split(" ")[i : i + n]))
            for i in range(max(0, len(t.split(" ")) - n + 1))]
        for d, t in DOCS
    }
    gram_docs = {}
    for d, ws in wins.items():
        for _i, g in ws:
            gram_docs.setdefault(g, set()).add(d)
    dup_grams = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    got = {
        r["doc_id"]: (r["n_words"], r["dup_tokens"], r["token_dup_permille"])
        for r in token_dup_coverage(docs_df, n=n).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for d, t in DOCS:
        nw = len(t.split(" "))
        covered = set()
        for i, g in wins[d]:
            if g in dup_grams:
                covered.update(range(i, i + n))
        want = (nw, len(covered), len(covered) * 1000 // nw)
        assert got[d] == want, (d, got[d], want)
    # the overlap pair (docs 0/4) shares 'the quick brown fox jumps
    # over' -> 3 windows covering tokens 1..6 (union, not 12)
    assert got[0][1] == 6 and got[4][1] == 6
    # the spam doc repeats grams only WITHIN itself... but doc 3 is
    # 8x'spam' so its grams exist nowhere else: zero coverage
    assert got[3][1] == 0
    assert got[1] == (2, 0, 0)  # sub-n doc


def test_strip_dup_spans_python_and_duckdb_oracle(spark, docs_df):
    """Span REMOVAL (the transform the coverage metric feeds): every
    token inside a cross-doc duplicated 4-gram stripped, survivors keep
    original order, fully-shared docs come back empty. clean_text is
    byte-identical across python, Spark, and DuckDB."""
    from ariadne_spark.operators.curation import (
        strip_dup_spans,
        strip_dup_spans_sql,
    )

    n = 4
    # python oracle: covered-position union, then rebuild
    wins = {
        d: [(i + 1, " ".join(t.split(" ")[i : i + n]))
            for i in range(max(0, len(t.split(" ")) - n + 1))]
        for d, t in DOCS
    }
    gram_docs = {}
    for d, ws in wins.items():
        for _i, g in ws:
            gram_docs.setdefault(g, set()).add(d)
    dup_grams = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = {}
    for d, t in DOCS:
        toks = t.split(" ")
        covered = set()
        for i, g in wins[d]:
            if g in dup_grams:
                covered.update(range(i, i + n))
        kept = [w for p, w in enumerate(toks, 1) if p not in covered]
        want[d] = (len(toks), len(kept), " ".join(kept))

    got = {
        r["doc_id"]: (r["n_words"], r["kept_tokens"], r["clean_text"])
        for r in strip_dup_spans(docs_df, n=n).collect()
    }
    assert got == want
    # docs 0/4 share 'the quick brown fox jumps over': tokens 1..6 gone
    assert got[0][2] == "the lazy dog"
    assert got[4][2] == "a sleeping cat"
    # intra-doc-only repetition survives intact; sub-n docs untouched
    assert got[3][2] == DOCS[3][1]
    assert got[1][2] == "one two"

    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}')" for d, t in DOCS)
        + ") AS v(doc_id, text)"
    )
    sql = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(strip_dup_spans_sql(n=n)).fetchall()
    }
    assert sql == want


def test_shuffle_shards_python_oracle_and_invariance(spark, docs_df):
    """Deterministic shuffle: order key is the shared 4-round integer
    mix, shards = mix % n, positions dense per shard; identical at any
    parallelism and equal to the pure-python layout."""
    from ariadne_spark.functions.sketch import M31, mix_py
    from ariadne_spark.operators.curation import ORDER_SALT, shuffle_shards

    N = 3
    got = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(docs_df, n_shards=N).collect()
    )
    by_shard = {}
    for d, _t in DOCS:
        k = mix_py(d) * M31 + mix_py(d + ORDER_SALT)
        by_shard.setdefault(k % N, []).append((k, d))
    want = []
    for s, ks in by_shard.items():
        for pos, (_k, d) in enumerate(sorted(ks)):
            want.append((d, s, pos))
    assert got == sorted(want)
    # dense positions 0..n-1 within each shard
    for s in {r[1] for r in got}:
        assert sorted(p for _d, sh, p in got if sh == s) == list(
            range(sum(1 for _d, sh, _p in got if sh == s))
        )
    got2 = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(docs_df.repartition(11), n_shards=N).collect()
    )
    assert got2 == got


def test_shuffle_shards_epochs_reshuffle_reproducibly(spark, docs_df):
    """Each epoch yields a different order from the same ids; every
    epoch is itself reproducible and matches the python mix oracle."""
    from ariadne_spark.functions.sketch import M31, mix_py
    from ariadne_spark.operators.curation import (
        EPOCH_SALT,
        ORDER_SALT,
        shuffle_shards,
    )

    def layout(epoch):
        return sorted(
            (r["doc_id"], r["shard"], r["pos"])
            for r in shuffle_shards(docs_df, n_shards=2, epoch=epoch).collect()
        )

    e0, e1 = layout(0), layout(1)
    assert e0 != e1  # epochs actually reshuffle
    assert layout(1) == e1  # and reproducibly so
    by = {}
    for d, _t in DOCS:
        x = d + 1 * EPOCH_SALT
        k = mix_py(x) * M31 + mix_py(x + ORDER_SALT)
        by.setdefault(k % 2, []).append((k, d))
    want = sorted(
        (d, s, p) for s, ks in by.items() for p, (_k, d) in enumerate(sorted(ks))
    )
    assert e1 == want


def test_strip_dup_spans_min_span_threshold(spark):
    """min_span reproduces the Lee-et-al length gate: only maximal
    covered runs >= min_span tokens are removed; shorter incidental
    overlaps survive. Python islands oracle + DuckDB twin parity."""
    from ariadne_spark.operators.curation import (
        strip_dup_spans,
        strip_dup_spans_sql,
    )

    n = 2
    shared_long = "p q r s t u"         # 6-token shared passage
    shared_short = "x y"                # 2-token incidental overlap
    docs = [
        (0, f"a1 {shared_long} b1 {shared_short} c1"),
        (1, f"a2 {shared_long} b2 {shared_short} c2"),
        (2, "unrelated words only here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def oracle(min_span):
        wins = {
            d: [(i + 1, " ".join(t.split(" ")[i : i + n]))
                for i in range(max(0, len(t.split(" ")) - n + 1))]
            for d, t in docs
        }
        gd = {}
        for d, ws in wins.items():
            for _i, g in ws:
                gd.setdefault(g, set()).add(d)
        dup = {g for g, ds in gd.items() if len(ds) >= 2}
        out = {}
        for d, t in docs:
            toks = t.split(" ")
            cov = set()
            for i, g in wins[d]:
                if g in dup:
                    cov.update(range(i, i + n))
            if min_span:
                keepcov = set()
                run = []
                for p in sorted(cov) + [10**9]:
                    if run and p != run[-1] + 1:
                        if len(run) >= min_span:
                            keepcov.update(run)
                        run = []
                    run.append(p)
                cov = keepcov
            kept = [w for p, w in enumerate(toks, 1) if p not in cov]
            out[d] = (len(toks), len(kept), " ".join(kept))
        return out

    import duckdb

    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}')" for d, t in docs)
        + ") AS v(doc_id, text)"
    )
    for ms in (None, 4):
        want = oracle(ms)
        got = {
            r["doc_id"]: (r["n_words"], r["kept_tokens"], r["clean_text"])
            for r in strip_dup_spans(df, n=n, min_span=ms).collect()
        }
        assert got == want, (ms, got, want)
        sql = {
            r[0]: (r[1], r[2], r[3])
            for r in duck.execute(strip_dup_spans_sql(n=n, min_span=ms)).fetchall()
        }
        assert sql == want, ms
    # with the gate, the short shared pair survives; without it, not
    assert "x y" in oracle(4)[0][2] and "x y" not in oracle(None)[0][2]
    # the long shared passage is removed either way
    assert "p q" not in oracle(4)[0][2]


def py_chunks(text: str, chunk: int, stride: int):
    ws = text.split(" ")
    out = []
    for st in range(0, len(ws), stride):
        piece = ws[st : st + chunk]
        out.append((st // stride, st, len(piece), " ".join(piece)))
    return out


CHUNK_DOCS = [
    # adversarial layouts for the slide/clamp math: shorter-than-chunk,
    # exactly one window, exact multiple of stride, trailing partial,
    # empty string ('' -> [''], one 1-token chunk), multi-space runs
    # (empty tokens preserved), single word
    (0, "a b c d e f g h i j"),
    (1, "one two three four"),
    (2, " ".join(f"w{i}" for i in range(8))),   # len == 2*stride at stride 4
    (3, " ".join(f"w{i}" for i in range(11))),  # trailing partial window
    (4, ""),
    (5, "x  y   z"),
    (6, "solo"),
]


def test_chunk_docs_python_oracle(spark):
    """chunk_docs == the plain python sliding-window definition, per
    chunk (idx, start, length, rebuilt text), on adversarial layouts."""
    from ariadne_spark.operators.curation import chunk_docs

    df = spark.createDataFrame(CHUNK_DOCS, "doc_id long, text string")
    got = sorted(
        map(tuple, chunk_docs(df, chunk=6, stride=4).collect())
    )
    want = sorted(
        (did, idx, st, n, txt)
        for did, text in CHUNK_DOCS
        for idx, st, n, txt in py_chunks(text, 6, 4)
    )
    assert got == want
    # every doc chunks (even the empty string), and overlapping windows
    # tile the word stream: consecutive starts differ by exactly stride
    by_doc = {}
    for did, idx, st, n, txt in got:
        by_doc.setdefault(did, []).append(st)
    assert set(by_doc) == {d for d, _ in CHUNK_DOCS}
    for sts in by_doc.values():
        sts.sort()
        assert sts[0] == 0
        assert all(b - a == 4 for a, b in zip(sts, sts[1:]))


def test_chunk_docs_parallelism_invariance(spark):
    from ariadne_spark.operators.curation import chunk_docs

    df = spark.createDataFrame(CHUNK_DOCS, "doc_id long, text string")
    a = sorted(map(tuple, chunk_docs(df.repartition(1), chunk=6, stride=4).collect()))
    b = sorted(map(tuple, chunk_docs(df.repartition(7), chunk=6, stride=4).collect()))
    assert a == b


def py_align(a: list[float], b: list[float], t: int):
    # Spark/DuckDB round() is HALF_UP away from zero; the fixture
    # values are exact binary fractions so x*1000 never lands on .5
    qa = [int(round(x * 1000)) for x in a]
    qb = [int(round(x * 1000)) for x in b]
    dot = sum(x * y for x, y in zip(qa, qb))
    na = sum(x * x for x in qa)
    nb = sum(x * x for x in qb)
    return dot, na, nb, dot > 0 and dot * dot * 1_000_000 >= t * t * na * nb


def test_alignment_filter_python_oracle_and_boundary(spark):
    """alignment_filter == exact integer cosine gate, INCLUDING the
    exact flip boundary: [3,4]x[4,3] has cosine exactly 24/25 = 0.96,
    so t=960 keeps it (>=) and t=961 drops it — pinning that the
    decimal cross-multiplication is exact, not float-approximate."""
    from ariadne_spark.operators.curation import alignment_filter

    rows = [
        (0, [3.0, 4.0], [4.0, 3.0]),       # cos == 0.96 exactly
        (1, [1.0, 0.0], [1.0, 0.0]),       # identical: cos == 1
        (2, [1.0, 0.0], [0.0, 1.0]),       # orthogonal: dot == 0 -> False
        (3, [1.0, 0.0], [-1.0, 0.0]),      # opposite: dot < 0 -> False
        (4, [0.5, 0.25], [0.5, 0.25]),     # exact binary fractions
        (5, [1.0, 1.0], None),             # NULL vector -> fail closed
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, img_vec array<float>, txt_vec array<float>"
    )
    for t in (960, 961):
        got = {
            r["pair_id"]: (r["dot_q"], r["na_q"], r["nb_q"], r["aligned"])
            for r in alignment_filter(df, threshold_permille=t).collect()
        }
        for pid, a, b in rows:
            if b is None:
                assert got[pid][3] is False  # fail-closed NULL gate
                continue
            assert got[pid] == py_align(a, b, t), (pid, t)
    assert got[0][3] is False  # t=961 drops the 0.96 pair
    kept_960 = {
        r["pair_id"]
        for r in alignment_filter(df, threshold_permille=960).collect()
        if r["aligned"]
    }
    assert kept_960 == {0, 1, 4}


def test_alignment_filter_duckdb_parity_on_noisy_floats(spark):
    """Spark and DuckDB agree pair-by-pair (dot, norms, verdict) on
    irregular float vectors incl. negatives — the engines' round() and
    the HUGEINT-vs-decimal gate arithmetic line up bit-identically."""
    import duckdb as _dd

    from ariadne_spark.operators.curation import (
        alignment_filter,
        alignment_gate_sql,
    )

    vals = [
        (i, [((i * 7 + j * 13) % 29 - 14) / 9.0 for j in range(8)],
            [((i * 11 + j * 5) % 31 - 15) / 7.0 for j in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(
        vals, "pair_id long, img_vec array<float>, txt_vec array<float>"
    )
    got = sorted(
        (r["pair_id"], r["dot_q"], r["na_q"], r["nb_q"], r["aligned"])
        for r in alignment_filter(df, threshold_permille=300).collect()
    )
    duck = _dd.connect()
    duck.execute(
        "CREATE TABLE v (pair_id BIGINT, img_vec FLOAT[], txt_vec FLOAT[])"
    )
    duck.executemany("INSERT INTO v VALUES (?, ?, ?)", vals)
    gate = alignment_gate_sql("dot", "na", "nb", 300)
    want = sorted(
        map(
            tuple,
            duck.execute(
                """
        WITH q AS (SELECT pair_id,
                list_transform(img_vec, x -> CAST(round(x*1000) AS BIGINT)) qa,
                list_transform(txt_vec, x -> CAST(round(x*1000) AS BIGINT)) qb
              FROM v),
        m AS (SELECT pair_id,
                CAST(list_dot_product(qa, qb) AS BIGINT) dot,
                CAST(list_dot_product(qa, qa) AS BIGINT) na,
                CAST(list_dot_product(qb, qb) AS BIGINT) nb FROM q)
        SELECT pair_id, dot, na, nb, """
                + gate
                + " FROM m"
            ).fetchall(),
        )
    )
    assert got == want


# ---------------------------------------------------------------- classifier

CLF_DOCS = [
    # (doc_id, text, n_chars): seed = n_chars >= 100. Mixed-polarity
    # vocabulary, an empty doc, a doc repeating one word (distinct-
    # presence semantics must count it once), and a tie token 'good'
    # appearing in both classes.
    (0, "good clean prose with many fine words", 200),
    (1, "spam spam buy now spam", 10),
    (2, "good words and fine prose here", 180),
    (3, "buy now now now", 5),
    (4, "", 0),
    (5, "good spam", 50),
]


def py_quality_classifier(rows, seed, min_df=1, threshold=0):
    """Pure-python twin of curation.quality_classifier (trunc division
    == DuckDB // on the non-negative operands the formula guarantees)."""
    labs = {r[0]: (1 if seed(r) else 0) for r in rows}
    n_pos = sum(labs.values())
    n_neg = len(rows) - n_pos
    df_pos: dict = {}
    df_neg: dict = {}
    for did, text, *_ in rows:
        for w in set(text.split(" ")):
            if labs[did]:
                df_pos[w] = df_pos.get(w, 0) + 1
            else:
                df_neg[w] = df_neg.get(w, 0) + 1
    weights = {}
    for w in set(df_pos) | set(df_neg):
        dp, dn = df_pos.get(w, 0), df_neg.get(w, 0)
        if dp + dn < min_df:
            continue
        rp = (dp * 1000) // max(n_pos, 1)
        rn = (dn * 1000) // max(n_neg, 1)
        weights[w] = (2000 * rp) // (rp + rn + 1) - 1000
    out = {}
    for did, text, *_ in rows:
        s = sum(weights.get(w, 0) for w in set(text.split(" ")))
        out[did] = (s, s >= threshold)
    return out


def test_quality_classifier_python_oracle(spark):
    from ariadne_spark.operators.curation import quality_classifier

    df = spark.createDataFrame(CLF_DOCS, "doc_id long, text string, n_chars long")
    for min_df, thr in [(1, 0), (2, 0), (1, 500)]:
        got = {
            r["doc_id"]: (r["clf_milli"], r["clf_keep"])
            for r in quality_classifier(
                df, F.col("n_chars") >= 100, min_df=min_df, threshold_milli=thr
            ).collect()
        }
        want = py_quality_classifier(
            CLF_DOCS, lambda r: r[2] >= 100, min_df=min_df, threshold=thr
        )
        assert got == want, (min_df, thr)


def test_quality_classifier_duckdb_parity_and_one_class(spark):
    import pandas as pd

    from ariadne_spark.operators.curation import (
        quality_classifier,
        quality_classifier_sql,
    )

    df = spark.createDataFrame(CLF_DOCS, "doc_id long, text string, n_chars long")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(CLF_DOCS, columns=["doc_id", "text", "n_chars"]))
    for pred_col, pred_sql in [
        (F.col("n_chars") >= 100, "n_chars >= 100"),
        (F.lit(True), "TRUE"),  # n_neg == 0: greatest() guard path
        (F.lit(False), "FALSE"),  # n_pos == 0
    ]:
        got = (
            quality_classifier(df, pred_col, min_df=2)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            con.execute(quality_classifier_sql(pred_sql, min_df=2))
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["clf_milli"].to_numpy() == want["clf_milli"].to_numpy()).all()
        assert (got["clf_keep"].to_numpy() == want["clf_keep"].to_numpy()).all()


def test_quality_classifier_parallelism_invariance(spark):
    from ariadne_spark.operators.curation import quality_classifier

    df = spark.createDataFrame(CLF_DOCS, "doc_id long, text string, n_chars long")
    base = sorted(
        map(tuple, quality_classifier(df, F.col("n_chars") >= 100).collect())
    )
    for n in (1, 7):
        again = sorted(
            map(
                tuple,
                quality_classifier(
                    df.repartition(n), F.col("n_chars") >= 100
                ).collect(),
            )
        )
        assert again == base, n


# ----------------------------------------------------------- mixture_sample

MIX_ROWS = [
    # (doc_id, lang): en 10 docs, de 5, fr 2, zh 1
    *[(i, "en") for i in range(10)],
    *[(100 + i, "de") for i in range(5)],
    *[(200 + i, "fr") for i in range(2)],
    (300, "zh"),
]
MIX_W = [("en", 5), ("de", 3), ("fr", 3), ("zh", 1)]


def py_mixture(rows, weights, total, key=lambda r: r[0]):
    wtot = sum(w for _, w in weights)
    app = []
    for g, w in weights:
        app.append([g, (total * w) // wtot, (total * w) % wtot])
    leftover = total - sum(a[1] for a in app)
    for a in sorted(app, key=lambda a: (-a[2], a[0]))[:leftover]:
        a[1] += 1
    quota = {g: n for g, n, _ in app}
    out = {}
    for g in quota:
        members = sorted((r for r in rows if r[1] == g), key=key)
        for rnk, r in enumerate(members[: quota[g]], 1):
            out[r[0]] = (g, quota[g], rnk)
    return out


def test_mixture_sample_python_oracle_and_quota_cap(spark):
    from ariadne_spark.operators.curation import mixture_sample

    df = spark.createDataFrame(MIX_ROWS, "doc_id long, lang string")
    w = spark.createDataFrame(MIX_W, "lang string, weight long")
    # total=12: quotas en=5, de=3, fr=3, zh=1 (exact thirds) — fr has
    # only 2 docs, so the result is 11 rows (no redistribution)
    got = {
        r["doc_id"]: (r["lang"], r["take_n"], r["rnk"])
        for r in mixture_sample(
            df, w, total=12, order_keys=[F.col("doc_id")]
        ).collect()
    }
    want = py_mixture(MIX_ROWS, MIX_W, 12)
    assert got == want
    assert len(got) == 11
    # largest-remainder path: total=10 with weights 5/3/3/1 ->
    # bases 4/2/2/0, remainders give the extras deterministically
    got10 = {
        r["doc_id"]: (r["lang"], r["take_n"], r["rnk"])
        for r in mixture_sample(
            df, w, total=10, order_keys=[F.col("doc_id")]
        ).collect()
    }
    assert got10 == py_mixture(MIX_ROWS, MIX_W, 10)
    assert sum(1 for v in got10.values()) == 10  # nothing capped here


def test_mixture_sample_duckdb_parity(spark):
    import pandas as pd

    from ariadne_spark.operators.curation import (
        mixture_sample,
        mixture_sample_sql,
    )

    df = spark.createDataFrame(MIX_ROWS, "doc_id long, lang string")
    w = spark.createDataFrame(MIX_W, "lang string, weight long")
    got = (
        mixture_sample(df, w, total=9, order_keys=[F.col("doc_id")])
        .select("doc_id", "lang", "take_n", "rnk")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(MIX_ROWS, columns=["doc_id", "lang"]))
    vals = ", ".join(f"('{g}', {w_})" for g, w_ in MIX_W)
    o = (
        con.execute(
            mixture_sample_sql(
                "SELECT * FROM t", vals, 9, "lang", "doc_id",
                ["doc_id", "lang"],
            )
        )
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "take_n", "rnk"):
        assert (got[c].to_numpy() == o[c].to_numpy()).all(), c
    assert list(got["lang"]) == list(o["lang"])


def test_mixture_sample_parallelism_invariance(spark):
    from ariadne_spark.operators.curation import mixture_sample

    df = spark.createDataFrame(MIX_ROWS, "doc_id long, lang string")
    w = spark.createDataFrame(MIX_W, "lang string, weight long")
    base = sorted(
        map(
            tuple,
            mixture_sample(df, w, total=12, order_keys=[F.col("doc_id")])
            .select("doc_id", "take_n", "rnk")
            .collect(),
        )
    )
    for n in (1, 7):
        got = sorted(
            map(
                tuple,
                mixture_sample(
                    df.repartition(n), w, total=12, order_keys=[F.col("doc_id")]
                )
                .select("doc_id", "take_n", "rnk")
                .collect(),
            )
        )
        assert got == base, n


# ------------------------------------------------- materialize_training_run

def _run_corpus(spark):
    rows = []
    for i in range(120):
        lang = ["en", "en", "en", "de", "fr"][i % 5]
        rows.append((i, lang, f"unique doc {i} with several plain words here"))
    # planted exact duplicates (121,122 dup of 0's text) and a
    # repetitive doc that the Gopher gate must drop
    rows.append((500, "en", rows[0][2]))
    rows.append((501, "en", rows[0][2]))
    rows.append((502, "en", "spam spam spam spam spam spam spam spam"))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _weights(spark):
    return spark.createDataFrame(
        [("en", 2), ("de", 1), ("fr", 1)], "lang string, weight long"
    )


def test_materialize_training_run_end_to_end(spark, tmp_path):
    from ariadne_spark.operators.curation import materialize_training_run
    from ariadne_spark.store import SnapshotStore

    st = SnapshotStore(spark, str(tmp_path / "s"))
    sid, ok = materialize_training_run(
        _run_corpus(spark), st, "run1", _weights(spark), total=40, ctx=16,
        n_shards=3,
    )
    assert ok
    out = st.read("run1_layout", snapshot_id="published").toPandas()
    # quotas: 20 en / 10 de / 10 fr; gates dropped dup+spam docs only
    per = out.groupby("lang").size().to_dict()
    assert per == {"en": 20, "de": 10, "fr": 10}
    assert 500 not in set(out["doc_id"]) and 502 not in set(out["doc_id"])
    # gapless per shard
    for shard, g in out.groupby("shard"):
        assert g["start_tok"].min() == 0
        assert (g["start_tok"] + g["tokens"]).max() == g["tokens"].sum()
    # zone-map stats landed for loader-side pruning
    m = st.manifest("run1_layout")
    assert all("first_bin" in (p.get("stats") or {}) for p in m.partitions.values())


def test_materialize_training_run_is_artifact_deterministic(spark, tmp_path):
    """Two runs over the same input -> fingerprint-identical published
    partitions; a different epoch -> a different layout."""
    from ariadne_spark.operators.curation import materialize_training_run
    from ariadne_spark.store import SnapshotStore

    docs = _run_corpus(spark)
    w = _weights(spark)
    fps = []
    for name in ("a", "b"):
        st = SnapshotStore(spark, str(tmp_path / name))
        materialize_training_run(docs, st, "r", w, total=40, ctx=16, n_shards=3)
        m = st.manifest("r_layout")
        fps.append({k: p["fingerprint"] for k, p in m.partitions.items()})
    assert fps[0] == fps[1]
    st = SnapshotStore(spark, str(tmp_path / "c"))
    materialize_training_run(
        docs, st, "r", w, total=40, ctx=16, n_shards=3, epoch=1
    )
    m = st.manifest("r_layout")
    assert {k: p["fingerprint"] for k, p in m.partitions.items()} != fps[0]


def test_materialize_training_run_failed_audit_stays_unpublished(spark, tmp_path):
    from ariadne_spark.operators.curation import materialize_training_run
    from ariadne_spark.store import SnapshotStore

    st = SnapshotStore(spark, str(tmp_path / "s"))
    sid, ok = materialize_training_run(
        _run_corpus(spark), st, "r", _weights(spark), total=40, ctx=16,
        n_shards=3, audit=lambda snap: False,
    )
    assert not ok
    assert st.branches("r_layout") == {}
    assert st.current_snapshot_id("r_layout") == sid  # history kept


# ---------------------------------------------------- read_token_window

def _varlen_corpus(spark):
    rows = []
    for i in range(160):
        lang = ["en", "en", "en", "de", "fr"][i % 5]
        words = " ".join(f"w{i}x{j}" for j in range(i % 11 + 2))
        rows.append((i, lang, words))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_read_token_window_exact_and_pruned(spark, tmp_path):
    from ariadne_spark.operators.curation import (
        materialize_training_run,
        read_token_window,
    )
    from ariadne_spark.store import SnapshotStore

    st = SnapshotStore(spark, str(tmp_path / "s"))
    sid, ok = materialize_training_run(
        _varlen_corpus(spark), st, "r", _weights(spark), total=80, ctx=8,
        n_shards=2, bins_per_part=2,
    )
    assert ok
    full = st.read("r_layout", snapshot_id="published").toPandas()
    n_parts = len(st.manifest("r_layout").partitions)
    assert n_parts > 6  # the chunking actually split shards

    for shard in (0, 1):
        max_bin = int(full[full["shard"] == shard]["last_bin"].max())
        for lo, hi in [(0, 0), (1, 2), (3, 7), (max_bin, max_bin), (0, max_bin)]:
            got = read_token_window(st, "r_layout", shard, lo, hi).toPandas()
            exp = full[
                (full["shard"] == shard)
                & (full["first_bin"] <= hi)
                & (full["last_bin"] >= lo)
            ]
            assert sorted(got["doc_id"]) == sorted(exp["doc_id"]), (shard, lo, hi)

    # the locate step is genuinely partition-pruned: a 2-window read
    # survives far fewer chunks than the shard holds
    survivors = st.prune_keys(
        "r_layout", {"first_bin": (None, 2), "last_bin": (1, None)}, "published"
    )
    shard0 = [k for k in st.manifest("r_layout").partitions if k.startswith("0~")]
    assert 0 < len([k for k in survivors if k.startswith("0~")]) < len(shard0)


def test_read_token_window_finds_chunk_straddler(spark, tmp_path):
    """A doc spanning a chunk boundary lives in its first_bin's chunk;
    a window that only touches its LAST bin must still return it (the
    doc lifts its home chunk's max(last_bin) zone-map bound)."""
    from ariadne_spark.operators.curation import (
        materialize_training_run,
        read_token_window,
    )
    from ariadne_spark.store import SnapshotStore

    st = SnapshotStore(spark, str(tmp_path / "s"))
    materialize_training_run(
        _varlen_corpus(spark), st, "r", _weights(spark), total=80, ctx=8,
        n_shards=2, bins_per_part=2,
    )
    full = st.read("r_layout", snapshot_id="published").toPandas()
    strad = full[
        (full["first_bin"] // 2) != (full["last_bin"] // 2)
    ]
    assert len(strad) > 0  # varlen corpus must produce boundary-crossers
    r = strad.iloc[0]
    got = read_token_window(
        st, "r_layout", int(r["shard"]), int(r["last_bin"]), int(r["last_bin"])
    ).toPandas()
    assert int(r["doc_id"]) in set(got["doc_id"])


# ------------------------------------------------------- surprisal_score

def _surp_py(texts):
    import collections

    toks_per = [[w for w in t.split(" ") if w] for t in texts]
    freq = collections.Counter(w for ts in toks_per for w in ts)
    n_total = sum(freq.values())
    bits = lambda x: x.bit_length()  # noqa: E731
    out = []
    for ts in toks_per:
        if not ts:
            out.append((0, 0))
            continue
        s = sum(bits(n_total) - bits(freq[w]) for w in ts)
        out.append((len(ts), (s * 1000) // len(ts)))
    return out


def test_surprisal_three_way(spark):
    import duckdb

    from ariadne_spark.operators.curation import (
        surprisal_score,
        surprisal_score_sql,
    )

    texts = [
        "the the the the the",                  # all-common -> low score
        "xylophone quark zeugma obelisk",       # all-rare -> high score
        "the quark the quark",                  # mixed
        "",                                     # empty -> (0, 0)
        "the",                                  # single common token
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exp = _surp_py(texts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_permille"])
        for r in surprisal_score(docs).collect()
    }
    for i in range(len(texts)):
        assert got[i] == exp[i], (i, texts[i])
    # the ordering property perplexity filters rely on
    assert got[1][1] > got[2][1] > got[0][1]
    # DuckDB twin
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS v(doc_id, text)"
    )
    o = con.execute(surprisal_score_sql()).df()
    duck = {
        int(r["doc_id"]): (int(r["n_tokens"]), int(r["surprisal_permille"]))
        for _, r in o.iterrows()
    }
    assert duck == got


def test_surprisal_parallelism_invariant(spark):
    from ariadne_spark.operators.curation import surprisal_score

    texts = [f"w{i % 7} w{i % 3} common common" for i in range(60)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["surprisal_permille"] for r in surprisal_score(docs).collect()}
    b = {
        r["doc_id"]: r["surprisal_permille"]
        for r in surprisal_score(docs.repartition(13)).collect()
    }
    assert a == b and len(a) == 60


def test_ws_token_count_convention_boundary(spark):
    """Pins ws_token_count's stated precondition: it equals the
    split+filter(x != '') tokenizer on single-space-separated,
    non-empty, no-edge-space text, and diverges (by documented design:
    it counts empty fields) on consecutive/edge spaces."""
    from ariadne_spark.operators.curation import ws_token_count

    rows = [
        ("a b c", True),
        ("hello", True),
        ("the quick brown fox", True),
        ("x  y", False),   # double space: ws=3 vs strict=2
        (" lead", False),  # leading space: ws=2 vs strict=1
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = (
        df.select(
            "text",
            ws_token_count("text").alias("ws"),
            F.size(
                F.filter(F.split("text", " "), lambda x: x != F.lit(""))
            ).cast("long").alias("strict"),
        )
        .collect()
    )
    by_text = {r["text"]: (r["ws"], r["strict"]) for r in got}
    for text, agree in rows:
        ws, strict = by_text[text]
        assert (ws == strict) == agree, (text, ws, strict)


def test_curate_multimodal_fp_stage_uses_shared_modulus(spark):
    """The funnel's neardup_fp stage must use the SAME rolling-
    fingerprint modulus as the q41/q25 driver queries (sketch.M31 =
    2^31) — a local 2^31-1 once made the 'q41's shapes' claim false.
    Verified by recomputing stage 2 independently in python with the
    shared constant."""
    from ariadne_spark.functions.sketch import M31
    from ariadne_spark.operators.curation import curate_multimodal

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = {r["doc_id"]: r["reason"] for r in curate_multimodal(docs, emb).collect()}

    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    # stage 1 survivors: min doc_id per exact text
    by_text = {}
    for i, t in rows.items():
        by_text.setdefault(t, []).append(i)
    surv1 = {min(ids) for ids in by_text.values()}

    def fp(t):
        v = 0
        for i in range(16):
            v = (v * 31 + (ord(t[i]) if i < len(t) else 0)) % M31
        return v

    by_fp = {}
    for i in sorted(surv1):
        by_fp.setdefault(fp(rows[i]), []).append(i)
    want_fp_dups = {i for ids in by_fp.values() for i in ids if i != min(ids)}
    got_fp_dups = {i for i, r in out.items() if r == "neardup_fp"}
    assert got_fp_dups == want_fp_dups
