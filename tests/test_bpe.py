"""BPE trainer/encoder vs an independent pure-python Sennrich
implementation: merge-list equality (incl. tie corpora), encode
equality, the encode==training-state consistency property, the
min_pair_count floor, and parallelism invariance."""

import collections

import pytest

from ariadne_spark.operators.bpe import bpe_encode, train_bpe, word_freq_table


# ---------------------------------------------------------- python oracle

def _py_get_stats(vocab):
    pairs = collections.Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += freq
    return pairs


def _py_merge(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(texts, n_merges, min_pair_count=2):
    freq = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    vocab = [(list(w), c) for w, c in sorted(freq.items())]
    merges = []
    for _ in range(n_merges):
        stats = _py_get_stats(vocab)
        if not stats:
            break
        # count DESC, then left ASC, right ASC — the same total order
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_pair_count:
            break
        l, r = best[0]
        merges.append((l, r))
        vocab = [(_py_merge(s, l, r), c) for s, c in vocab]
    return merges, {"".join(s): s for s, _ in vocab}


def _py_encode(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        while len(syms) >= 2:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            rank = min(cands)[0]
            l, r = merges[rank]
            syms = _py_merge(syms, l, r)
        out.extend(syms)
    return out


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new era era era",
]

TIE_CORPUS = [
    "ab ab cd cd",  # (a,b) and (c,d) tie at 2 -> lexical order decides
    "xy xy",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_freq_table(spark):
    got = {
        r["word"]: r["freq"]
        for r in word_freq_table(_docs(spark, CORPUS)).collect()
    }
    exp = collections.Counter(w for t in CORPUS for w in t.split(" ") if w)
    assert got == dict(exp)


def test_train_matches_python_oracle(spark):
    exp, _ = _py_train(CORPUS, 12)
    got = train_bpe(_docs(spark, CORPUS), 12)
    assert got == exp
    assert len(got) > 4  # the corpus genuinely supports many merges


def test_train_tie_break_deterministic(spark):
    exp, _ = _py_train(TIE_CORPUS, 4)
    got = train_bpe(_docs(spark, TIE_CORPUS), 4)
    assert got == exp
    # ties resolved lexically: (a,b) before (c,d) before (x,y)
    assert got[0] == ("a", "b")


def test_train_parallelism_invariant(spark):
    base = train_bpe(_docs(spark, CORPUS), 8)
    repart = train_bpe(_docs(spark, CORPUS).repartition(13), 8)
    assert base == repart


def test_min_pair_count_floor(spark):
    # every pair in this corpus occurs once -> no merges at floor 2
    docs = _docs(spark, ["abc def", "ghi jkl"])
    assert train_bpe(docs, 10, min_pair_count=2) == []
    got = train_bpe(docs, 3, min_pair_count=1)
    assert len(got) == 3  # floor 1 lets singleton pairs merge


def test_encode_matches_python_oracle(spark):
    merges, _ = _py_train(CORPUS, 12)
    texts = CORPUS + ["lowest newer wide", "", "unseen tokens here"]
    docs = _docs(spark, texts)
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        exp = _py_encode(t, merges)
        assert got[i][0] == exp, t
        assert got[i][1] == len(exp)


def test_encode_reproduces_training_state(spark):
    """The BPE consistency law: rank-order encoding of any TRAINING
    word yields exactly that word's final training-time symbols."""
    merges, final_syms = _py_train(CORPUS, 12)
    words = sorted({w for t in CORPUS for w in t.split(" ") if w})
    docs = _docs(spark, words)  # one word per doc
    got = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(docs, merges).collect()}
    for i, w in enumerate(words):
        assert got[i] == final_syms[w], w


def test_encode_oov_composes_from_learned_units(spark):
    merges, _ = _py_train(CORPUS, 12)
    [row] = bpe_encode(_docs(spark, ["lowestest"]), merges).collect()
    toks = list(row["tokens"])
    assert "".join(toks) == "lowestest"  # lossless
    assert len(toks) < len("lowestest")  # learned units actually apply


def test_sampled_training_deterministic_and_nonempty(spark):
    """sample_permille trains on the hash-threshold doc subset: full
    rate == default; a real subsample still learns merges and is
    bit-identical across parallelism levels."""
    docs = _docs(spark, CORPUS * 4)  # 20 docs
    full = train_bpe(docs, 6)
    assert train_bpe(docs, 6, sample_permille=1000) == full
    a = train_bpe(docs, 6, sample_permille=500)
    b = train_bpe(docs.repartition(7), 6, sample_permille=500)
    assert a == b and len(a) > 0


def test_encode_keeps_native_id_type_and_null_text(spark):
    """bpe_encode must echo the id column's NATIVE type (the repo's
    image tables use string ids) and tokenize NULL text to [] — not the
    phantom str(None) token — matching the training path, which drops
    null text."""
    docs = spark.createDataFrame(
        [("img_a", "low low lower"), ("img_b", None)],
        "image_id string, text string",
    )
    merges = train_bpe(
        spark.createDataFrame([("low low lower",)], "text string"), n_merges=2
    )
    out = bpe_encode(docs, merges, id_col="image_id")
    assert dict(out.dtypes)["image_id"] == "string"
    got = {r["image_id"]: (r["tokens"], r["n_tokens"]) for r in out.collect()}
    assert got["img_b"] == ([], 0)
    assert got["img_a"][1] > 0 and "None" not in got["img_a"][0]
