"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
arXiv:1508.07909 — the algorithm behind GPT-2/RoBERTa vocabularies).

Spark-first shape: the corpus is scanned ONCE to build the distinct
word-frequency table (one hash groupBy — at 100 TB the word table is
orders of magnitude smaller than the corpus and stays distributed).
Every merge iteration then touches only that vocab table:

  pair counts: explode each word's adjacent symbol pairs weighted by
    word frequency (OVERLAPPING pairs counted, exactly Sennrich's
    get_stats), hash-aggregate, take the argmax with a total
    deterministic order (count DESC, left ASC, right ASC) — ONE row
    to the driver per iteration;
  merge: rewrite each word's symbol array left-to-right
    non-overlapping (an Arrow-batched pandas transform over the vocab
    table), then eager localCheckpoint so iteration k's plan does not
    re-execute the k-1 merges before it (keeps total work linear in
    n_merges and truncates lineage).

Per-iteration cost is O(|vocab| * avg_word_len) — corpus size appears
only in the initial word count. This is how production distributed BPE
trainers are shaped; the classic single-node speedup (incremental pair
count deltas) trades determinism review surface for constant factor
and is deliberately not used.

Determinism: no RNG anywhere; the argmax tie-break is total, so the
merge list is bit-identical at any parallelism/cluster size (pytest-
pinned), matching the repo rule. Encoding applies learned merges in
rank order (lowest rank first — the GPT-2 encoder loop), which
reproduces the training-time symbol state for every in-vocab word; a
test pins that consistency property.

Reference analog: ariadne builds its symbol vocabulary by repeatedly
folding the most frequent capture pattern into a named definition
(`packages/core/src/index_single_file/index_single_file.ts:98-120`);
here the "captures" are byte-pair adjacencies and the fold is a merge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SYMS_SCHEMA = "word string, freq long, syms array<string>"


def _merge_syms(syms: list, left: str, right: str) -> list:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with the fused symbol — Sennrich's merge step."""
    fused = left + right
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(fused)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> (word, freq): the only stage whose cost scales
    with corpus size. Whitespace words, empties dropped."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    sample_permille: int = 1000,
) -> list[tuple[str, str]]:
    """Learn up to `n_merges` BPE merges from the corpus. Stops early
    when the best remaining pair's weighted count drops below
    `min_pair_count` (Sennrich's frequency floor). Returns the merge
    list in creation order — rank i = merges[i].

    `sample_permille < 1000` trains on a deterministic hash-threshold
    document sample (the same salted-mix law as the q42 split policy —
    RNG-free, partition-independent, rebalancing-stable), which is the
    standard production answer at 10^8+ distinct words: token
    statistics of a uniform sample converge fast, the per-iteration
    base shrinks proportionally, and the sampled run is exactly
    reproducible on any cluster. Encoding (`bpe_encode`) is always
    full-corpus."""
    from ..functions.sketch import mix_col

    if sample_permille < 1000:
        docs = docs.where(
            mix_col(F.xxhash64(F.col(text_col)).bitwiseAND(F.lit((1 << 31) - 1)))
            % F.lit(1000)
            < F.lit(sample_permille)
        )
    words = word_freq_table(docs, text_col).withColumn(
        "syms", F.filter(F.split("word", ""), lambda x: x != "")
    )
    words = words.localCheckpoint(eager=True)

    # adjacent (overlapping) pair extraction as a pure column expr
    pairs_expr = F.expr(
        "transform(sequence(0, size(syms) - 2), "
        "i -> struct(syms[i] AS l, syms[i + 1] AS r))"
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            words.where(F.size("syms") >= 2)
            .select(F.explode(pairs_expr).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        words = words.mapInPandas(
            lambda it, _l=left, _r=right: (
                _apply_merge_batch(pdf, _l, _r) for pdf in it
            ),
            _SYMS_SCHEMA,
        )
        # eager checkpoint: without it, iteration k's argmax would
        # re-run all k-1 merge transforms (quadratic total work)
        words = words.localCheckpoint(eager=True)
    return merges


def _apply_merge_batch(pdf: pd.DataFrame, left: str, right: str) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["syms"] = [_merge_syms(list(s), left, right) for s in pdf["syms"]]
    return pdf


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each doc with the learned merges: whitespace pre-split,
    then the rank-order merge loop per word (memoized per Arrow batch,
    so repeated words cost one encode). Returns (id_col, tokens
    array<string>, n_tokens). The merge table broadcasts in the UDF
    closure — it is n_merges-sized, never corpus-sized."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def enc(it):
        memo: dict = {}

        def one(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                syms = list(word)
                while len(syms) >= 2:
                    best_rank = None
                    best_i = -1
                    for i in range(len(syms) - 1):
                        r = ranks.get((syms[i], syms[i + 1]))
                        if r is not None and (best_rank is None or r < best_rank):
                            best_rank, best_i = r, i
                    if best_rank is None:
                        break
                    # fuse EVERY occurrence of that pair left-to-right
                    l, r_ = syms[best_i], syms[best_i + 1]
                    syms = _merge_syms(syms, l, r_)
                got = memo[word] = syms
            return got

        for pdf in it:
            # NULL text tokenizes to [] (matching word_freq_table /
            # train_bpe, which drop null text) — never str(None)
            toks = [
                []
                if x is None
                else [t for w in x.split(" ") if w for t in one(w)]
                for x in pdf["__text"]
            ]
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    # keep the id column's NATIVE type (string image_ids, long doc_ids,
    # ...) — the output schema echoes the input field's dataType
    id_type = docs.select(F.col(id_col).alias("__id")).schema[0].dataType
    out = docs.select(
        F.col(id_col).alias("__id"), F.col(text_col).cast("string").alias("__text")
    ).mapInPandas(
        enc,
        T.StructType(
            [
                T.StructField("__id", id_type),
                T.StructField("tokens", T.ArrayType(T.StringType())),
                T.StructField("n_tokens", T.LongType()),
            ]
        ),
    )
    return out.withColumnRenamed("__id", id_col)
