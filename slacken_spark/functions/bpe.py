"""Distributed byte-pair-encoding (BPE) tokenizer training.

The classic BPE trainer (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", ACL 2016) iterates: count adjacent symbol
pairs weighted by word frequency, merge the most frequent pair everywhere,
repeat. At corpus scale the key observation (and the one every production
tokenizer trainer uses) is that training state collapses to the WORD
FREQUENCY table — vocabulary-sized by Heaps' law — not the corpus:

- one corpus pass builds ``(word, wc)`` (explode + partial-agg count);
- every merge round runs entirely on that table: pair counting is an
  explode + partial-agg sum (map-side combined, one shuffle on the pair),
  the argmax is a deterministic ``orderBy(...).limit(1)`` (ONE driver row
  per round), and the merge itself is an Arrow-batched pandas UDF over the
  symbol arrays.

So a 100 TB corpus is scanned once; the iteration touches only the
vocabulary. Determinism: ties break on (count DESC, left ASC, right ASC),
making the learned merge sequence engine- and partitioning-independent.

Reference analog: this generalizes the reference engine's k-mer counting
machinery (kmers/MinSplitter.scala — count substring units, aggregate by
key) to learned text segmentation; the iterative driver loop follows the
same one-action-per-round discipline as ``dedup.connected_components`` and
``similarity.kmeans_train``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from slacken_spark.functions.text import BPE_PATTERN
from slacken_spark.session import pin as _pin


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """BPE pre-token frequency table: (word, wc) — the only corpus pass.

    Pre-tokenization is the shared ``BPE_PATTERN`` segmentation (letter
    runs / digit runs / single symbols); counting is explode +
    partial-agg, one shuffle on the word.
    """
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _chars(col):
    """Split a word into single-character symbol arrays (codegen'd)."""
    return F.split(col, "(?!^)(?=.)")


def pair_counts(symbols_df: DataFrame) -> DataFrame:
    """Adjacent-pair counts over (symbols array<string>, wc) rows.

    Explode the adjacent positions, weight by word count, partial-agg
    sum on the (left, right) pair — one shuffle, map-side combined.
    """
    from slacken_spark.functions.text import int_range

    # int_range, not sequence: sequence(1, 0) auto-reverses to [1, 0],
    # which would index past single-symbol words
    pairs = symbols_df.select(
        "wc",
        F.explode(int_range(1, F.size("symbols") - 1)).alias("i"),
        F.col("symbols"),
    ).select(
        F.element_at("symbols", F.col("i")).alias("left"),
        F.element_at("symbols", F.col("i") + 1).alias("right"),
        "wc",
    )
    return pairs.groupBy("left", "right").agg(F.sum("wc").alias("cnt"))


def merge_once(syms, lf: str, rt: str) -> list[str]:
    """Greedy left-to-right replacement of one (lf, rt) pair — the
    textbook BPE rule, shared by training (``_merge_pair_batch``) and
    apply (``bpe_apply``) so the two paths can never drift. (The
    ``*_reference`` test models deliberately keep their own copies.)"""
    merged = []
    i, m = 0, len(syms)
    while i < m:
        if i + 1 < m and syms[i] == lf and syms[i + 1] == rt:
            merged.append(lf + rt)
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return merged


def _merge_pair_batch(symbols: pd.Series, left: pd.Series, right: pd.Series) -> pd.Series:
    """One merge applied to each symbol array. Runs per WORD
    (vocabulary-sized input), Arrow-batched; the hot loop is short
    because words are short.
    """
    return pd.Series(
        [merge_once(syms, lf, rt) for syms, lf, rt in zip(symbols, left, right)]
    )


def _merge_pair_udf(*cols):
    # built lazily: pandas_udf type parsing needs an active session
    return pandas_udf(_merge_pair_batch, "array<string>")(*cols)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count), …]
    in learned order.

    One corpus pass (``word_frequencies``), then each round costs one
    pair-count shuffle + one single-row driver action + one map-only
    merge over the persisted vocabulary table. Lineage is truncated with
    ``localCheckpoint`` every ``checkpoint_every`` rounds (same contract
    as ``dedup.connected_components``); superseded persists are freed as
    soon as the next round materializes. Stops early when no adjacent
    pair remains.
    """
    from slacken_spark.functions.dedup import _stats_free, _unpersist_local_ckpt

    wf = word_frequencies(df, text_col)
    cur = wf.select(_chars(F.col("word")).alias("symbols"), "wc").persist()
    prev, prev_is_ckpt, cur_is_ckpt = None, False, False
    merges: list[tuple[str, str, int]] = []

    def release(df_, is_ckpt):
        # localCheckpoint blocks live on the plan's backing RDD, out of
        # DataFrame.unpersist's reach — release them explicitly (same
        # contract as connected_components)
        df_.unpersist()
        if is_ckpt:
            _unpersist_local_ckpt(df_)

    try:
        for round_no in range(n_merges):
            # ONE action per round: this collect materializes cur's
            # persist on first use, which is also the moment the
            # previous round's block is safe to free
            top = (
                pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                release(prev, prev_is_ckpt)
                prev = None
            if not top:
                break
            lf, rt, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
            merges.append((lf, rt, cnt))
            if round_no == n_merges - 1:
                break  # the final merge decision needs no merged table
            nxt = cur.select(
                _merge_pair_udf("symbols", F.lit(lf), F.lit(rt)).alias("symbols"),
                "wc",
            )
            nxt_is_ckpt = (round_no + 1) % checkpoint_every == 0
            if nxt_is_ckpt:
                # _stats_free is hygiene here: this loop's checkpoints
                # never self-join (map-only merges), so stats growth is
                # sub-critical — the reset future-proofs shape changes
                # (see dedup._stats_free; unpersist still reaches the
                # same backing RDD through the rebuilt frame)
                nxt = _stats_free(nxt.transform(_pin))
            prev, prev_is_ckpt = cur, cur_is_ckpt
            cur, cur_is_ckpt = nxt.persist(), nxt_is_ckpt
    finally:
        release(cur, cur_is_ckpt)
        if prev is not None:
            release(prev, prev_is_ckpt)
    return merges


def bpe_train_reference(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Single-process reference trainer (test model for ``bpe_train``).

    Same pre-tokenization, same greedy merge, same deterministic
    tie-break — pure Python over a dict, for parity tests only.
    """
    import re
    from collections import Counter

    wf = Counter(
        w for text in texts for w in re.findall(BPE_PATTERN, text)
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(word): c for word, c in wf.items()
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (lf, rt), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((lf, rt, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lf and syms[i + 1] == rt:
                    merged.append(lf + rt)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_apply(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]],
    out_col: str = "n_bpe_symbols",
) -> DataFrame:
    """Tokenize with a learned merge list: per-document BPE symbol count
    after applying ``merges`` in learned order (the apply half of the
    tokenizer loop; counts are what a token-budget planner needs).

    Map-only: one Arrow-batched UDF pass over the documents — each word
    replays the merge list greedily, memoized per distinct word within
    the batch (Zipf makes the per-batch word set tiny relative to the
    token stream). No shuffle is introduced; whatever partitioning the
    caller has stays intact.
    """
    merge_list = [(lf, rt) for lf, rt, *_ in merges]

    def apply_batch(texts: pd.Series) -> pd.Series:
        import re

        cache: dict[str, int] = {}

        def word_len(word: str) -> int:
            n = cache.get(word)
            if n is None:
                syms = list(word)
                for lf, rt in merge_list:
                    syms = merge_once(syms, lf, rt)
                cache[word] = n = len(syms)
            return n

        return texts.map(
            lambda t: sum(word_len(w) for w in re.findall(BPE_PATTERN, t))
        )

    udf = pandas_udf(apply_batch, "long")
    return df.withColumn(out_col, udf(F.col(text_col)))


def bpe_apply_reference(text: str, merges: list[tuple[str, str, int]]) -> int:
    """Pure-Python apply (test model for ``bpe_apply``)."""
    import re

    total = 0
    for word in re.findall(BPE_PATTERN, text):
        syms = list(word)
        for lf, rt, *_ in merges:
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lf and syms[i + 1] == rt:
                    merged.append(lf + rt)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        total += len(syms)
    return total
