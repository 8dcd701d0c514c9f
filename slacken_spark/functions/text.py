"""Text-analysis column functions for large-scale document pipelines.

All functions are pure ``pyspark.sql.functions`` compositions (JVM-side,
whole-stage-codegen'd) — no Python UDFs in the hot path. They generalize
the reference engine's k-mer/minimizer machinery to text: shingling is
k-mer extraction, winnowing fingerprints are minimizers over hash
priorities (reference: kmers/minimizer/MinSplitter.scala,
PosRankWindow.scala — re-expressed declaratively here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal language marker sets for the n-gram/stopword language-ID
# heuristic. Deterministic and tiny by design: language ID at 100 TB must
# be a broadcast-free, codegen-able CASE expression.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "fr": ("le", "la", "de", "et", "un", "une", "les"),
    "de": ("der", "die", "das", "und", "ein", "ist", "nicht"),
}

STOPWORDS_EN: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "was", "are",
)


def int_range(start: Column | int, stop: Column) -> Column:
    """``sequence(start, stop)`` that is EMPTY when stop < start.

    Spark's ``sequence`` auto-reverses (``sequence(1, 0) == [1, 0]``),
    which silently corrupts n-gram extraction on short strings — guard it.
    """
    start = F.lit(start) if isinstance(start, int) else start
    return F.when(stop >= start, F.sequence(start, stop)).otherwise(
        F.array().cast("array<int>")
    )


def tokens(col: Column) -> Column:
    """Whitespace tokenization. ``split(trim(s), '\\s+')``."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(tokens(col))


# BPE-style pre-tokenization: runs of letters, runs of digits, or single
# non-space symbols — the GPT-2-ish segmentation boundary (simplified to
# an RE2-compatible pattern both Spark and DuckDB execute identically).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokens as an array (regexp_extract_all, codegen'd)."""
    return F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0)


def char_ngrams(col: Column, n: int) -> Column:
    """All character n-grams of a string as an array (k-mer extraction on text)."""
    return F.transform(
        int_range(1, F.length(col) - (n - 1)),
        lambda i: col.substr(i, F.lit(n)),
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams (shingles) from a token array, joined with single spaces."""
    return F.transform(
        int_range(0, F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )


def shingle_rows(df, text_col: str, id_col: str, n: int = 3, distinct: bool = True):
    """Word n-gram shingles as ROWS: (id, shingle) — the scale path.

    posexplode tokens → window lead(n−1) → concat (the shared
    ``positioned_grams`` plan): fully codegen'd, one shuffle on the id.
    Spark's array higher-order functions (transform/filter) evaluate
    interpreted per element, so building shingles inside an array
    lambda is ~5× slower on the same data and falls off a cliff at
    corpus scale; use this for anything big.
    """
    grams = positioned_grams(positioned_tokens(df, text_col, id_col), id_col, n)
    sh = grams.select(id_col, F.col("gram").alias("shingle"))
    return sh.distinct() if distinct else sh


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of tokens that are stopwords (classic quality signal)."""
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


def mean_token_len(toks: Column) -> Column:
    """Average token length — a cheap fluency proxy."""
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def lang_score(toks: Column, lang: str) -> Column:
    """Count of language-marker tokens for ``lang``."""
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))


def lang_id(toks: Column, langs: tuple[str, ...] = ("en", "es", "fr", "de")) -> Column:
    """Argmax language by marker-token count; ties and zero scores → 'und'.

    Deterministic tie-break: higher score wins, then earlier language in
    ``langs``. Pure CASE/filter expression — runs fully in codegen.
    """
    scores = [lang_score(toks, lg) for lg in langs]
    best = F.greatest(*scores)
    expr = F.lit("und")
    # build reversed so earlier langs take precedence on ties
    for lg, sc in reversed(list(zip(langs, scores))):
        expr = F.when((best > 0) & (sc == best), F.lit(lg)).otherwise(expr)
    return expr


def token_hash64(col: Column) -> Column:
    """Portable 60-bit hash of a string: first 15 hex chars of md5 → bigint.

    Used instead of Spark's xxhash64 so that DuckDB/other engines can
    reproduce results exactly (md5 is standardized; xxhash seeds are not).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(col: Column, k: int = 8, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003).

    Character k-gram rolling hashes; keep the minimum hash of every
    ``window`` consecutive k-grams; return the distinct fingerprint set.
    This is exactly the minimizer scheme the reference applies to DNA
    (PosRankWindow.scala sliding-window minimum) re-expressed as a
    declarative array program.
    """
    grams = char_ngrams(col, k)
    hashes = F.transform(grams, token_hash64)
    mins = F.transform(
        int_range(0, F.size(hashes) - window),
        lambda i: F.array_min(F.slice(hashes, i + 1, window)),
    )
    return F.array_sort(F.array_distinct(mins))


def positioned_tokens(df, text_col: str, id_col: str):
    """(id, pos, tok) rows via posexplode — the shared entry of every
    position-aware scrub plan."""
    return df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )


def positioned_grams(pos_toks, id_col: str, n: int):
    """(id, pos, gram) word n-grams from positioned tokens: the
    posexplode + lead-window plan (one id-shuffle, codegen'd — the scale
    alternative to interpreted array lambdas; see ``shingle_rows``).

    ``n=1`` degenerates to the tokens themselves (no window at all)."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        return pos_toks.select(id_col, "pos", F.col("tok").alias("gram"))
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)]
    return (
        pos_toks.select(id_col, "pos", "tok", *leads)
        .where(F.col(f"t{n-1}").isNotNull())
        .select(
            id_col,
            "pos",
            F.concat_ws(" ", "tok", *[f"t{i}" for i in range(1, n)]).alias("gram"),
        )
    )


def _scrub_rebuild(df, pos_toks, covered, text_col: str, id_col: str, n: int):
    """Drop covered positions, reassemble survivors in order, and attach
    kept/removed counts — the shared tail of every span scrub.

    ``covered`` is (id, pos) of gram STARTS; the position union
    (explode pos..pos+n−1, distinct) happens here so overlapping spans
    never double-count."""
    covered = covered.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos"),
    ).distinct()
    kept = pos_toks.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        df.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def dupspan_scrub(df, text_col: str, id_col: str, n: int = 5):
    """Cross-document exact duplicate-span removal (the substring-dedup
    step of training-data pipelines, after Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — re-expressed
    as a relational plan instead of a suffix array).

    A word ``n``-gram that occurs in ≥2 distinct documents is a
    duplicated span. The document with the smallest id containing the
    gram OWNS it and keeps its copy; every other document drops all
    token positions covered by that gram. Survivors are reassembled in
    original order. Returns (id, clean_text, n_kept, n_removed).

    Scale shape: positioned grams come from the shared posexplode +
    lead-window plan (one id-shuffle); ownership is a partial-agg
    shuffle on the gram. Unlike ``boilerplate_scrub``'s frequent set,
    the duplicated-gram set is NOT small (it grows with corpus overlap),
    so ownership joins back shuffle-side on the gram key — never a
    broadcast. Coverage then anti-joins the token rows on (id, pos).
    Each step is linear in gram rows; nothing materializes per-pair
    state, so the plan survives corpora where a suffix array would not
    shard.
    """
    from slacken_spark.session import pin

    # The gram subtree is consumed twice below (ownership agg AND the
    # covered join), and Spark does not dedupe common subplans — the
    # un-pinned plan re-ran the scan+posexplode+window pipeline three
    # times (measured r13-opt: 3 × ~15 s executor time at sf0.1, the
    # entry's dominant cost). One lazy pin materializes the pass once;
    # both consumers read the blocks. The window-free pos_toks
    # recompute for the kept anti-join is cheap next to a second
    # materialization layer.
    pos_toks = positioned_tokens(df, text_col, id_col)
    grams = pin(positioned_grams(pos_toks, id_col, n))
    owners = (
        grams.groupBy("gram")
        .agg(
            F.min(id_col).alias("owner"),
            F.count_distinct(id_col).alias("df"),
        )
        .where(F.col("df") >= 2)
        .select("gram", "owner")
    )
    covered_starts = (
        grams.join(owners, "gram")
        .where(F.col(id_col) != F.col("owner"))
        .select(id_col, "pos")
    )
    return _scrub_rebuild(df, pos_toks, covered_starts, text_col, id_col, n)


def boilerplate_scrub(
    df,
    text_col: str,
    id_col: str,
    n: int = 2,
    min_df_frac: float = 0.04,
    n_docs: int | None = None,
):
    """Corpus-level boilerplate span removal (CCNet-style, word n-grams).

    A word ``n``-gram occurring in at least ``ceil(min_df_frac * n_docs)``
    distinct documents is boilerplate; every token position covered by
    any boilerplate gram is dropped and the survivors are reassembled in
    original order. Returns (id, clean_text, n_kept, n_removed).

    Scale shape: positioned grams come from the posexplode + lead-window
    plan (one id-shuffle, shared with ``shingle_rows``); the gram
    document-frequency count is a partial-agg shuffle on the gram; the
    boilerplate set is small BY DEFINITION (grams above a df threshold —
    at 100 TB it is header/footer/license text, thousands of grams, not
    millions) so it broadcasts back onto the positioned grams; covered
    positions anti-join the token rows on (id, pos). No step holds a
    whole document's corpus-frequency context anywhere but the broadcast.

    ``n_docs`` (corpus size) is one driver-side count when not supplied —
    callers that already know it (or want a fixed absolute threshold via
    ``min_df_frac * n_docs``) pass it in and the extra action disappears.
    """
    import math

    if n_docs is None:
        n_docs = df.count()
    # floor at 2, not 1: boilerplate must by definition occur in at
    # least two documents — a floor of 1 makes EVERY gram frequent on a
    # corpus of <= 1/min_df_frac docs and silently deletes all text
    min_df = max(2, math.ceil(min_df_frac * n_docs))

    from slacken_spark.session import pin

    # same duplicated-subtree shape as dupspan_scrub (grams feeds the
    # frequency agg AND the covered join) — pin the scan+posexplode+
    # window pass once instead of recomputing it per consumer (guide
    # §3.3: common subtrees are not deduped; measured r13-opt). The
    # window-free pos_toks recompute for the kept anti-join is cheap
    # next to a second materialization layer.
    pos_toks = positioned_tokens(df, text_col, id_col)
    grams = pin(positioned_grams(pos_toks, id_col, n))
    frequent = (
        grams.select(id_col, "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("gram")
    )
    covered_starts = grams.join(F.broadcast(frequent), "gram").select(
        id_col, "pos"
    )
    return _scrub_rebuild(df, pos_toks, covered_starts, text_col, id_col, n)


def source_unigram_drift(docs, text_col: str = "text",
                         group_col: str = "source"):
    """Per-group unigram-distribution drift vs the whole corpus as an
    exact integer fraction: ``l1_num / denom`` with
    ``l1_num = Σ_w |n_g(w)·N − n(w)·N_g|`` and ``denom = N_g·N`` — the
    L1 distance between the group's and the corpus's token
    distributions, cross-multiplied so the whole computation is int64
    (exact while ``N·max n_g(w) < 2^63``; rescale counts above that).
    Terms ABSENT from a group contribute ``(N − Σ_{w∈G} n(w))·N_g``
    in closed form, so nothing materializes group × vocabulary.

    Scale shape: one (group, token) partial-agg shuffle over
    occurrences; the vocabulary and per-group totals reduce those
    ALREADY-aggregated rows and broadcast back (Heaps' law).
    Returns ``(group_col, l1_num, denom)``. ONE definition shared by
    the ``source_token_drift`` catalog entry and the CLI report.

    ``sc`` is pinned (lazy localCheckpoint, the scrubs' convention):
    it is referenced FOUR times below (``st``, ``vc``, and the
    ``present`` join) and Spark does not dedupe common subplans —
    un-pinned, every reference re-ran the corpus tokenize + explode +
    partial-agg shuffle (the captured plan scanned the corpus parquet
    12 times; r13-opt). The pinned rows are the ALREADY-aggregated
    (group, token) counts — vocabulary-bounded by Heaps' law, tiny
    next to the per-occurrence stream they replace — so this is the
    profitable side of the pin trade (the reverted ngram shingle pin
    is the unprofitable side).
    """
    from slacken_spark.session import pin as _pin

    o = docs.select(
        F.col(group_col).alias("_g"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    sc = _pin(
        o.groupBy("_g", "tok").agg(
            F.count(F.lit(1)).cast("long").alias("ns")
        )
    )
    st = sc.groupBy("_g").agg(F.sum("ns").cast("long").alias("nsrc"))
    vc = sc.groupBy("tok").agg(F.sum("ns").cast("long").alias("nc"))
    n_total = vc.agg(F.sum("nc").cast("long").alias("n"))
    present = (
        sc.join(F.broadcast(vc), "tok")
        .join(F.broadcast(st), "_g")
        .crossJoin(F.broadcast(n_total))
        .groupBy("_g")
        .agg(
            F.sum(
                F.abs(F.col("ns") * F.col("n") - F.col("nc") * F.col("nsrc"))
            )
            .cast("long")
            .alias("l1_present"),
            F.sum("nc").cast("long").alias("nc_present"),
        )
    )
    return (
        present.join(F.broadcast(st), "_g")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col("_g").alias(group_col),
            (
                F.col("l1_present")
                + (F.col("n") - F.col("nc_present")) * F.col("nsrc")
            )
            .cast("long")
            .alias("l1_num"),
            (F.col("nsrc") * F.col("n")).cast("long").alias("denom"),
        )
    )


def bigram_count_tables(
    df, text_col: str, id_col: str, pin_pairs: bool = False
):
    """``(bg, c, cont)``: per-occurrence adjacent token pairs
    (id, l, r), the corpus-wide pair-count table (l, r, n), and the
    Kneser-Ney continuation counts (r, cont_r) — THE one definition of
    the bigram statistics, shared by the ``ngram_lm_counts`` tables
    entry and :func:`bigram_lm_scores` so pair construction cannot
    drift between the count tables and the document scorer. One
    posexplode + lead window (single ``id_col`` shuffle); ``c``
    reduces per-occurrence rows to the vocab²-bounded table; ``cont``
    reduces the ALREADY-aggregated pairs.

    ``c`` is pinned (lazy localCheckpoint, the scrubs' convention):
    every consumer references it at least twice (directly AND under
    ``cont``), and Spark does not dedupe common subplans — un-pinned,
    each reference re-ran the whole corpus tokenize + window pipeline
    (r13-opt; the captured ngram_lm_counts/bigram_lm_scores plans
    scanned the corpus 2-4 times). Pinning preserves the child plan's
    size statistics, so the downstream size-based broadcasts still
    fire. ``pin_pairs=True`` additionally pins the per-occurrence
    pair stream for consumers that join back onto it
    (:func:`bigram_lm_scores`) — corpus-occurrence-sized, so only
    worth one materialization when ``bg`` itself is re-read."""
    from pyspark.sql import Window as W

    from slacken_spark.session import pin

    pt = positioned_tokens(df, text_col, id_col)
    w = W.partitionBy(id_col).orderBy("pos")
    bg = (
        pt.select(
            F.col(id_col),
            F.col("tok").alias("l"),
            F.lead("tok").over(w).alias("r"),
        )
        .where(F.col("r").isNotNull())
    )
    if pin_pairs:
        bg = pin(bg)
    c = pin(
        bg.groupBy("l", "r").agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cont = c.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("cont_r"))
    return bg, c, cont


def bigram_lm_scores(
    df, text_col: str, id_col: str, min_count: int = 30
):
    """Per-document bigram language-model quality signals — the bigram
    analog of the unigram rarity scorer (``doc_unigram_rarity``), and
    the document-scoring consumer of ``ngram_lm_counts``'s corpus
    tables: a CCNet-style filter thresholds on these instead of a
    floating LM perplexity, with every statistic an INTEGER (plus one
    final int/int division), so results are exactly reproducible
    across engines.

    Per doc: ``n_bigrams`` (adjacent token pairs), ``n_known`` (pairs
    whose corpus count ≥ min_count — template/boilerplate text scores
    high, OCR noise and wrong-language text low), ``sum_n`` (corpus
    popularity mass of its pairs), ``sum_cont`` (Kneser-Ney
    continuation counts of its pairs' right tokens — diversity of
    contexts, the signal that separates natural reuse from copy-paste
    boilerplate), and ``known_frac`` = n_known / n_bigrams. Docs with
    < 2 tokens emit zeros with a NULL known_frac.

    Scale shape: ONE posexplode + lead window builds pairs (one
    ``id_col`` shuffle), the corpus pair table reduces on a
    vocab²-bounded partial-agg shuffle, the continuation count reduces
    the ALREADY-aggregated pairs (a row per distinct pair, never per
    occurrence), and the statistics tables join back onto the pair
    stream before the final per-doc aggregation — the corpus is
    scanned once, nothing corpus-sized concentrates on one task. Both
    stat joins are size-based broadcasts (never forced hints): small
    corpora broadcast, an open-vocabulary outlier degrades to a
    shuffle join; the plan degrades, not breaks.
    """
    # pin_pairs: the scorer joins the statistics back onto the
    # per-occurrence pair stream, so bg is consumed once for the count
    # table AND once in the scored join — pinned, the corpus tokenize
    # + window pass runs once instead of 3-4 times (r13-opt)
    bg, c, cont = bigram_count_tables(df, text_col, id_col, pin_pairs=True)
    # BOTH joins are left to the optimizer: cont is vocabulary-sized
    # and open-vocabulary web text grows the distinct-token table with
    # the corpus, so by the same rule as the vocab²-bounded pair table
    # (r10 review: an unconditional hint never degrades — it OOMs) the
    # broadcast must be Spark's size-based decision, not a forced
    # hint. Small corpora broadcast either table anyway; an outlier
    # vocabulary degrades to a shuffle join instead of failing.
    stats = c.join(cont, "r")
    scored = bg.join(stats, ["l", "r"]).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum((F.col("n") >= min_count).cast("long"))
        .cast("long")
        .alias("n_known"),
        F.sum("n").cast("long").alias("sum_n"),
        F.sum("cont_r").cast("long").alias("sum_cont"),
    )
    out = df.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("n_known", F.lit(0)).alias("n_known"),
        F.coalesce("sum_n", F.lit(0)).alias("sum_n"),
        F.coalesce("sum_cont", F.lit(0)).alias("sum_cont"),
    )
    return out.withColumn(
        "known_frac",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("n_known") * F.lit(1.0) / F.col("n_bigrams"),
        ),
    )
