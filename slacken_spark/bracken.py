"""Bracken weight generation: simulate every length-L read of every
genome, classify it against the index, count (source → dest) pairs, and
write a Bracken-compatible ``kmer_distrib`` file.

Re-derives the reference's BrackenWeights pipeline
(reference: slacken/BrackenWeights.scala:30-430):

  fragments (≤1 MiB, read-length−1 overlap so every simulated read
  appears exactly once) → per-fragment distinct minimizers → LEFT join
  index records (preserving no-minimizer fragments) → collect LCA lists
  per fragment → re-join fragments → classify every window → counts.

The per-window classification (FragmentWindow, BrackenWeights.scala:35-137
— an O(1)-per-step sliding multiset) is NOT ported imperatively: every
minimizer LCA in a fragment is an ancestor-or-self of the fragment's
source taxon (the LCA fold includes the source genome), so all hit taxa
lie on ONE root path and resolve_tree at confidence 0 reduces to "the
deepest taxon present in the window" (the reference notes the same:
"all the taxa that we hit should be in the same clade",
BrackenWeights.scala:271-273). That makes the whole scan vectorizable:

  - per-position taxon array via np.repeat(taxa, counts);
  - per-window deepest taxon = sliding-window max over structural depth;
  - hit-group gate (min 2 distinct groups) via a difference array +
    cumulative sum.

One numpy pass per fragment instead of a Python loop per read position.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels import bitseq
from slacken_spark.kernels.minimizers import (
    MinimizerConfig,
    split_by_ambiguity,
    supermer_words,
)
from slacken_spark.kernels.taxonomy import NONE, Taxonomy, member_mask_udf

FRAGMENT_MAX = 1024 * 1024  # BrackenWeights.scala:300-303

# Bracken's expected artifact header (BrackenWeights.scala:416).
_DISTRIB_HEADER = "mapped_taxid\tgenome_taxids:kmers_mapped:total_genome_kmers"

# Fragments shorter than this go through the whole-batch kernel
# (_batch_classify_reads); longer ones keep the per-fragment numpy path.
# Re-measured round 6 with realistic per-fragment minimizer lookups
# (400 kb total per shape, local[32]): batch wins at 512 bp
# (0.22 vs 0.30 s), the paths cross at ~700 bp, and per-fragment wins
# from 1 kb up (4 kb: 0.12 vs 0.23 s; 200×5 kb: 0.17 vs 0.53 s;
# 1 MiB: 0.36 vs 0.60 s) — the strided-view window max has a lower
# per-base constant than the batch kernel's struct-key machinery, so
# extending batching upward would REGRESS ~2× exactly where it was
# proposed. The per-fragment loop's ~0.8 ms/call overhead is already
# amortized at this size. Parity of the two paths is pinned on
# mixed-size fixtures in tests/test_bracken.py.
_BATCH_FRAG_CUTOFF = 1024


def split_fragments(df: DataFrame, read_len: int, max_len: int = FRAGMENT_MAX) -> DataFrame:
    """Split (taxon, nucleotides, header, location) rows into ≤max_len
    subfragments overlapping by read_len−1 so every simulated read occurs
    exactly once (TaxonFragment.splitToMaxLength, BrackenWeights.scala:152-165)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                nts = r.nucleotides
                if len(nts) <= max_len:
                    out.append((r.taxon, nts, r.header, r.location))
                else:
                    step = max_len - (read_len - 1)
                    for start in range(0, len(nts) - read_len + 1, step):
                        out.append(
                            (
                                r.taxon,
                                nts[start : start + max_len],
                                r.header,
                                r.location + start,
                            )
                        )
            yield pd.DataFrame(
                out, columns=["taxon", "nucleotides", "header", "location"]
            )

    return df.mapInPandas(
        gen, "taxon int, nucleotides string, header string, location long"
    )


def _words_dtype(n_words: int) -> np.dtype:
    return np.dtype([(f"w{j}", "<i8") for j in range(n_words)])


def _words_struct(words: list[np.ndarray]) -> np.ndarray:
    """(id1..idN) arrays → structured array (lexicographic comparisons
    and searchsorted work tuple-wise)."""
    out = np.empty(len(words[0]), dtype=_words_dtype(len(words)))
    for j, w in enumerate(words):
        out[f"w{j}"] = w
    return out


def lookup_arrays(
    lca_lookup: dict[tuple, int], n_words: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (word-tuple keys, taxa) arrays for vectorized LCA
    resolution; dict keys are n_words-tuples (or bare ints for 1)."""
    n = len(lca_lookup)
    keys = np.empty(n, dtype=_words_dtype(n_words))
    taxa = np.empty(n, dtype=np.int64)
    for i, (k, t) in enumerate(lca_lookup.items()):
        kt = k if isinstance(k, tuple) else (k,)
        keys[i] = kt + (0,) * (n_words - len(kt))
        taxa[i] = t
    order = np.argsort(keys)
    return keys[order], taxa[order]


def fragment_hits(
    nts: str,
    cfg: MinimizerConfig,
    lca_lookup: dict[tuple, int],
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All TaxonHits of a fragment as parallel arrays
    (distinct, abs_position, taxon, count) — TaxonFragment.taxonHits
    (BrackenWeights.scala:192-241). Hit spans tile the fragment length
    contiguously (ambiguous/tail slots included as NONE). ``lca_lookup``
    is keyed by the (id1..idN) word tuple at ``len(cfg.id_cols)`` width
    (trailing words 0 for narrower schemes); resolution is a vectorized
    binary search over the sorted tuple keys, not a per-supermer Python
    loop (~200k supermers per 1 MiB fragment)."""
    codes = bitseq.encode_codes(nts)
    n_ids = len(cfg.id_cols)
    if isinstance(lca_lookup, dict):
        keys, taxa = lookup_arrays(lca_lookup, n_ids)
    else:  # pre-sorted (keys, taxa) arrays — the distributed fast path
        keys, taxa = lca_lookup
    dist_l, pos_l, tax_l, cnt_l = [], [], [], []
    seen_valid = False
    last_key = None
    for st, en, is_valid in split_by_ambiguity(codes, cfg.k):
        if not is_valid:
            dist_l.append(np.zeros(1, dtype=bool))
            pos_l.append(np.array([st], dtype=np.int64))
            tax_l.append(np.full(1, NONE, dtype=np.int64))
            cnt_l.append(np.array([en - st], dtype=np.int64))
            continue
        ws, starts, kmers = supermer_words(codes[st:en], cfg, priority_table)
        n = len(ws[0])
        if n:
            ws = ws + [np.zeros(n, dtype=np.int64)] * (n_ids - len(ws))
            q = _words_struct(ws)
            t = np.full(n, NONE, dtype=np.int64)
            if len(keys):
                idx = np.searchsorted(keys, q)
                ok = idx < len(keys)
                hit = np.zeros(n, dtype=bool)
                hit[ok] = keys[idx[ok]] == q[ok]
                t[hit] = taxa[idx[hit]]
            d = np.empty(n, dtype=bool)
            d[0] = (not seen_valid) or (q[0] != last_key)
            d[1:] = q[1:] != q[:-1]
            last_key = q[-1].copy()
            seen_valid = True
            dist_l.append(d)
            pos_l.append(st + starts)
            tax_l.append(t)
            cnt_l.append(kmers)
        # invalid k-mer slots running into the next segment / past the end
        dist_l.append(np.zeros(1, dtype=bool))
        pos_l.append(np.array([st + (en - st) - (cfg.k - 1)], dtype=np.int64))
        tax_l.append(np.full(1, NONE, dtype=np.int64))
        cnt_l.append(np.array([cfg.k - 1], dtype=np.int64))
    if not dist_l:
        e = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=bool), e, e.copy(), e.copy()
    return (
        np.concatenate(dist_l),
        np.concatenate(pos_l),
        np.concatenate(tax_l),
        np.concatenate(cnt_l),
    )


def classify_all_reads(
    nts: str,
    cfg: MinimizerConfig,
    lca_lookup: dict[int, int],
    taxonomy: Taxonomy,
    read_len: int,
    min_hit_groups: int = 2,
    priority_table: np.ndarray | None = None,
) -> np.ndarray:
    """Destination taxon of every simulated read (one per window start);
    vectorized FragmentWindow (see module docstring)."""
    L = len(nts)
    n_windows = L - read_len + 1
    if n_windows <= 0:
        return np.empty(0, dtype=np.int64)
    dist, pos, tax, cnt = fragment_hits(nts, cfg, lca_lookup, priority_table)
    W = read_len - cfg.k + 1  # k-mers per window
    # per-k-mer-position taxon (spans tile [0, L))
    tax_at = np.repeat(tax, cnt)[: L - cfg.k + 1 + (cfg.k - 1)]
    # deepest-taxon-per-window: order positions by structural depth
    sd = taxonomy.sdepth
    depth_at = np.where(
        (tax_at > 0) & (tax_at < len(sd)), sd[np.clip(tax_at, 0, len(sd) - 1)], 0
    )
    # encode (depth, taxon) into one sortable key; one taxon per depth in
    # a lineage, but keep the taxon to decode the argmax directly
    key = depth_at.astype(np.int64) * (1 << 32) + tax_at
    kv = np.lib.stride_tricks.sliding_window_view(key[: n_windows + W - 1], W)
    best = kv.max(axis=1)
    dest = best & ((1 << 32) - 1)
    # hit-group gate: count distinct-flagged non-NONE hits overlapping
    # each window via difference array
    groups = np.zeros(n_windows + 1, dtype=np.int64)
    sel = dist & (tax != NONE)
    s = pos[sel]
    e = pos[sel] + cnt[sel]
    lo = np.clip(s - W + 1, 0, n_windows - 1)
    hi = np.clip(e, 0, n_windows)
    np.add.at(groups, lo, 1)
    np.add.at(groups, hi, -1)
    n_groups = np.cumsum(groups[:-1])
    dest = np.where(n_groups >= min_hit_groups, dest, NONE)
    return dest.astype(np.int64)


def _batch_classify_reads(
    seqs: list[str],
    cfg: MinimizerConfig,
    lk_words: list[np.ndarray],
    lk_taxa: np.ndarray,
    lk_lens: np.ndarray,
    taxonomy: Taxonomy,
    read_len: int,
    rng: np.random.Generator,
    min_hit_groups: int = 2,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Every simulated read of every fragment in a batch, classified in
    ONE vectorized pass — the whole-batch form of
    :func:`classify_all_reads` (FragmentWindow, BrackenWeights.scala:35-137).

    Replaces the per-fragment Python loop with:
      - one ``batch_span_words`` scan over the ``\\x00``-joined batch;
      - one ``searchsorted`` LCA lookup over (fragment, id1..idN)
        struct keys — each fragment resolves only against its OWN
        joined minimizer list (``lk_*``, flattened per-fragment arrays
        with the -1 no-minimizer sentinel already meaningful);
      - a batch-wide per-position taxon array: positions not covered by
        a supermer span (ambiguous runs, short segments, the k−1 tail
        of every valid segment) stay NONE — identical to the explicit
        NONE slots the per-fragment path emits;
      - ONE sparse-table sliding-window pass (``window_minimizers`` on
        inverted keys) for the deepest-taxon-per-read — O(total·log W)
        vs the per-fragment strided-view max's O(L·W);
      - the hit-group gate as a batch-wide difference array.

    Returns aggregated ``(frag_id, dest, count)`` arrays (the map-side
    combine the shuffle sees).
    """
    from slacken_spark.kernels.minimizers import (
        FLAG_SEQUENCE,
        batch_span_words,
        window_minimizers,
    )

    n_frag = len(seqs)
    e64 = np.empty(0, dtype=np.int64)
    if n_frag == 0:
        return e64, e64.copy(), e64.copy()
    L = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=n_frag)
    nw = np.maximum(L - read_len + 1, 0)  # simulated reads per fragment
    if not nw.any():
        return e64, e64.copy(), e64.copy()
    n_ids = len(cfg.id_cols)
    W = read_len - cfg.k + 1  # k-mers per read window

    counts, words, dist, kmers, flags, pos = batch_span_words(
        seqs, cfg, rng, None, priority_table, return_pos=True
    )
    unit_of = np.repeat(np.arange(n_frag, dtype=np.int64), counts)
    seq_sel = flags == FLAG_SEQUENCE
    u = unit_of[seq_sel]
    p = pos[seq_sel]
    km = kmers[seq_sel]
    ds = dist[seq_sel]

    # ---- LCA lookup on (fragment, words) keys: one sort+searchsorted
    # for the whole batch; -1 sentinel rows (no-minimizer fragments)
    # can never match a real span key ----
    lk_u = np.repeat(np.arange(n_frag, dtype=np.int64), lk_lens)
    lkeys = _words_struct([lk_u] + list(lk_words))
    order = np.argsort(lkeys)
    lkeys = lkeys[order]
    lt = np.asarray(lk_taxa, dtype=np.int64)[order]
    qkeys = _words_struct([u] + [w[seq_sel] for w in words[:n_ids]])
    t = np.full(len(qkeys), NONE, dtype=np.int64)
    if len(lkeys) and len(qkeys):
        idx = np.searchsorted(lkeys, qkeys)
        ok = idx < len(lkeys)
        hit = np.zeros(len(qkeys), dtype=bool)
        hit[ok] = lkeys[idx[ok]] == qkeys[ok]
        t[hit] = lt[idx[hit]]

    # ---- per-position taxon over the unit-major concatenation:
    # NONE everywhere a supermer span doesn't cover ----
    B = np.zeros(n_frag, dtype=np.int64)
    np.cumsum(L[:-1], out=B[1:])
    total = int(L.sum())
    tax_at = np.full(total, NONE, dtype=np.int64)
    if len(p):
        tot_km = int(km.sum())
        span_off = np.cumsum(km) - km
        flat = np.repeat(B[u] + p - span_off, km) + np.arange(
            tot_km, dtype=np.int64
        )
        tax_at[flat] = np.repeat(t, km)

    sd = taxonomy.sdepth
    safe = np.clip(tax_at, 0, len(sd) - 1)
    depth_at = np.where((tax_at > 0) & (tax_at < len(sd)), sd[safe], 0)
    key = depth_at.astype(np.int64) * (1 << 32) + tax_at

    # ---- deepest taxon per read: window MAX as a window MIN over
    # inverted keys (rank order flipped; ties keep the same VALUE) ----
    if total < W:
        return e64, e64.copy(), e64.copy()
    inv = (np.uint64(1) << np.uint64(63)) - key.astype(np.uint64)
    vals, _ = window_minimizers(inv, W)
    best = ((np.uint64(1) << np.uint64(63)) - vals).astype(np.int64)
    C = np.zeros(n_frag, dtype=np.int64)
    np.cumsum(nw[:-1], out=C[1:])
    n_reads = int(nw.sum())
    win_u = np.repeat(np.arange(n_frag, dtype=np.int64), nw)
    j = np.arange(n_reads, dtype=np.int64) - np.repeat(C, nw)
    dest = best[B[win_u] + j] & ((1 << 32) - 1)

    # ---- hit-group gate (min distinct groups per window) ----
    groups = np.zeros(n_reads + 1, dtype=np.int64)
    gsel = ds & (t != NONE) & (nw[u] > 0)
    if gsel.any():
        gu, gs = u[gsel], p[gsel]
        ge = gs + km[gsel]
        lo = np.clip(gs - W + 1, 0, nw[gu] - 1)
        hi = np.clip(ge, 0, nw[gu])
        np.add.at(groups, C[gu] + lo, 1)
        np.add.at(groups, C[gu] + hi, -1)
    n_groups = np.cumsum(groups[:-1])
    dest = np.where(n_groups >= min_hit_groups, dest, NONE)

    # ---- map-side combine: (fragment, dest) → count ----
    comb = win_u * (np.int64(1) << np.int64(32)) + dest
    uq, cnt = np.unique(comb, return_counts=True)
    return uq >> np.int64(32), uq & ((1 << 32) - 1), cnt


class BrackenWeights:
    def __init__(self, index: KeyValueIndex, read_len: int):
        self.index = index
        self.read_len = read_len

    def fragment_minimizers(self, fragments: DataFrame) -> DataFrame:
        """(header, location, id1..) distinct minimizer rows per fragment;
        fragments with no valid minimizer emit the sentinel id=-1 so the
        later left join preserves them (BrackenWeights.scala:333-336).
        -1 is unreachable for real minimizers (packed 2-bit ids and the
        62-bit wide-minimizer hash are both non-negative), so a genuine
        all-A m-mer id of 0 — common under lexicographic ordering — stays
        in the LCA lookup instead of being conflated with the sentinel."""
        cfg_dict = self.index.cfg.to_dict()
        table_bc = self.index.table_bc
        id_cols = self.index.cfg.id_cols

        def gen(batches):
            from slacken_spark.kernels.minimizers import batch_genome_words

            cfg = MinimizerConfig.from_dict(cfg_dict)
            table = table_bc.value if table_bc is not None else None
            for pdf in batches:
                if not len(pdf):
                    continue
                unit_of, words = batch_genome_words(
                    pdf["nucleotides"].tolist(), cfg, priority_table=table
                )
                # distinct (fragment, minimizer) tuples; minimizer-less
                # fragments emit the -1 sentinel so the left join keeps them
                trip = np.unique(np.stack([unit_of, *words], axis=1), axis=0)
                u = trip[:, 0]
                missing = np.setdiff1d(np.arange(len(pdf), dtype=np.int64), u)
                u = np.concatenate([u, missing])
                fill = np.full(len(missing), -1, dtype=np.int64)
                out = {
                    "header": pdf["header"].to_numpy()[u],
                    "location": pd.array(
                        pdf["location"].to_numpy()[u], dtype="int64"
                    ),
                }
                for j, name in enumerate(id_cols):
                    out[name] = pd.array(
                        np.concatenate([trip[:, j + 1], fill]), dtype="int64"
                    )
                yield pd.DataFrame(out)

        ids_ddl = ", ".join(f"{c} long" for c in id_cols)
        return fragments.mapInPandas(
            gen, f"header string, location long, {ids_ddl}"
        )

    def build_weights(
        self,
        genomes: DataFrame,
        labels: DataFrame,
        taxa: set[int] | None = None,
        max_len: int = FRAGMENT_MAX,
        batch_cutoff: int = _BATCH_FRAG_CUTOFF,
    ) -> DataFrame:
        """→ (dest, source, count): every simulated read of every genome
        classified against the index (buildWeights, BrackenWeights.scala:311-353).

        ``batch_cutoff`` routes fragments shorter than it through the
        whole-batch kernel and the rest through the per-fragment path
        (see _BATCH_FRAG_CUTOFF for the measured default); it is a
        plain argument (captured into the executor closure) so tests
        can force either path end-to-end — a module-global monkeypatch
        would not reach executor workers."""
        read_len = self.read_len
        frags0 = genomes.join(F.broadcast(labels), "header").select(
            F.col("taxon"),
            F.regexp_replace("nucleotides", r"\s+", "").alias("nucleotides"),
            "header",
            F.coalesce(F.col("location"), F.lit(0)).alias("location")
            if "location" in genomes.columns
            else F.lit(0).cast("long").alias("location"),
        )
        if taxa is not None:
            # Broadcast-mask membership, never a literal `isin`: a
            # full-library build passes the whole label set (10⁴–10⁵
            # taxa on refseq) — the reference restricts through a
            # broadcast BitSet (BrackenWeights.scala:318-326).
            # Size to max(n_nodes, max(taxa)+1): the reference's BitSet
            # (BrackenWeights.scala:318) matches genome labels whose taxid
            # is absent from the taxonomy, so a mask clipped to n_nodes
            # would silently drop those genomes from the simulation.
            n = max(
                self.index.taxonomy.n_nodes,
                (max(taxa) + 1) if taxa else 0,
            )
            mask = np.zeros(n, dtype=bool)
            ids = np.asarray([t for t in taxa if t >= 0], dtype=np.int64)
            mask[ids] = True
            member = member_mask_udf(self.index.spark, mask)
            frags0 = frags0.where(member(F.col("taxon")))
        fragments = split_fragments(frags0, read_len, max_len)

        id_cols = self.index.cfg.id_cols
        min_cols = [f"minimizers_{c}" for c in id_cols]
        id_mins = self.fragment_minimizers(fragments)
        joined = (
            id_mins.join(self.index.records, self.index.cfg.key_cols, "left")
            .groupBy("header", "location")
            .agg(
                *[
                    F.collect_list(c).alias(mc)
                    for c, mc in zip(id_cols, min_cols)
                ],
                F.collect_list(F.coalesce(F.col("taxon"), F.lit(NONE))).alias("taxa"),
            )
        )
        with_frags = joined.join(fragments, ["header", "location"]).select(
            "header",
            "location",
            "taxon",
            "nucleotides",
            *min_cols,
            "taxa",
        )

        cfg_dict = self.index.cfg.to_dict()
        bc_tax = self.index.spark.sparkContext.broadcast(self.index.taxonomy)
        table_bc2 = self.index.table_bc

        def gen(batches):
            cfg = MinimizerConfig.from_dict(cfg_dict)
            tax: Taxonomy = bc_tax.value
            table = table_bc2.value if table_bc2 is not None else None
            rng = np.random.default_rng(0x5EED)
            for pdf in batches:
                # Hybrid routing (re-measured round 6, see
                # _BATCH_FRAG_CUTOFF): fragments under ~1 kb are
                # dominated by per-call Python overhead — the
                # whole-batch kernel scans them all in one \x00-joined
                # pass. From 1 kb up the per-fragment numpy path wins
                # (2-3× at 4 kb-1 MiB): its strided-view window max
                # has a lower per-base constant than the batch
                # kernel's struct-key lookup. Either way the shuffle
                # sees only (source, dest, n) partials — a 1 MiB
                # fragment simulates ~10⁶ reads but hits a handful of
                # distinct dest taxa (the reference also aggregates in
                # the kernel, BrackenWeights.scala:345-353).
                src_a, dst_a, cnt_a = [], [], []
                nts = pdf["nucleotides"]
                is_small = nts.str.len().to_numpy() < batch_cutoff
                small = pdf[is_small]
                if len(small):
                    lk_lens = np.fromiter(
                        (len(x) for x in small[min_cols[0]]),
                        dtype=np.int64,
                        count=len(small),
                    )
                    tot = int(lk_lens.sum())
                    lk_words = [
                        np.concatenate(
                            [np.asarray(x, dtype=np.int64) for x in small[mc]]
                        )
                        if tot
                        else np.empty(0, dtype=np.int64)
                        for mc in min_cols
                    ]
                    lk_taxa = (
                        np.concatenate(
                            [np.asarray(x, dtype=np.int64) for x in small["taxa"]]
                        )
                        if tot
                        else np.empty(0, dtype=np.int64)
                    )
                    frag_ids, dests, cnts = _batch_classify_reads(
                        small["nucleotides"].tolist(),
                        cfg,
                        lk_words,
                        lk_taxa,
                        lk_lens,
                        tax,
                        read_len,
                        rng,
                        priority_table=table,
                    )
                    src_a.append(small["taxon"].to_numpy()[frag_ids])
                    dst_a.append(dests)
                    cnt_a.append(cnts)
                for r in pdf[~is_small].itertuples(index=False):
                    ws = [
                        np.asarray(getattr(r, mc), dtype=np.int64)
                        for mc in min_cols
                    ]
                    tt = np.asarray(r.taxa, dtype=np.int64)
                    keep = ws[0] != -1  # drop the no-minimizer sentinel
                    keys = _words_struct([w[keep] for w in ws])
                    order = np.argsort(keys)
                    dests = classify_all_reads(
                        r.nucleotides, cfg, (keys[order], tt[keep][order]),
                        tax, read_len, priority_table=table,
                    )
                    if len(dests):
                        uq, n = np.unique(dests, return_counts=True)
                        src_a.append(np.full(len(uq), r.taxon, dtype=np.int64))
                        dst_a.append(uq)
                        cnt_a.append(n)
                empty = np.empty(0, dtype=np.int64)
                yield pd.DataFrame(
                    {
                        "source": pd.array(
                            np.concatenate(src_a) if src_a else empty,
                            dtype="int32",
                        ),
                        "dest": pd.array(
                            np.concatenate(dst_a) if dst_a else empty,
                            dtype="int32",
                        ),
                        "count": pd.array(
                            np.concatenate(cnt_a) if cnt_a else empty,
                            dtype="int64",
                        ),
                    }
                )

        pairs = with_frags.mapInPandas(gen, "source int, dest int, count long")
        return pairs.groupBy("dest", "source").agg(
            F.sum("count").alias("count")
        )

    def build_weights_gradually(
        self,
        genomes: DataFrame,
        labels: DataFrame,
        taxa: set[int],
        temp_location: str,
        chunks: int = 5,
    ) -> DataFrame:
        """Fault-tolerant batched build: append per-chunk results to a
        temp parquet so an interrupted node costs one chunk, not the job
        (BrackenWeights.scala:359-374)."""
        ts = sorted(taxa)
        step = max(len(ts) // chunks, 1)
        for i in range(0, len(ts), step):
            chunk = set(ts[i : i + step])
            self.build_weights(genomes, labels, chunk).write.mode("append").parquet(
                temp_location
            )
        return self.index.spark.read.parquet(temp_location)

    def group_data(self, source_dest_counts: DataFrame) -> DataFrame:
        """(dest, sources[], counts[], totals[]) (BrackenWeights.scala:377-387)."""
        by_source = source_dest_counts.groupBy("source").agg(
            F.sum("count").alias("totalReads")
        )
        return (
            source_dest_counts.join(by_source, "source")
            .groupBy("dest")
            .agg(
                F.collect_list("source").alias("sources"),
                F.collect_list("count").alias("counts"),
                F.collect_list("totalReads").alias("totals"),
            )
        )

    def kmer_distrib_df(self, grouped: DataFrame) -> DataFrame:
        """(dest, line) — one kmer_distrib data row per destination
        taxon, rendered executor-side (BrackenWeights.scala:413-430).

        This is the scale path for the artifact: a high-level dest
        (ultimately the root) aggregates every genome in the library,
        so its line grows with library size and the full artifact must
        never be materialized on the driver. All downstream consumers
        (driver-list convenience, single-file writer, digest queries)
        derive from this one definition."""
        line = F.concat_ws(
            "\t",
            F.col("dest"),
            F.array_join(
                F.transform(
                    F.arrays_zip("sources", "counts", "totals"),
                    lambda z: F.concat_ws(
                        ":", z["sources"], z["counts"], z["totals"]
                    ),
                ),
                " ",
            ),
        )
        return grouped.select(F.col("dest"), line.alias("line"))

    def kmer_distrib_lines(self, grouped: DataFrame) -> list[str]:
        """Driver-side kmer_distrib rows — small-output convenience over
        :meth:`kmer_distrib_df` (tests, interactive inspection). Large
        libraries should use :meth:`write_kmer_distrib`."""
        rows = self.kmer_distrib_df(grouped).select("line").collect()
        return [_DISTRIB_HEADER] + [r["line"] for r in rows]

    def write_kmer_distrib(self, grouped: DataFrame, output_location: str) -> None:
        """Write the single-file kmer_distrib artifact WITHOUT routing
        its bytes through the driver.

        A union-with-header (sort key 0) is repartition(1)-ed so ONE
        executor task streams the text file — Bracken expects a single
        TSV with the header first, and a single-file sink is inherently
        single-writer, so the one-task final stage is the floor, not a
        bottleneck; everything upstream (the weights build and the
        group_data shuffle) stays distributed. The driver's only IO is
        renaming the part file over the target (fsio.move, same-FS by
        construction: the temp dir lives next to the target)."""
        from slacken_spark import fsio

        spark = self.index.spark
        out = fsio.absolutize(output_location)
        tmp = out.rstrip("/") + ".__tmp__"
        header = spark.createDataFrame(
            [(0, _DISTRIB_HEADER)], "k int, value string"
        )
        body = self.kmer_distrib_df(grouped).select(
            F.lit(1).alias("k"), F.col("line").alias("value")
        )
        try:
            (
                header.unionByName(body)
                .repartition(1)
                .sortWithinPartitions("k")
                .select("value")
                .write.mode("overwrite")
                # pin compression OFF: a session/Hadoop-level output
                # codec would write a compressed part file that the
                # rename promotes under the uncompressed artifact name
                # — a kmer_distrib Bracken cannot parse
                .option("compression", "none")
                .text(tmp)
            )
            parts = fsio.list_dir(tmp, prefix="part-")
            if len(parts) != 1:  # repartition(1) guarantees one
                raise RuntimeError(f"expected 1 part file in {tmp}, got {parts}")
            fsio.move(parts[0], out)
        finally:
            # also reached when the WRITE itself dies mid-way — a
            # partial temp dir must not linger beside the artifact
            fsio.remove_dir(tmp)

    def build_and_write(
        self,
        genomes: DataFrame,
        labels: DataFrame,
        taxa: set[int],
        output_location: str,
    ) -> None:
        weights = self.build_weights(genomes, labels, taxa).persist()
        try:
            self.write_kmer_distrib(self.group_data(weights), output_location)
        finally:
            weights.unpersist()
