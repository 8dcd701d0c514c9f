"""Taxonomy tree kernel: dense-int-id tree over numpy parent arrays.

Re-derives the semantics of the reference's driver-side taxonomy
(reference: slacken/Taxonomy.scala:149-320, LowestCommonAncestor.scala:33-146)
as vectorized numpy. The tree lives on the driver and is broadcast to
executors; all per-row operations (LCA folds, depth lookups, resolve_tree)
run as array programs over Arrow batches, never per-row Python.

Sentinels (slacken/package.scala:28-31, Taxonomy.scala:30-31):
  NONE = 0 (unclassified / missing), ROOT = 1,
  AMBIGUOUS_SPAN = -1, MATE_PAIR_BORDER = -2.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

NONE = 0
ROOT = 1
AMBIGUOUS_SPAN = -1
MATE_PAIR_BORDER = -2

# Standardised rank depths (Taxonomy.scala rank model; FIXTURES.md §1):
RANKS = (
    "root",
    "superkingdom",
    "kingdom",
    "phylum",
    "class",
    "order",
    "family",
    "genus",
    "species",
)
RANK_DEPTH = {r: i for i, r in enumerate(RANKS)}
NO_RANK = -1


def numerical_rank_to_str(depth: int) -> str:
    """Human-readable rank title for a standardised depth, '???' when
    unknown (numericalRankToStrUdf, GenomeLibrary.scala:62-65)."""
    return RANKS[depth] if 0 <= depth < len(RANKS) else "???"


def member_mask_udf(spark, mask: np.ndarray):
    """Boolean pandas UDF ``taxon -> taxon ∈ mask`` over a broadcast
    numpy bool array — the executor-side replacement for taxonomy-sized
    literal ``isin`` lists (the reference likewise checks membership
    through the broadcast taxonomy, Dynamic.scala:95-107,
    KeyValueIndex.scala:118-121). Out-of-range and null ids are False."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(np.asarray(mask, dtype=bool))

    @pandas_udf("boolean")
    def member(t: pd.Series) -> pd.Series:
        m = bc.value
        tv = t.fillna(-1).to_numpy(dtype=np.int64)
        ok = (tv >= 0) & (tv < len(m))
        out = np.zeros(len(tv), dtype=bool)
        out[ok] = m[tv[ok]]
        return pd.Series(out)

    return member


def ancestors_udf(spark, taxonomy: "Taxonomy"):
    """``array<long>`` pandas UDF ``taxon -> path_to_root(taxon)`` over the
    broadcast parent array — the executor half of a distributed clade
    rollup (explode the ancestor path, then groupBy-sum), replacing a
    driver-side TreeAggregator dict (KrakenReport.scala:26-41 runs the
    same addition per path-to-root; here the explode + partial aggregation
    distribute it). Out-of-range / null / sentinel ids yield [].

    Vectorized per Arrow batch: one parent-gather per tree level fills a
    (rows × max_depth) matrix; per-row work is only the final slice."""
    from pyspark.sql.functions import pandas_udf

    par_bc = spark.sparkContext.broadcast(taxonomy.parents.astype(np.int64))
    sd_bc = spark.sparkContext.broadcast(taxonomy.sdepth.astype(np.int32))

    @pandas_udf("array<long>")
    def ancestors(t: pd.Series) -> pd.Series:
        par = par_bc.value
        sdepth = sd_bc.value
        tv = t.fillna(0).to_numpy(dtype=np.int64)
        valid = (tv > 0) & (tv < len(par))
        cur = np.where(valid, tv, 0)
        # structural depth == path-to-root length (ROOT has depth 1)
        lens = sdepth[cur] * valid
        maxd = int(lens.max()) if len(lens) else 0
        mat = np.zeros((len(tv), maxd), dtype=np.int64)
        for level in range(maxd):
            mat[:, level] = cur
            cur = par[cur]
        return pd.Series([mat[i, : lens[i]].tolist() for i in range(len(tv))])

    return ancestors


@dataclass
class Taxonomy:
    """Array-of-parents taxonomy tree.

    parents[t] is the parent of t; parents[ROOT] == NONE; undefined ids
    have parents[t] == NONE and are considered "not in the tree"
    (is_defined == False) except ROOT itself.
    """

    parents: np.ndarray  # int32, parent id per taxon id
    rank_depths: np.ndarray | None = None  # int8 standard depth or NO_RANK
    names: list[str] | None = None
    primary: np.ndarray | None = None  # merged.dmp old→new redirect (identity default)
    _sdepth: np.ndarray = field(default=None, repr=False)  # structural depth cache
    _children: list[list[int]] | None = field(default=None, repr=False)

    # ---------------- constructors ----------------

    @classmethod
    def from_edges(
        cls,
        ids: np.ndarray | list[int],
        parent_ids: np.ndarray | list[int],
        ranks: list[str] | None = None,
        names: dict[int, str] | None = None,
        merged: dict[int, int] | None = None,
    ) -> "Taxonomy":
        ids = np.asarray(ids, dtype=np.int64)
        parent_ids = np.asarray(parent_ids, dtype=np.int64)
        n = int(max(ids.max(initial=ROOT), parent_ids.max(initial=ROOT))) + 1
        parents = np.zeros(n, dtype=np.int32)
        parents[ids] = parent_ids
        parents[ROOT] = NONE  # nodes.dmp has 1|1; normalize to NONE (Taxonomy.scala:158)
        rank_depths = np.full(n, NO_RANK, dtype=np.int8)
        if ranks is not None:
            for t, r in zip(ids, ranks):
                rank_depths[t] = RANK_DEPTH.get(r, NO_RANK)
        rank_depths[ROOT] = 0
        name_arr = None
        if names:
            name_arr = [""] * n
            for t, nm in names.items():
                name_arr[t] = nm
        primary = np.arange(n, dtype=np.int64)
        if merged:
            for old, new in merged.items():
                if old < n:
                    primary[old] = new
        return cls(parents, rank_depths, name_arr, primary)

    @classmethod
    def load(cls, nodes_dmp: str, names_dmp: str | None = None, merged_dmp: str | None = None) -> "Taxonomy":
        """Parse NCBI dmp files (pipe-delimited '\\t|\\t'); driver-side.

        Matches Taxonomy.load (Taxonomy.scala:116-137): nodes give
        (id, parent, rank); names keep only 'scientific name' rows;
        merged gives old→new redirects.
        """
        from slacken_spark.fsio import read_lines

        ids, parents, ranks = [], [], []
        for line in read_lines(nodes_dmp):
            parts = [p.strip() for p in line.split("|")]
            ids.append(int(parts[0]))
            parents.append(int(parts[1]))
            ranks.append(parts[2])
        names = {}
        if names_dmp:
            for line in read_lines(names_dmp):
                parts = [p.strip() for p in line.split("|")]
                if len(parts) > 3 and parts[3] == "scientific name":
                    names[int(parts[0])] = parts[1]
        merged = {}
        if merged_dmp:
            for line in read_lines(merged_dmp):
                parts = [p.strip() for p in line.split("|")]
                if parts and parts[0]:
                    merged[int(parts[0])] = int(parts[1])
        return cls.from_edges(ids, parents, ranks, names, merged)

    # ---------------- persistence (index sidecar) ----------------

    def save(self, dir_path: str) -> None:
        """Persist next to an index (the reference copies the dmp files,
        Taxonomy.scala:142-147; we store the parsed arrays directly).
        Any-FS: dir_path may be a file://, s3://, hdfs://, gs:// URI or
        a bare local path (HDFSUtil.scala:76-98 contract)."""
        import json
        import posixpath

        from slacken_spark.fsio import any_fs, write_text

        filesystem, p = any_fs(dir_path)
        with filesystem.open_output_stream(
            posixpath.join(p, "taxonomy.npz")
        ) as fh:
            np.savez_compressed(
                fh,
                parents=self.parents,
                rank_depths=(
                    self.rank_depths
                    if self.rank_depths is not None
                    else np.full(self.n_nodes, NO_RANK, dtype=np.int8)
                ),
                primary=(
                    self.primary
                    if self.primary is not None
                    else np.arange(self.n_nodes, dtype=np.int64)
                ),
            )
        if self.names is not None:
            write_text(
                posixpath.join(dir_path, "names.json"), json.dumps(self.names)
            )

    @classmethod
    def load_dir(cls, dir_path: str) -> "Taxonomy":
        import io
        import json
        import posixpath

        from slacken_spark.fsio import any_fs, exists, read_text

        filesystem, p = any_fs(dir_path)
        with filesystem.open_input_stream(
            posixpath.join(p, "taxonomy.npz")
        ) as fh:
            # np.load wants a seekable file; zip members need random access
            z = np.load(io.BytesIO(fh.read()))
        names = None
        names_path = posixpath.join(dir_path, "names.json")
        if exists(names_path):
            names = json.loads(read_text(names_path))
        return cls(z["parents"], z["rank_depths"], names, z["primary"])

    # ---------------- basic structure ----------------

    @property
    def n_nodes(self) -> int:
        return len(self.parents)

    def is_defined(self, t: int) -> bool:
        return t == ROOT or (0 < t < self.n_nodes and self.parents[t] != NONE)

    def defined_mask(self) -> np.ndarray:
        """Boolean mask over taxon ids: is_defined, vectorized. Broadcast
        this (a few MB even for NCBI-sized taxonomies) instead of
        materializing millions of ids into a literal ``isin`` list."""
        mask = np.zeros(self.n_nodes, dtype=bool)
        if self.n_nodes > 1:
            mask[1:] = self.parents[1:] != NONE
            mask[ROOT] = True
        return mask

    def depth_vector(self) -> np.ndarray:
        """Standardised rank depth per taxon id, vectorized ``depth``:
        nearest ranked ancestor's depth, -1 when no ranked ancestor.
        O(n · max-unranked-run) with whole-array numpy steps."""
        n = self.n_nodes
        out = np.full(n, -1, dtype=np.int32)
        if n == 0:
            return out
        rd = (
            self.rank_depths.astype(np.int32)
            if self.rank_depths is not None
            else np.full(n, NO_RANK, dtype=np.int32)
        )
        cur = np.arange(n, dtype=np.int64)
        alive = np.arange(n, dtype=np.int64)
        while len(alive):
            c = cur[alive]
            ranked = rd[c] != NO_RANK
            out[alive[ranked]] = rd[c[ranked]]
            alive = alive[~ranked]
            cur[alive] = self.parents[cur[alive]]
            alive = alive[cur[alive] != NONE]
        return out

    @property
    def sdepth(self) -> np.ndarray:
        """Structural depth: NONE=0, ROOT=1, child = parent + 1.

        Computed once by pointer-jumping (O(n log d)), used to vectorize LCA.
        """
        if self._sdepth is None:
            n = self.n_nodes
            d = np.zeros(n, dtype=np.int32)
            cur = self.parents.astype(np.int64).copy()
            alive = np.arange(n, dtype=np.int64)
            # every node at index>0 with a parent chain terminating at NONE
            d[1:] = 1
            d[0] = 0
            while True:
                nz = cur[alive] != NONE
                alive = alive[nz]
                if len(alive) == 0:
                    break
                d[alive] += 1
                cur[alive] = self.parents[cur[alive]]
            self._sdepth = d
        return self._sdepth

    @property
    def children(self) -> list[list[int]]:
        if self._children is None:
            ch: list[list[int]] = [[] for _ in range(self.n_nodes)]
            for t in range(2, self.n_nodes):
                p = int(self.parents[t])
                if p != NONE:
                    ch[p].append(t)
            self._children = ch
        return self._children

    def path_to_root(self, t: int) -> list[int]:
        """All steps to ROOT including t itself (Taxonomy.scala:204-215)."""
        out = []
        while t != NONE:
            out.append(t)
            t = int(self.parents[t])
        return out

    def depth(self, t: int) -> int:
        """Standardised rank depth: nearest ranked ancestor's depth
        (Taxonomy.scala:222-228). NONE → -1."""
        while t != NONE:
            if self.rank_depths is not None and self.rank_depths[t] != NO_RANK:
                return int(self.rank_depths[t])
            t = int(self.parents[t])
        return -1

    def has_ancestor(self, t: int, ancestor: int) -> bool:
        while t != NONE:
            if t == ancestor:
                return True
            t = int(self.parents[t])
        return False

    def ancestor_at_level(self, t: int, rank_depth: int) -> int:
        """First node in path-to-root whose standardised depth equals
        rank_depth; NONE if absent (Taxonomy.scala:269-275)."""
        while t != NONE:
            if self.depth(t) == rank_depth:
                return t
            t = int(self.parents[t])
        return NONE

    def is_leaf(self, t: int) -> bool:
        """No children (Taxonomy.scala:171-172)."""
        return len(self.children[t]) == 0 if 0 < t < self.n_nodes else False

    def missing_steps_to_root(self, t: int) -> list[int]:
        """Standard levels (superkingdom..species) absent from the
        node's path to root (missingStepsToRoot, Taxonomy.scala:300-306)."""
        found = {self.depth(p) for p in self.path_to_root(t)}
        return [
            d
            for d in range(RANK_DEPTH["superkingdom"], RANK_DEPTH["species"] + 1)
            if d not in found
        ]

    def taxa_with_ancestors(self, taxa) -> set[int]:
        out: set[int] = set()
        for t in taxa:
            while t != NONE and t not in out:
                out.add(t)
                t = int(self.parents[t])
        return out

    def taxa_with_descendants(self, taxa) -> set[int]:
        out = set(taxa)
        stack = list(taxa)
        ch = self.children
        while stack:
            t = stack.pop()
            for c in ch[t]:
                if c not in out:
                    out.add(c)
                    stack.append(c)
        return out

    # ---------------- LCA ----------------

    def lca(self, a: int, b: int) -> int:
        """Pairwise LCA; NONE acts as identity; unrelated taxa → ROOT
        (LowestCommonAncestor.scala:50-78 semantics)."""
        return int(self.lca_vec(np.asarray([a]), np.asarray([b]))[0])

    def lca_vec(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Vectorized pairwise LCA over aligned arrays.

        Depth-equalize then lift in lockstep — O(max_depth) vector steps
        for the whole batch instead of O(path²) per pair.
        """
        a = np.asarray(a, dtype=np.int64).copy()
        b = np.asarray(b, dtype=np.int64).copy()
        par = self.parents
        sd = self.sdepth
        a_none = a == NONE
        b_none = b == NONE
        # clamp out-of-range ids to NONE semantics (undefined → path [t])
        out = np.where(a_none, b, np.where(b_none, a, NONE)).astype(np.int64)
        active = ~(a_none | b_none)
        if active.any():
            aa = a[active]
            bb = b[active]
            da = sd[aa]
            db = sd[bb]
            # lift deeper side to equal depth
            while True:
                lift_a = da > db
                lift_b = db > da
                if not (lift_a.any() or lift_b.any()):
                    break
                aa = np.where(lift_a, par[aa], aa)
                bb = np.where(lift_b, par[bb], bb)
                da = np.where(lift_a, da - 1, da)
                db = np.where(lift_b, db - 1, db)
            # lockstep lift until equal
            while True:
                ne = aa != bb
                if not ne.any():
                    break
                aa = np.where(ne, par[aa], aa)
                bb = np.where(ne, par[bb], bb)
            res = aa
            # disjoint trees met at NONE → ROOT (reference returns ROOT)
            res = np.where(res == NONE, ROOT, res)
            out[active] = res
        return out

    def lca_fold(self, taxa: np.ndarray) -> int:
        """Fold LCA over a set of taxa (the index-build aggregation,
        KeyValueIndex.scala:85-93). NONE is the identity (zero)."""
        arr = np.asarray(taxa, dtype=np.int64)
        arr = arr[arr != NONE]
        if len(arr) == 0:
            return NONE
        while len(arr) > 1:
            half = len(arr) // 2
            merged = self.lca_vec(arr[:half], arr[half : 2 * half])
            arr = np.concatenate([merged, arr[2 * half :]])
        return int(arr[0])

    def segment_lca(self, segment_ids: np.ndarray, taxa: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """LCA fold per segment, fully vectorized across segments.

        ``segment_ids`` must be sorted (rows of equal id adjacent).
        Returns (unique_segment_ids, lca_per_segment). Each round merges
        adjacent pairs within every segment simultaneously, so the number
        of vector rounds is ceil(log2(max segment size)).
        """
        seg = np.asarray(segment_ids)
        tx = np.asarray(taxa, dtype=np.int64)
        while True:
            same_as_prev = np.zeros(len(seg), dtype=bool)
            same_as_prev[1:] = seg[1:] == seg[:-1]
            if not same_as_prev.any():
                return seg, tx
            # pair each row with its predecessor when same segment, taking
            # every other such row to avoid chaining within one round
            idx = np.flatnonzero(same_as_prev)
            # Overlapping merges (consecutive idx) must not chain within one
            # round: keep alternate positions within each consecutive run.
            starts = np.ones(len(idx), dtype=bool)
            starts[1:] = np.diff(idx) != 1
            run_first = np.maximum.accumulate(np.where(starts, np.arange(len(idx)), 0))
            idx = idx[(np.arange(len(idx)) - run_first) % 2 == 0]
            merged = self.lca_vec(tx[idx - 1], tx[idx])
            tx[idx - 1] = merged
            mask = np.ones(len(seg), dtype=bool)
            mask[idx] = False
            seg = seg[mask]
            tx = tx[mask]

    # ---------------- Spark integration ----------------

    def lca_list_udf(self, spark):
        """Pandas UDF ``array<long> -> long``: LCA fold of each row's taxon
        list. One Python call per Arrow batch (not per group): flatten the
        batch's lists into one array + segment ids, run the vectorized
        segment_lca, and scatter results back. This is the scale path for
        the index-build aggregation (KeyValueIndex.scala:85-93) —
        ``groupBy(keys).agg(collect_list(taxon))`` then this UDF.
        """
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(self)

        @pandas_udf("long")
        def lca_of_list(lists: pd.Series) -> pd.Series:
            tax = bc.value
            lens = lists.map(len).to_numpy()
            if lens.sum() == 0:
                return pd.Series(np.zeros(len(lists), dtype=np.int64))
            flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in lists])
            seg = np.repeat(np.arange(len(lists)), lens)
            keep = flat != NONE
            seg_k, flat_k = seg[keep], flat[keep]
            out = np.full(len(lists), NONE, dtype=np.int64)
            if len(flat_k):
                useg, lcas = tax.segment_lca(seg_k, flat_k)
                out[useg] = lcas
            return pd.Series(out)

        return lca_of_list

    # ---------------- batch resolve_tree ----------------

    def resolve_tree_batch(
        self,
        seg: np.ndarray,
        taxa: np.ndarray,
        counts: np.ndarray,
        required: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized resolve_tree over many reads at once.

        Inputs are hit entries sorted by ``seg`` (read id): for each
        read, (taxon → count) pairs plus the read's required score.
        ``required`` is aligned to the UNIQUE seg values (ascending).
        Returns (unique_segs, winner_taxon_per_seg).

        Same semantics as resolve_tree (argmax of root-path score,
        ties → LCA, then lift until the clade score meets ``required``),
        but O(depth) vector passes over the whole Arrow batch instead of
        Python loops per read — the classification throughput path.
        """
        seg = np.asarray(seg, dtype=np.int64)
        taxa = np.asarray(taxa, dtype=np.int64)
        counts = np.asarray(counts, dtype=np.int64)
        usegs, seg_start = np.unique(seg, return_index=True)
        required = np.asarray(required, dtype=np.float64)
        if len(usegs) == 0:
            return usegs, np.empty(0, dtype=np.int64)
        par = self.parents
        sd = self.sdepth
        M = np.int64(1) << np.int64(32)
        keys = seg * M + taxa
        order = np.argsort(keys, kind="stable")
        Ks, Cs = keys[order], counts[order]

        def count_of(seg_ids, nodes):
            """counts.get((seg, node), 0) vectorized via searchsorted."""
            k = seg_ids * M + nodes
            p = np.searchsorted(Ks, k)
            p_c = np.minimum(p, len(Ks) - 1)
            return np.where(Ks[p_c] == k, Cs[p_c], 0)

        # ---- path scores per entry ----
        score = np.zeros(len(taxa), dtype=np.int64)
        cur = taxa.copy()
        active = cur != NONE
        while active.any():
            score[active] += count_of(seg[active], cur[active])
            cur[active] = par[cur[active]]
            active = cur != NONE

        # ---- per-read argmax with LCA tie fold ----
        seg_max = np.maximum.reduceat(score, seg_start)
        is_max = score == np.repeat(seg_max, np.diff(np.append(seg_start, len(seg))))
        w_seg, w_tax = self.segment_lca(seg[is_max], taxa[is_max])
        winners = np.zeros(len(usegs), dtype=np.int64)
        winners[np.searchsorted(usegs, w_seg)] = w_tax
        # taxa with score 0 (only the NONE key) resolve to NONE — matches
        # scalar (lca(0,0)=0)
        winners[seg_max == 0] = NONE

        # ---- confidence lift ----
        max_score = count_of(usegs, winners)
        lifting = (winners != NONE) & (max_score < required)
        while lifting.any():
            # clade score of each active read's winner: sum of counts of
            # entries whose taxon lifts to the winner's depth as the winner
            act_idx = np.flatnonzero(lifting)
            entry_act = np.isin(seg, usegs[act_idx])
            e_seg = seg[entry_act]
            e_tax = taxa[entry_act]
            e_cnt = counts[entry_act]
            w_for_entry = winners[np.searchsorted(usegs, e_seg)]
            target_d = sd[w_for_entry]
            anc = e_tax.copy()
            deeper = (anc != NONE) & (sd[anc] > target_d)
            while deeper.any():
                anc[deeper] = par[anc[deeper]]
                deeper = (anc != NONE) & (sd[anc] > target_d)
            match = (anc == w_for_entry) & (e_tax != NONE)
            clade = np.zeros(len(usegs), dtype=np.int64)
            np.add.at(clade, np.searchsorted(usegs, e_seg[match]), e_cnt[match])
            met = lifting & (clade >= required)
            # met reads keep their winner and stop lifting
            lifting = lifting & ~met
            # the rest move up (possibly off the tree → NONE, stop)
            winners[lifting] = par[winners[lifting]]
            ran_off = lifting & (winners == NONE)
            lifting = lifting & ~ran_off
        return usegs, winners

    # ---------------- resolve_tree (Kraken 2 classify) ----------------

    def resolve_tree(self, hit_counts: dict[int, int], required_score: float) -> int:
        """Kraken 2 read classification (LowestCommonAncestor.scala:101-146).

        Score each hit taxon by summing hit counts along its root path;
        the max-scoring taxon wins, ties resolve to their LCA. Then lift
        the winner toward ROOT until its clade's hit count reaches
        ``required_score`` (may run off the tree → NONE).
        """
        max_taxon = 0
        max_score = 0
        for taxon in hit_counts:
            node = taxon
            score = 0
            while node != NONE:
                score += hit_counts.get(node, 0)
                node = int(self.parents[node])
            if score > max_score:
                max_taxon, max_score = taxon, score
            elif score == max_score:
                max_taxon = self.lca(max_taxon, taxon)
        max_score = hit_counts.get(max_taxon, 0)
        while max_taxon != NONE and max_score < required_score:
            max_score = 0
            for taxon, cnt in hit_counts.items():
                if self.has_ancestor(taxon, max_taxon):
                    max_score += cnt
            if max_score >= required_score:
                return max_taxon
            max_taxon = int(self.parents[max_taxon])
        return max_taxon
