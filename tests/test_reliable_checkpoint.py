"""The reliable-checkpoint escape hatch (VERDICT r12 item 3).

Every lineage-pin site routes through ``session.pin``; by default that
is executor-local ``localCheckpoint`` (zero external storage, query
retry on executor loss). Spot/preemptible deployments set
``spark.slacken.reliableCheckpoint=true`` plus a checkpoint dir and the
SAME sites become reliable ``checkpoint()`` — these tests prove the
routing is live (checkpoint files actually appear) and that results are
identical under both postures for one contraction-loop family and one
two-level global-order family (the two heaviest pin consumers).
"""

import os

import pytest
from pyspark.sql import functions as F

from slacken_spark.session import RELIABLE_CHECKPOINT_CONF, pin


def _count_ckpt_files(root: str) -> int:
    n = 0
    for _dir, _sub, files in os.walk(root):
        n += len(files)
    return n


@pytest.fixture()
def reliable(spark, tmp_path):
    """Flip the session into reliable-checkpoint posture; restore after.

    The checkpoint dir deliberately stays set after the test — ``pin``
    ignores it whenever the conf is false, which the teardown restores.
    """
    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        yield ckpt
    finally:
        spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")


def test_pin_routes_to_reliable_checkpoint(spark, reliable):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    before = _count_ckpt_files(reliable)
    out = pin(df, eager=True)
    assert out.count() == 100
    assert _count_ckpt_files(reliable) > before, (
        "conf + checkpoint dir set but no checkpoint files appeared — "
        "pin did not route to reliable checkpoint()"
    )


def test_pin_defaults_to_local_checkpoint(spark, tmp_path):
    """Without the conf, pin never writes to the checkpoint dir even
    when one is set."""
    ckpt = str(tmp_path / "ckpt2")
    spark.sparkContext.setCheckpointDir(ckpt)
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")
    df = spark.range(50)
    out = pin(df, eager=True)
    assert out.count() == 50
    assert _count_ckpt_files(ckpt) == 0


def _chain_pairs(spark, n=60):
    """A scattered chain (high diameter) plus a triangle and isolated
    doubles — the contraction engine's standard adversarial mix."""
    rows = [(i, i + 1) for i in range(n)]  # one n-chain
    rows += [(1000, 1001), (1001, 1002), (1000, 1002)]  # triangle
    rows += [(2000, 2001), (3000, 3001)]
    return spark.createDataFrame(rows, "id_a: long, id_b: long")


def test_contraction_identical_under_reliable_checkpoint(spark, reliable):
    from slacken_spark.functions.dedup import connected_components_contract

    pairs = _chain_pairs(spark)
    got = sorted(
        connected_components_contract(pairs, loop_partitions=4)
        .collect()
    )
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")
    want = sorted(
        connected_components_contract(pairs, loop_partitions=4)
        .collect()
    )
    assert got == want
    assert _count_ckpt_files(reliable) > 0, (
        "the contraction loop ran in reliable posture but wrote no "
        "checkpoint files"
    )


def _both_postures(spark, reliable, run):
    """Collect ``run()`` once under reliable posture, once under the
    default; the fixture already flipped the conf on."""
    got = run()
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")
    want = run()
    return got, want


def test_ivm_lsh_delta_identical_under_reliable_checkpoint(spark, reliable):
    """similarity.lsh_delta pins four frames per maintenance batch —
    the IVM family's heaviest pin consumer."""
    from slacken_spark.functions.similarity import lsh_delta

    def vec(seed):
        return [((seed * 31 + j) % 7 - 3) / 3.0 for j in range(8)]

    planes = [vec(90 + i) for i in range(4)]
    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)], "vec_id: long, embedding: array<double>"
    )
    upd = spark.createDataFrame(
        [(i, vec(i + 100)) for i in range(0, 40, 7)],
        "vec_id: long, embedding: array<double>",
    )
    dels = spark.createDataFrame([(3,), (10,)], "vec_id: long")
    got, want = _both_postures(
        spark,
        reliable,
        lambda: sorted(
            (r["bucket"], r["n_vecs"], sorted(r["members"]))
            for r in lsh_delta(base, upd, planes, deletes=dels).collect()
        ),
    )
    assert got == want


def test_token_blocks_identical_under_reliable_checkpoint(spark, reliable):
    from slacken_spark.functions.packing import token_blocks

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 13 % 97 + 1).alias("ntok")
    )
    got, want = _both_postures(
        spark,
        reliable,
        lambda: sorted(map(tuple, token_blocks(df, 64, buckets=4).collect())),
    )
    assert got == want


def test_bpe_train_identical_under_reliable_checkpoint(spark, reliable):
    from slacken_spark.functions.bpe import bpe_train

    df = spark.createDataFrame(
        [(i, "low lower lowest new newer newest " * 3) for i in range(6)],
        "doc_id long, text string",
    )
    got, want = _both_postures(
        spark,
        reliable,
        # checkpoint_every=2 forces pin sites to fire inside the loop
        lambda: bpe_train(df, "text", n_merges=6, checkpoint_every=2),
    )
    assert got == want


def test_inverted_delta_identical_under_reliable_checkpoint(spark, reliable):
    from slacken_spark.functions.inverted import delta_index

    base = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5}") for i in range(30)], "doc_id long, text string"
    )
    upd = spark.createDataFrame(
        [(4, "gamma beta"), (9, "alpha delta")], "doc_id long, text string"
    )
    got, want = _both_postures(
        spark,
        reliable,
        lambda: sorted(
            (r["term"], r["segment"], r["df_segment"], sorted(r["postings"]))
            for r in delta_index(
                base, upd, F.split(F.col("text"), " "), segment_rows=8
            ).collect()
        ),
    )
    assert got == want


def test_two_level_rank_identical_under_reliable_checkpoint(spark, reliable):
    from slacken_spark.operators.relational_ext import global_row_number

    df = spark.range(500).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 37 % 101).alias("v"),
        F.col("id"),
    )
    got = sorted(
        global_row_number(df, ["v", "id"], buckets=4, partition_cols=["g"])
        .collect()
    )
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")
    want = sorted(
        global_row_number(df, ["v", "id"], buckets=4, partition_cols=["g"])
        .collect()
    )
    assert got == want
