"""Distributed k-means (IVF centroid training) invariants: determinism,
full coverage, and monotone-ish objective improvement over Lloyd rounds."""

import pytest
from pyspark.sql import functions as F

from slacken_spark.functions import similarity as SIM
from slacken_spark.plans.catalog import t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return t(spark, SF, "embeddings").persist()


def _objective(df, cents):
    """Mean cosine similarity to the assigned centroid (higher=better)."""
    a = SIM.ivf_assign(df, "embedding", cents)
    sims = F.array(
        *[
            SIM.dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c]))
            / (SIM.l2_norm(F.col("embedding")) * F.lit(sum(x * x for x in c) ** 0.5))
            for c in cents
        ]
    )
    return (
        a.select(F.element_at(sims, F.col("centroid_id") + 1).alias("s"))
        .agg(F.avg("s"))
        .first()[0]
    )


def test_kmeans_deterministic_and_covering(emb):
    c1 = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=2)
    c2 = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=2)
    assert c1 == c2, "training must be bit-deterministic"
    assert len(c1) == 4 and all(len(c) == 64 for c in c1)
    assigned = SIM.ivf_assign(emb, "embedding", c1)
    n = emb.count()
    assert assigned.where(F.col("centroid_id").between(0, 3)).count() == n


def test_kmeans_improves_objective(emb):
    init = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=0)
    trained = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=3)
    assert _objective(emb, trained) >= _objective(emb, init) - 1e-9
