"""A/B probe for the contraction engine's known-size label broadcasts
(r14, guide §3.1): on gate-sized graphs the hints are gated OFF
(broadcast_label_min_edges) because BroadcastExchange driver latency
dominated; this probe builds a graph big enough to sit INSIDE the
[min_edges, max_rows/2] window and measures the loop with the hints
enabled vs disabled (broadcast_label_rows=0 disables them), same
session, interleaved, min-of-N.

Graph: K scattered long chains (high-diameter — the contraction
engine's hard case) over N nodes, ids hash-scattered so partition-local
union-find cannot collapse a chain in one round. Structural readout
comes from the Spark REST API (task time, shuffle bytes) — wall on this
host drifts 2-3x, so the structural numbers are the evidence.
"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from slacken_spark.functions.dedup import connected_components_contract  # noqa: E402
from slacken_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
TRIALS = 2

spark = get_spark("probe_contract_broadcast", extra_conf={"spark.ui.enabled": "true"})

# K chains over N nodes: node i links to i+K (same residue class mod K),
# ids multiplied by a large odd constant mod 2^31 to scatter hash order.
K = 8
edges = (
    spark.range(N - K)
    .select(
        (F.col("id") * 2654435761 % (1 << 31)).alias("id_a"),
        ((F.col("id") + K) * 2654435761 % (1 << 31)).alias("id_b"),
    )
    .persist()
)
edges.count()


def run(broadcast_rows: int, label: str):
    spark.sparkContext.setJobGroup(label, label)
    t0 = time.perf_counter()
    out = connected_components_contract(
        edges,
        loop_partitions=32,
        broadcast_label_rows=broadcast_rows,
        broadcast_label_min_edges=100_000,
    )
    out.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    base = (
        spark.sparkContext.uiWebUrl
        + "/api/v1/applications/"
        + spark.sparkContext.applicationId
    )
    jobs = json.loads(urllib.request.urlopen(base + "/jobs").read())
    sids = set()
    for j in jobs:
        if j.get("jobGroup") == label:
            sids.update(j.get("stageIds", []))
    stages = json.loads(
        urllib.request.urlopen(base + "/stages?status=complete").read()
    )
    tt = sum(
        s.get("executorRunTime", 0) / 1000
        for s in stages
        if s["stageId"] in sids
    )
    shw = sum(
        s.get("shuffleWriteBytes", 0) / 1e6
        for s in stages
        if s["stageId"] in sids
    )
    print(
        f"{label}: wall={wall:6.2f}s task_time={tt:7.1f}s"
        f" shuffle_w={shw:7.1f}MB",
        flush=True,
    )
    return wall


# warmup (absorbs codegen/session costs on the loop path)
run(0, "warmup")
walls = {"shuffle": [], "broadcast": []}
for t in range(TRIALS):
    walls["shuffle"].append(run(0, f"shuffle#{t}"))
    walls["broadcast"].append(run(2_000_000, f"broadcast#{t}"))
print(
    f"min wall: shuffle={min(walls['shuffle']):.2f}s"
    f" broadcast={min(walls['broadcast']):.2f}s"
)
spark.stop()
