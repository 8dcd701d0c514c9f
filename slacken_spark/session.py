"""SparkSession factory tuned for this engine.

Local-mode defaults mirror the knobs the reference exposes
(``--partitions`` → ``spark.sql.shuffle.partitions``,
reference: kmers/SparkTool.scala:80-88) while adding the modern AQE
settings a 1000-executor deployment would want. On a real cluster the
same builder is used; only ``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "slacken_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    Notes on scale: AQE handles runtime partition coalescing and skew
    joins; ``spark.sql.session.timeZone=UTC`` pins timestamp semantics
    so results are reproducible across drivers/oracles; Arrow is enabled
    because every Python-side kernel in this engine is Arrow-batched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.appName(app_name)
        # local mode: the driver JVM is the whole engine — the 1g default
        # heap GC-thrashes under 32 concurrent tasks (must be set before
        # the JVM starts; ignored on an already-running session)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "8g"))
        .config("spark.driver.maxResultSize", "4g")
        # G1 with a moderate heap: the 1g default GC-thrashes local[32],
        # but this environment faults NEW pages very slowly (~60 MB/s),
        # so a huge or pre-touched heap costs minutes up front
        # (-XX:+AlwaysPreTouch measured 300 s for 16g). A lazily-grown
        # 8g heap only ever faults what queries actually use.
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Let AQE (incl. partition coalescing) run INSIDE persist()
        # materializations: the app-scoped stored-table stand-ins
        # (_base_pairs, _full_labels, genomic index) otherwise build
        # their cache with fixed-width shuffles — measured r13: the
        # dedup maintenance family ran ~800 tasks moving 0.5 MB total
        # (kilobyte tasks, pure scheduling overhead) because coalescing
        # was disabled under the cache build. With AQE active there the
        # same shuffles coalesce via minPartitionSize, and the setting
        # stays scale-adaptive: partition count derives from runtime
        # data size, not a local constant. (parallelismFirst keeps its
        # default: respecting the 64 MB advisory target instead would
        # serialize sf0.1's ~20 MB mid-size shuffles to one task —
        # measured 2.5 s → 5.3 s on doc_dupspan_scrub — while the
        # parallelism-first floor already coalesces the kilobyte
        # shuffles this change targets.) Output partitioning of a
        # cached plan is not load-bearing anywhere in this engine —
        # every layout-sensitive site pins explicitly (repartition /
        # repartitionByRange with explicit numPartitions, which AQE
        # preserves).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        b = b.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        b = b.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_package_shipped(spark)
    return spark


# Every lineage-pin site in the engine (iterative contraction loops,
# two-level rank/scan, IVM maintainers, token packing, BPE, CMS) routes
# through ``pin`` below. Default = executor-local ``localCheckpoint``:
# zero external storage, but blocks die with their executor, so an
# executor loss mid-query fails the QUERY (deterministic → the retry is
# idempotent — ARCHITECTURE.md "localCheckpoint fault-tolerance
# posture"). Spot/preemptible deployments flip this conf (and set a
# checkpoint dir) to route the SAME sites to reliable ``checkpoint()``
# so lost executors cost a task retry, not the query.
RELIABLE_CHECKPOINT_CONF = "spark.slacken.reliableCheckpoint"

_WARNED_NO_CKPT_DIR = False


def pin(df, eager: bool = False):
    """Pin ``df``'s lineage: truncate the plan and materialize it once.

    ``localCheckpoint(eager=...)`` unless ``spark.slacken.
    reliableCheckpoint=true`` AND ``sparkContext.setCheckpointDir`` was
    called, in which case the site becomes a reliable ``checkpoint``
    (same laziness). When the conf is set without a checkpoint dir the
    site falls back to localCheckpoint with one loud warning —
    ``checkpoint()`` would otherwise throw mid-query deep inside a loop.

    The conf is read per call, so a session can flip it between
    queries; block-release bookkeeping (``functions.dedup.
    _unpersist_local_ckpt``) is checkpoint-agnostic — unpersisting a
    reliably-checkpointed plan's RDD drops cached blocks while the
    checkpoint files keep the data recomputable.

    Storage lifecycle: Spark does NOT delete reliable checkpoint files
    by default — long-running reliable-posture sessions should set
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (files
    freed when their RDD is GC'd) or lifecycle the checkpoint dir
    externally (e.g. object-store TTL).
    """
    spark = df.sparkSession
    try:
        reliable = (
            str(spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false")).lower()
            == "true"
        )
    except Exception:
        reliable = False
    if reliable:
        try:
            ckpt_dir = spark.sparkContext.getCheckpointDir()
        except Exception:
            ckpt_dir = None
        if ckpt_dir:
            return df.checkpoint(eager=eager)
        global _WARNED_NO_CKPT_DIR
        if not _WARNED_NO_CKPT_DIR:
            _WARNED_NO_CKPT_DIR = True
            import warnings

            warnings.warn(
                f"{RELIABLE_CHECKPOINT_CONF}=true but no checkpoint dir is"
                " set (sparkContext.setCheckpointDir) — falling back to"
                " localCheckpoint",
                stacklevel=2,
            )
    return df.localCheckpoint(eager=eager)


def pin_eager(df):
    """``pin`` with eager materialization — for ``df.transform`` sites."""
    return pin(df, eager=True)


_SHIPPED_APPS: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to executors via ``addPyFile`` (once per app).

    Executor Python workers inherit only the PYTHONPATH environment — a
    driver that imported the package through a runtime ``sys.path`` edit
    or its working directory runs fine driver-side while every
    Arrow/pandas-UDF stage dies with ModuleNotFoundError. Zipping the
    package and registering it makes every entry point (driver contract,
    bench, CLI, library use) location-independent. No-op when shipping
    fails (e.g. a read-only temp dir): the common same-environment case
    still works exactly as before.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    import tempfile
    import zipfile

    pkg = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg)
    try:
        import hashlib
        import io

        # Build the zip in memory with DETERMINISTIC bytes (sorted walk,
        # fixed entry timestamps — a zipfile.write would embed per-file
        # mtimes, so a mere checkout/touch would mint a new digest and
        # accumulate zips), then publish it at a CONTENT-ADDRESSED stable
        # path. Unlinking after addPyFile is NOT safe: local-mode
        # executors lazily re-fetch from the original path, and a
        # recycled name with different contents aborts the fetching task
        # ("exists and does not match contents"). A stable content-hash
        # name is reused by every subsequent app on the same package
        # bytes — no per-app temp-file growth — and byte-identical
        # rewrites can't trip the executor mismatch check.
        entries = []
        for root, dirs, files in os.walk(pkg):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    with open(full, "rb") as fh:
                        entries.append((os.path.relpath(full, parent), fh.read()))
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for rel, content in entries:
                zi = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
                zi.external_attr = 0o644 << 16
                zf.writestr(zi, content, zipfile.ZIP_DEFLATED)
        data = buf.getvalue()
        digest = hashlib.md5(data).hexdigest()[:16]
        zpath = os.path.join(
            tempfile.gettempdir(), f"slacken_spark_pkg_{digest}.zip"
        )
        # Trust nothing at the predictable path: the file must be OURS
        # (another user who pre-created it — bytes are derivable from
        # the public package — could rewrite it AFTER this verify-read,
        # and lazily re-fetching executors would run the swapped code;
        # owning the file closes that TOCTOU window since sticky /tmp
        # forbids others replacing or reopening-for-write our file) AND
        # byte-equal to what we'd ship. Rewrite atomically and
        # world-readable otherwise; if the path is unwritable (another
        # user's file), fall back to a private unique name —
        # correctness over dedup.
        reuse = False
        try:
            import stat as statmod

            st = os.lstat(zpath)  # lstat + O_NOFOLLOW: an attacker-owned
            # symlink pointing at a victim-owned byte-identical zip would
            # pass a follow-the-link stat check and stay attacker-retargetable
            if statmod.S_ISREG(st.st_mode) and st.st_uid == os.getuid():
                fd = os.open(zpath, os.O_RDONLY | os.O_NOFOLLOW)
                with os.fdopen(fd, "rb") as fh:
                    reuse = fh.read() == data
        except OSError:
            reuse = False
        if not reuse:
            fd, tmp = tempfile.mkstemp(
                suffix=".zip", prefix="slacken_spark_", dir=tempfile.gettempdir()
            )
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
            os.chmod(tmp, 0o644)
            try:
                os.replace(tmp, zpath)
            except OSError:
                zpath = tmp
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass
    _SHIPPED_APPS.add(app_id)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register the driver test tables as temp views; return dict of DataFrames."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    from slacken_spark.plans.catalog import t

    out = {}
    for n in names:
        df = t(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
