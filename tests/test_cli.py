"""End-to-end CLI test: build → stats → classify → compare-index over
real FASTA/dmp files on disk."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

RNG = np.random.default_rng(2024)


def _genome(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    genomes = {101: _genome(2000), 102: _genome(2000)}
    with open(d / "library.fasta", "w") as f:
        for t, seq in genomes.items():
            f.write(f">g{t} desc\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i : i + 70] + "\n")
    with open(d / "seqid2taxid.map", "w") as f:
        for t in genomes:
            f.write(f"g{t}\t{t}\n")
    tax_dir = d / "taxonomy"
    tax_dir.mkdir()
    with open(tax_dir / "nodes.dmp", "w") as f:
        f.write("1\t|\t1\t|\tno rank\t|\n")
        f.write("10\t|\t1\t|\tgenus\t|\n")
        f.write("101\t|\t10\t|\tspecies\t|\n")
        f.write("102\t|\t10\t|\tspecies\t|\n")
    with open(tax_dir / "names.dmp", "w") as f:
        f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n")
        f.write("101\t|\tSpecies one\t|\t\t|\tscientific name\t|\n")
    reads = []
    for t, seq in genomes.items():
        for i in range(5):
            st = int(RNG.integers(0, len(seq) - 150))
            reads.append((f"read_{t}_{i}", seq[st : st + 150]))
    with open(d / "reads.fasta", "w") as f:
        for h, seq in reads:
            f.write(f">{h}\n{seq}\n")
    return d


def _run(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "slacken_spark", "-p", "4", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        timeout=600,
    )


def test_cli_build_stats_classify(workdir):
    idx = str(workdir / "idx")
    r = _run(
        [
            "build",
            "-k",
            "21",
            "-m",
            "15",
            "-s",
            "2",
            "--library",
            str(workdir / "library.fasta"),
            "--labels",
            str(workdir / "seqid2taxid.map"),
            "--taxonomy",
            str(workdir / "taxonomy"),
            "-o",
            idx,
        ],
        str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["records"] > 0 and stats["taxa"] >= 2

    r = _run(["stats", "--index", idx], str(workdir))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "depth" in r.stdout

    out = str(workdir / "cls")
    r = _run(
        [
            "classify",
            "--index",
            idx,
            str(workdir / "reads.fasta"),
            "-c",
            "0.0",
            "-o",
            out,
        ],
        str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    report = (workdir / "cls_kreport.txt").read_text()
    assert "Species one" in report
    assert os.path.isdir(out + "_c0.0")


def test_splitter_defaults_for_wide_m():
    """-s defaults to 7 for m <= 31 and 0 for wide m; --wide-scheme
    selects the id scheme without extra flags."""
    import argparse

    from slacken_spark.cli import _add_splitter_args, _splitter

    p = argparse.ArgumentParser()
    _add_splitter_args(p)
    cfg = _splitter(p.parse_args([]))
    assert cfg.m == 31 and cfg.spaces == 7
    cfg = _splitter(p.parse_args(["-k", "50", "-m", "45"]))
    assert cfg.m == 45 and cfg.spaces == 0 and cfg.wide == "exact"
    cfg = _splitter(p.parse_args(["-k", "50", "-m", "45", "-s", "3"]))
    assert cfg.spaces == 3  # explicit spaces compose with wide ids now
    cfg = _splitter(p.parse_args(["-k", "50", "-m", "45", "--wide-scheme", "hashed"]))
    assert cfg.wide == "hashed"


def test_display_report_cli(tmp_path):
    from slacken_spark.cli import main

    rep = tmp_path / "r.kreport"
    rep.write_text(
        " 90.00\t90\t0\tR\t1\troot\n"
        " 60.00\t60\t0\tG\t40\t  GenusX\n"
        " 50.00\t50\t50\tS\t401\t    SpeciesA\n"
        "  0.50\t1\t1\tS\t402\t    SpeciesB\n"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["display-report", str(rep), "--rank", "g"])
    assert rc == 0
    taxa = [l.split("\t")[4] for l in buf.getvalue().strip().splitlines()]
    assert taxa == ["1", "40"]


def test_respace_cli_multi(workdir):
    """One respace invocation can emit several spaced indexes
    (Slacken.scala:176-184 list form)."""
    import os

    idx = str(workdir / "idx")
    out = str(workdir / "respaced")
    r = _run(["respace", "--index", idx, "-s", "4", "5", "-o", out], str(workdir))
    assert r.returncode == 0, r.stderr[-3000:]
    for s in (4, 5):
        assert os.path.exists(out + f"_s{s}/_index_params.json")


def test_pipeline_cli(tmp_path, spark):
    """pipeline subcommand end-to-end: jsonl ingest → min-token filter →
    exact dedup → pack → shard publish, manifest on stdout."""
    import io
    from contextlib import redirect_stdout

    from slacken_spark.cli import main

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        for i in range(40):
            text = f"doc {i} " + " ".join(f"w{j}" for j in range(12))
            f.write(json.dumps({"doc_id": i, "source": "web", "text": text}) + "\n")
        # short doc (filtered) and an exact duplicate of doc 0 (deduped)
        f.write(json.dumps({"doc_id": 100, "source": "web", "text": "tiny"}) + "\n")
        f.write(
            json.dumps(
                {
                    "doc_id": 101,
                    "source": "web",
                    "text": "doc 0 " + " ".join(f"w{j}" for j in range(12)),
                }
            )
            + "\n"
        )
    out_dir = tmp_path / "shards"
    buf = io.StringIO()
    # main() reuses the session via getOrCreate and would leave its
    # shuffle-partitions conf behind — restore it for later tests
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with redirect_stdout(buf):
            rc = main(
                [
                    "-p", "4",
                    "pipeline",
                    "--input", str(src),
                    "--format", "jsonl",
                    "--output", str(out_dir),
                    "--min-tokens", "5",
                    "--dedup", "exact",
                    "--pack-budget", "64",
                    "--shards", "4",
                ]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    assert rc == 0
    manifest = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert sum(m["n_rows"] for m in manifest) == 40  # 42 − tiny − duplicate
    assert {m["shard_id"] for m in manifest} <= {0, 1, 2, 3}
    assert all(m["n_tokens"] > 0 for m in manifest)
    back = spark.read.parquet(str(out_dir))
    assert back.count() == 40
    assert "pack_id" in back.columns
    # pack cohesion: a pack is the training unit — all its members must
    # land in ONE shard (sharding keys on the pack identity)
    from pyspark.sql import functions as F

    spread = (
        back.groupBy("source", "pack_shard", "pack_id")
        .agg(F.count_distinct("shard_id").alias("n_shards"))
        .where(F.col("n_shards") > 1)
        .count()
    )
    assert spread == 0


def test_pipeline_cli_quota_stage(tmp_path, spark):
    """--quota-tokens caps each source's published tokens via the
    hash-threshold sampler: the hot source gets cut to the quota, the
    small source publishes whole."""
    import io
    from contextlib import redirect_stdout

    from slacken_spark.cli import main

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        for i in range(50):
            f.write(
                json.dumps(
                    {"doc_id": i, "source": "hot", "text": "a b c d e f g h"}
                )
                + "\n"
            )
        for i in range(3):
            f.write(
                json.dumps(
                    {"doc_id": 100 + i, "source": "cold", "text": "x y z"}
                )
                + "\n"
            )
    out_dir = tmp_path / "qshards"
    buf = io.StringIO()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with redirect_stdout(buf):
            rc = main(
                [
                    "-p", "4",
                    "pipeline",
                    "--input", str(src),
                    "--format", "jsonl",
                    "--output", str(out_dir),
                    "--quota-tokens", "80",
                    "--quota-mode", "hash",
                    "--shards", "2",
                ]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    assert rc == 0
    manifest = [json.loads(l) for l in buf.getvalue().splitlines()]
    back = spark.read.parquet(str(out_dir))
    from pyspark.sql import functions as F

    per_src = {
        r["source"]: (r["n"], r["tok"])
        for r in back.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert per_src["cold"] == (3, 9)  # under quota → published whole
    assert per_src["hot"][0] == 10 and per_src["hot"][1] == 80  # 80//8 docs
    assert sum(m["n_rows"] for m in manifest) == 13


def test_pipeline_cli_null_ids_fail_loudly(tmp_path, capsys):
    from slacken_spark.cli import main

    src = tmp_path / "noid.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"source": "web", "text": "hello world"}) + "\n")
    rc = main(
        [
            "pipeline",
            "--input", str(src),
            "--format", "jsonl",
            "--output", str(tmp_path / "out"),
        ]
    )
    assert rc == 2
    assert "--derive-ids" in capsys.readouterr().err


def test_pipeline_cli_layout_stages(tmp_path, spark):
    """--block-tokens and --epoch write the training-batch layout
    artifacts next to the shards: a concat-and-chunk block plan whose
    slices cover every published token exactly, and a dense resumable
    epoch address table."""
    import io
    from contextlib import redirect_stdout

    from slacken_spark.cli import main

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        for i in range(30):
            text = " ".join(f"w{j}" for j in range(8 + i % 5))
            f.write(json.dumps({"doc_id": i, "source": "web", "text": text}) + "\n")
    out_dir = tmp_path / "shards"
    buf = io.StringIO()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with redirect_stdout(buf):
            rc = main(
                [
                    "-p", "4",
                    "pipeline",
                    "--input", str(src),
                    "--format", "jsonl",
                    "--output", str(out_dir),
                    "--shards", "4",
                    "--block-tokens", "64",
                    "--epoch", "2",
                ]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    blocks = [l for l in lines if "block_plan" in l]
    epochs = [l for l in lines if "epoch_plan" in l]
    assert len(blocks) == 1 and len(epochs) == 1
    total_tokens = sum(8 + i % 5 for i in range(30))
    from pyspark.sql import functions as F

    plan = spark.read.parquet(blocks[0]["block_plan"])
    assert plan.agg(F.sum("n_toks")).first()[0] == total_tokens
    assert blocks[0]["n_blocks"] == -(-total_tokens // 64)
    # every block except the highest is exactly full
    per_block = {
        r["block_id"]: r["s"]
        for r in plan.groupBy("block_id").agg(F.sum("n_toks").alias("s")).collect()
    }
    last = max(per_block)
    assert all(s == 64 for b, s in per_block.items() if b != last)
    addr = spark.read.parquet(epochs[0]["epoch_plan"])
    assert addr.count() == 30
    assert addr.select("shard").distinct().count() <= 4
    dense = (
        addr.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("position").alias("mx"))
        .where(F.col("n") != F.col("mx"))
        .count()
    )
    assert dense == 0


def test_pipeline_cli_refuses_pack_with_doc_granular_layouts(tmp_path, capsys):
    """Packs are the training unit; doc-granular block/epoch layouts
    would silently split them — the CLI must refuse the combination."""
    from slacken_spark.cli import main

    src = tmp_path / "c.jsonl"
    src.write_text(json.dumps({"doc_id": 1, "source": "s", "text": "a b c"}) + "\n")
    rc = main(
        [
            "pipeline",
            "--input", str(src),
            "--format", "jsonl",
            "--output", str(tmp_path / "out"),
            "--pack-budget", "64",
            "--block-tokens", "32",
        ]
    )
    assert rc == 2
    assert "cannot be combined" in capsys.readouterr().err


def test_corpus_report_cli(tmp_path, spark):
    """corpus-report subcommand: one JSON object with per-source
    stats + drift + quantile sketch + zone maps, cross-checked
    against the raw corpus."""
    import io
    from contextlib import redirect_stdout

    from slacken_spark.cli import main

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        for i in range(30):
            source = "web" if i % 3 else "books"
            text = " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 9))
            f.write(
                json.dumps({"doc_id": i, "source": source, "text": text})
                + "\n"
            )
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["corpus-report", "--input", str(src), "--format", "jsonl",
             "--qbin", "4", "--zm-width", "16"]
        )
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["n_docs"] == 30
    assert set(rep["sources"]) == {"web", "books"}
    web = rep["sources"]["web"]
    assert web["n_docs"] == 20
    for k in ("n_tokens", "drift_l1_num", "drift_denom",
              "p50_tokens_ub", "p95_tokens_ub"):
        assert isinstance(web[k], int), k
    # drift is a valid L1 fraction — total variation doubles to an L1
    # of at most 2, so the numerator is bounded by 2·denom, not denom
    assert 0 <= web["drift_l1_num"] <= 2 * web["drift_denom"]
    assert web["drift_l1_num"] > 0, "distinct sources must show drift"
    # quantile sketch bracket: p50 upper bound is within one bin of a
    # true token count (docs have 5..13 tokens; bin width 4)
    assert 4 <= web["p50_tokens_ub"] <= 16
    # zone maps cover every doc exactly once
    assert sum(z["n_rows"] for z in rep["zone_maps"]) == 30


def test_corpus_report_cli_null_source_and_text(tmp_path, spark):
    """Review catch: a row with no source crashed the sorted JSON
    render, and null text produced -1 token counts; both now
    normalize, and a token-free source still emits a full-schema
    object with explicit null drift."""
    import io
    from contextlib import redirect_stdout

    from slacken_spark.cli import main

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"doc_id": 1, "source": "web",
                            "text": "alpha beta gamma"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "delta epsilon"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "source": "empty",
                            "text": None}) + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["corpus-report", "--input", str(src), "--format", "jsonl"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(rep["sources"]) == {"web", "(null)", "empty"}
    for v in rep["sources"].values():
        assert set(v) >= {"n_docs", "n_tokens", "drift_l1_num",
                          "drift_denom", "p50_tokens_ub", "p95_tokens_ub"}
        assert v["n_tokens"] >= 0
    assert rep["sources"]["web"]["drift_l1_num"] is not None
    # blank text is ZERO tokens and a token-free source has UNDEFINED
    # drift (explicit null), not a fake empty-string token
    assert rep["sources"]["empty"]["n_tokens"] == 0
    assert rep["sources"]["empty"]["drift_l1_num"] is None


def test_corpus_report_cli_null_sentinel_avoids_collision(tmp_path, spark):
    """A corpus with BOTH a literal "(null)" source and null-source
    rows must not merge the two populations under one JSON key."""
    import io
    from contextlib import redirect_stdout

    from slacken_spark.cli import main

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"doc_id": 1, "source": "(null)",
                            "text": "real source named null"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "actually missing"}) + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["corpus-report", "--input", str(src), "--format", "jsonl"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(rep["sources"]) == {"(null)", "(null)~"}
    assert rep["sources"]["(null)"]["n_tokens"] == 4
    assert rep["sources"]["(null)~"]["n_tokens"] == 2


def test_corpus_report_drift_zero_for_matching_source(tmp_path, spark):
    """A source whose token distribution IS the corpus distribution
    must report zero drift even when another source contributes only
    blank/null text (the review repro: one null-text row previously
    injected an '' token and made a perfect source look drifted)."""
    import io
    from contextlib import redirect_stdout

    from slacken_spark.cli import main

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"doc_id": 1, "source": "web",
                            "text": "alpha beta"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "source": "empty",
                            "text": None}) + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["corpus-report", "--input", str(src), "--format", "jsonl"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    web = rep["sources"]["web"]
    assert web["drift_l1_num"] == 0, "sole token-bearing source has zero drift"


def test_cli_classify2_gold_eval(workdir):
    """classify2 --gold-set: two-step dynamic classification plus
    gold-set evaluation of the detected taxon set (readGoldSet +
    precision/recall) — the detected set {101, 102} scored against a
    gold file of {101, 999(unknown, dropped)} gives tp=1 fp=1 fn=0."""
    idx = str(workdir / "idx2")
    r = _run(
        [
            "build", "-k", "21", "-m", "15", "-s", "2",
            "--library", str(workdir / "library.fasta"),
            "--labels", str(workdir / "seqid2taxid.map"),
            "--taxonomy", str(workdir / "taxonomy"),
            "-o", idx,
        ],
        str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(workdir / "gold.csv", "w") as f:
        f.write("101\n999\n")
    out = str(workdir / "cls2")
    r = _run(
        [
            "classify2",
            "--index", idx,
            "--library", str(workdir / "library.fasta"),
            "--labels", str(workdir / "seqid2taxid.map"),
            str(workdir / "reads.fasta"),
            "--criterion", "minimizer-distinct",
            "--threshold", "1",
            "--gold-set", str(workdir / "gold.csv"),
            "-o", out,
        ],
        str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    taxa = (workdir / "cls2_taxonSet.txt").read_text().split()
    assert taxa == ["101", "102"]
    m = json.loads((workdir / "cls2_goldEval.json").read_text())
    assert (m["tp"], m["fp"], m["fn"]) == (1, 1, 0)
    assert m["precision"] == 0.5 and m["recall"] == 1.0
