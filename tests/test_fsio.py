"""Any-FS driver-side IO: every sidecar/report/list read+write must work
through a filesystem URI, not only a bare local path (the reference
routes all of these through Hadoop FS, HDFSUtil.scala:76-98). file://
exercises the URI resolution path end-to-end without needing a real
object store."""

import numpy as np
import pytest

from slacken_spark import fsio
from slacken_spark.kernels.minimizers import MinimizerConfig
from slacken_spark.kernels.taxonomy import ROOT, Taxonomy


def furi(p) -> str:
    return "file://" + str(p)


def test_fsio_text_roundtrip(tmp_path):
    fsio.write_text(furi(tmp_path / "a.txt"), "hello\nworld\n")
    assert fsio.read_text(furi(tmp_path / "a.txt")) == "hello\nworld\n"
    assert fsio.read_lines(str(tmp_path / "a.txt")) == ["hello", "world"]
    assert fsio.exists(furi(tmp_path / "a.txt"))
    assert not fsio.exists(furi(tmp_path / "missing.txt"))


def test_fsio_list_dir_prefix(tmp_path):
    (tmp_path / "sample=s1").mkdir()
    (tmp_path / "sample=s2").mkdir()
    (tmp_path / "_SUCCESS").write_text("")
    got = fsio.list_dir(furi(tmp_path), prefix="sample=")
    assert [g.rsplit("/", 1)[1] for g in got] == ["sample=s1", "sample=s2"]
    assert all(g.startswith("file://") for g in got)
    bare = fsio.list_dir(str(tmp_path), prefix="sample=")
    assert [g.rsplit("/", 1)[1] for g in bare] == ["sample=s1", "sample=s2"]


def test_taxonomy_dmp_load_via_uri(tmp_path):
    (tmp_path / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n5\t|\t1\t|\tgenus\t|\n7\t|\t5\t|\tspecies\t|\n"
    )
    (tmp_path / "names.dmp").write_text(
        "5\t|\tExemplar\t|\t\t|\tscientific name\t|\n"
        "5\t|\tAlias\t|\t\t|\tsynonym\t|\n"
    )
    (tmp_path / "merged.dmp").write_text("6\t|\t5\t|\n")
    tax = Taxonomy.load(
        furi(tmp_path / "nodes.dmp"),
        furi(tmp_path / "names.dmp"),
        furi(tmp_path / "merged.dmp"),
    )
    assert tax.parents[7] == 5 and tax.parents[5] == ROOT
    assert tax.names[5] == "Exemplar"
    assert tax.primary[6] == 5


def test_taxonomy_save_load_dir_via_uri(tmp_path):
    tax = Taxonomy.from_edges([5, 7], [ROOT, 5], names={5: "Exemplar"})
    d = tmp_path / "taxdir"
    d.mkdir()
    tax.save(furi(d))
    back = Taxonomy.load_dir(furi(d))
    assert np.array_equal(back.parents, tax.parents)
    assert back.lca(7, 5) == 5


def test_index_write_load_via_uri(spark, tmp_path):
    from slacken_spark.index import KeyValueIndex

    tax = Taxonomy.from_edges([5, 101, 102], [ROOT, 5, 5])
    rng = np.random.default_rng(7)
    gdf = spark.createDataFrame(
        [
            (f"g{t}", "".join("ACGT"[i] for i in rng.integers(0, 4, 600)))
            for t in (101, 102)
        ],
        "header string, nucleotides string",
    )
    ldf = spark.createDataFrame(
        [("g101", 101), ("g102", 102)], "header string, taxon int"
    )
    cfg = MinimizerConfig(k=15, m=9, spaces=0, canonical=True)
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, cfg, buckets=2)
    loc = furi(tmp_path / "idx_uri")
    idx.write(loc)
    loaded = KeyValueIndex.load(spark, loc)
    assert loaded.cfg == cfg
    assert loaded.buckets == 2
    assert loaded.records.count() == idx.records.count()


def test_bracken_kmer_distrib_via_uri(spark, tmp_path):
    from slacken_spark.bracken import BrackenWeights
    from slacken_spark.index import KeyValueIndex

    tax = Taxonomy.from_edges([5, 101, 102], [ROOT, 5, 5])
    rng = np.random.default_rng(11)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    gdf = spark.createDataFrame(
        [
            (f"g{t}", core + "".join("ACGT"[i] for i in rng.integers(0, 4, 300)))
            for t in (101, 102)
        ],
        "header string, nucleotides string",
    )
    ldf = spark.createDataFrame(
        [("g101", 101), ("g102", 102)], "header string, taxon int"
    )
    cfg = MinimizerConfig(k=15, m=9, spaces=0, canonical=True)
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, cfg, buckets=2)
    out = furi(tmp_path / "weights_kmer_distrib.txt")
    BrackenWeights(idx, 60).build_and_write(gdf, ldf, {101, 102}, out)
    text = fsio.read_text(out)
    assert text.strip(), "kmer_distrib must not be empty"


def test_uri_prefix_families():
    from slacken_spark.fsio import _uri_prefix

    # bucket-style: bucket lives inside the fs-local path
    assert _uri_prefix("s3://bucket/dir", "bucket/dir") == "s3://"
    assert _uri_prefix("s3://bucket/dir/", "bucket/dir") == "s3://"
    assert _uri_prefix("gs://b", "b") == "gs://"
    # authority-style: host:port must be re-attached
    assert _uri_prefix("hdfs://nn:8020/data", "/data") == "hdfs://nn:8020"
    assert (
        _uri_prefix("hdfs://nn:8020/data", "/data") + "/data/x"
        == "hdfs://nn:8020/data/x"
    )
    # local URIs and bare paths
    assert _uri_prefix("file:///tmp/x", "/tmp/x") == "file://"
    assert _uri_prefix("/tmp/x", "/tmp/x") == ""


def test_write_text_creates_parent_dirs(tmp_path):
    """write_text mirrors Hadoop FileSystem.create: missing parent
    directories are created, so CLI writers may target
    <output-dir>/<file> without pre-creating the dir (regression:
    bracken-build into a fresh -o directory crashed)."""
    from slacken_spark import fsio

    p = str(tmp_path / "new" / "nested" / "f.txt")
    fsio.write_text(p, "hello\n")
    assert fsio.read_text(p) == "hello\n"


def test_absolutize_pins_bare_paths_and_passes_uris(tmp_path, monkeypatch):
    from slacken_spark import fsio

    monkeypatch.chdir(tmp_path)
    assert fsio.absolutize("rel/idx") == str(tmp_path / "rel" / "idx")
    assert fsio.absolutize("s3://bucket/idx") == "s3://bucket/idx"
    assert fsio.absolutize("file:///x/y") == "file:///x/y"
    # single-slash URI form (valid to Spark/Hadoop) must pass through,
    # not be mangled to <cwd>/file:/x/y (r8 advice)
    assert fsio.absolutize("file:/x/y") == "file:/x/y"
    assert fsio.absolutize("hdfs:/x/y") == "hdfs:/x/y"
    # but a single letter before ':/' is a Windows DRIVE, not a scheme
    # (Hadoop Path's rule) — still a local path (r9 review)
    assert fsio.absolutize("C:/data/idx") == str(tmp_path / "C:" / "data" / "idx")
    # a >=2-char scheme-like prefix IS a URI per RFC 3986 / java.net.URI
    # (Hadoop parses 'out.v2:/idx' as scheme 'out.v2' too) — documented
    # behavior, not an accident: colon-bearing local names need ./
    assert fsio.absolutize("out.v2:/idx") == "out.v2:/idx"
    assert fsio.absolutize("./out.v2:/idx").endswith("/out.v2:/idx")


def test_any_fs_accepts_single_slash_uri(tmp_path):
    from slacken_spark import fsio

    p = tmp_path / "t.txt"
    p.write_text("ok")
    assert fsio.read_text(f"file:{p}") == "ok"
    assert fsio.read_text(f"file://{p}") == "ok"


def test_move_overwrites_via_rename_and_guards_bad_states(tmp_path):
    """move() is the artifact-promotion primitive: (1) plain move, (2)
    atomic-on-POSIX overwrite of an existing file, (3) a directory
    destination is rejected loudly BEFORE anything is deleted, (4) a
    missing source raises and PRESERVES the existing destination — the
    fallback must never delete the one good artifact for an operation
    that cannot succeed (r10 review finding)."""
    import pytest

    from slacken_spark import fsio

    src = tmp_path / "part-001"
    dst = tmp_path / "artifact.tsv"
    src.write_text("new\n")
    fsio.move(str(src), str(dst))
    assert dst.read_text() == "new\n" and not src.exists()

    # overwrite an existing destination
    src2 = tmp_path / "part-002"
    src2.write_text("newer\n")
    fsio.move(str(src2), str(dst))
    assert dst.read_text() == "newer\n" and not src2.exists()

    # directory destination: loud, nothing deleted
    ddir = tmp_path / "somedir"
    ddir.mkdir()
    src3 = tmp_path / "part-003"
    src3.write_text("x\n")
    with pytest.raises(IsADirectoryError):
        fsio.move(str(src3), str(ddir))
    assert src3.exists() and ddir.is_dir()

    # missing source: raises AND the previous artifact survives
    with pytest.raises(OSError):
        fsio.move(str(tmp_path / "no-such-part"), str(dst))
    assert dst.read_text() == "newer\n"


def test_move_fallback_replaces_on_hdfs_style_fs_and_restores_on_unrelated_error(
    tmp_path, monkeypatch
):
    """The fallback path local POSIX never takes: on a filesystem that
    REJECTS renames onto an existing target (HDFS semantics) the
    replace must still land; and when the retry fails for an UNRELATED
    reason, the previous artifact must be RESTORED at its path — no
    error mode leaves dst deleted-but-not-replaced (r10 high-review:
    the old fallback deleted dst on any OSError and then failed)."""
    import pyarrow.fs as pafs
    import pytest

    from slacken_spark import fsio

    class HdfsStyle:
        """Delegates to the local FS but rejects move onto an existing
        target; optionally fails every move FROM a poisoned source."""

        def __init__(self, inner, poison_src=None):
            self._i = inner
            self._poison = poison_src

        def get_file_info(self, p):
            return self._i.get_file_info(p)

        def delete_file(self, p):
            return self._i.delete_file(p)

        def move(self, a, b):
            if self._poison is not None and a == self._poison:
                raise OSError("unrelated IO error")
            if self._i.get_file_info(b).type != pafs.FileType.NotFound:
                raise OSError(f"rename target exists: {b}")
            return self._i.move(a, b)

    inner = pafs.LocalFileSystem()
    src = tmp_path / "part-a"
    dst = tmp_path / "artifact"
    src.write_text("new\n")
    dst.write_text("old\n")

    orig_any_fs = fsio.any_fs
    wrap = {"fs": HdfsStyle(inner)}
    monkeypatch.setattr(
        fsio, "any_fs", lambda p: (wrap["fs"], orig_any_fs(p)[1])
    )
    # HDFS-style replace: fallback renames aside, retries, cleans up
    fsio.move(str(src), str(dst))
    assert dst.read_text() == "new\n"
    assert not (tmp_path / "artifact.__replaced__").exists()

    # unrelated persistent error: dst must be RESTORED, not lost
    src2 = tmp_path / "part-b"
    src2.write_text("newer\n")
    wrap["fs"] = HdfsStyle(inner, poison_src=str(src2))
    with pytest.raises(OSError, match="unrelated"):
        fsio.move(str(src2), str(dst))
    assert dst.read_text() == "new\n", "previous artifact must survive"
    assert src2.exists()
