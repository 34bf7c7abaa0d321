"""fsutil: the scheme-agnostic FS layer under the maintenance verbs
(r13). Pure-python helpers tested directly; the Hadoop-side ops
tested over BOTH the local scheme and the test-only mock: scheme
(conftest wires MockFileSystem), since every lifecycle verb routes
through them on scheme-carrying roots."""

from __future__ import annotations

import os

import pytest

from sqlite_vector_spark import fsutil


def test_scheme_predicates():
    assert fsutil.has_scheme("s3a://bucket/x")
    assert fsutil.has_scheme("mock:/tmp/x")
    assert fsutil.has_scheme("file:/tmp/x")
    assert not fsutil.has_scheme("/tmp/x")
    assert not fsutil.has_scheme("relative/path")
    assert fsutil.is_remote("s3a://bucket/x")
    assert fsutil.is_remote("mock:/tmp/x")
    assert not fsutil.is_remote("file:/tmp/x")  # file: is local
    assert not fsutil.is_remote("/tmp/x")


def test_norm_root_never_abspaths_a_uri():
    # os.path.abspath would corrupt a URI by prefixing the cwd — the
    # exact bug class norm_root exists to prevent
    assert fsutil.norm_root("mock:/tmp/x/") == "mock:/tmp/x"
    assert fsutil.norm_root("s3a://b/k/") == "s3a://b/k"
    assert fsutil.norm_root("/tmp/x/") == "/tmp/x"
    rel = fsutil.norm_root("some/rel")
    assert os.path.isabs(rel) and rel.endswith("/some/rel")


@pytest.mark.parametrize("scheme", ["local", "mock"])
def test_fs_ops_roundtrip(spark, tmp_path, scheme):
    root = str(tmp_path / "fsops") if scheme == "local" else f"mock:{tmp_path}/fsops"
    fsutil.mkdirs(spark, f"{root}/a")
    fsutil.put_text(spark, f"{root}/a/x.json", '{"k": 1}')
    assert fsutil.exists(spark, f"{root}/a/x.json")
    assert fsutil.is_dir(spark, f"{root}/a")
    assert not fsutil.is_dir(spark, f"{root}/a/x.json")
    assert fsutil.get_text(spark, f"{root}/a/x.json") == '{"k": 1}'
    assert fsutil.list_names(spark, root) == ["a"]
    assert fsutil.list_dirs(spark, root) == ["a"]
    assert fsutil.list_dirs(spark, f"{root}/a") == []  # file-only child
    assert fsutil.list_names(spark, f"{root}/missing") == []
    assert fsutil.du_bytes(spark, f"{root}/a") > 0
    fsutil.rename(spark, f"{root}/a", f"{root}/b")
    assert not fsutil.exists(spark, f"{root}/a")
    assert fsutil.get_text(spark, f"{root}/b/x.json") == '{"k": 1}'
    fsutil.delete(spark, f"{root}/b", recursive=True)
    assert not fsutil.exists(spark, f"{root}/b")


def test_rename_is_checked(spark, tmp_path):
    """Hadoop's rename returns False on a missing source; the checked
    wrapper must raise — a swap that silently no-ops corrupts the
    maintenance verbs' accounting."""
    with pytest.raises(OSError, match="rename failed"):
        fsutil.rename(spark, str(tmp_path / "nope"), str(tmp_path / "dst"))


def test_active_spark_resolves_on_foreach_batch_thread(spark, tmp_path):
    """getActiveSession() is thread-local and None on Structured
    Streaming's foreachBatch threads — exactly where the ingest
    handlers resolve the FS layer for scheme-carrying state roots
    (found by the r13 1M mock-scheme probe). active_spark must
    resolve there via the process-wide fallback."""
    import threading

    seen = {}

    def worker():
        try:
            seen["spark"] = fsutil.active_spark()
        except Exception as e:  # noqa: BLE001
            seen["error"] = e

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert "error" not in seen
    assert seen["spark"] is not None
