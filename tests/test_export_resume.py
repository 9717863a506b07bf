"""Resumable partitioned export: committed buckets are skipped on re-run
(their files untouched); missing buckets are rebuilt deterministically."""

import os

import pyarrow as pa

from owlcrawler_ray.pipelines.export import export_corpus
from owlcrawler_ray.sinks import table_store

SF = "/root/testdata/sf0.001"


def _part_files(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith("_SUCCESS"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


def test_export_and_resume_skips_committed_buckets(ray_session, tmp_path):
    root = str(tmp_path / "export")
    first = export_corpus(SF, root)
    assert first.num_rows == 16
    total = sum(first.column("n_docs").to_pylist())
    assert total > 0
    before = _part_files(root)
    assert before

    # full re-run: every bucket committed -> nothing rewritten
    again = export_corpus(SF, root)
    assert again.equals(first)
    assert _part_files(root) == before  # identical paths AND mtimes

    # simulate a kill that lost bucket 3: its dir is gone, others commit
    victim = os.path.join(root, "bucket=0003")
    import shutil

    shutil.rmtree(victim)
    third = export_corpus(SF, root)
    assert third.equals(first)  # deterministic rebuild
    after = _part_files(root)
    untouched = {p: m for p, m in after.items() if "bucket=0003" not in p}
    assert untouched == {p: m for p, m in before.items()
                         if "bucket=0003" not in p}
    assert any("bucket=0003" in p for p in after)


def test_export_partition_layout(ray_session, tmp_path):
    root = str(tmp_path / "layout")
    counts = export_corpus(SF, root, n_buckets=4)
    assert counts.column("bucket").to_pylist() == [0, 1, 2, 3]
    for b in range(4):
        assert table_store.round_complete(root, f"bucket={b:04d}", 0)
        t = table_store.read_all_arrow(root, f"bucket={b:04d}")
        if t.num_rows:
            ids = t.column("doc_id").to_pylist()
            assert all(i % 4 == b for i in ids)
            assert min(t.column("n_chars").to_pylist()) >= 100
