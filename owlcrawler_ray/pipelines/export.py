"""Resumable partitioned corpus export — the training-data sink shape.

The briefing's resumable-output requirement ("write partitioned Parquet,
one directory per input shard / key range, so a failed run can skip
finished partitions") applied to the query layer, reusing the crawl's
atomic table_store machinery (begin/commit + ``_SUCCESS``):

    out_root/bucket=0007/round=000000/part-*.parquet
    out_root/bucket=0007/round=000000/_SUCCESS

Pipeline: documents stream -> exact dedup (md5(text), first-writer-wins;
keep-ids stay a Dataset, filtered in with a hash-partitioned LEFT SEMI
join) -> quality filter (n_chars >= min_chars, the stats-view "parsed"
predicate) -> bucket = doc_id % n_buckets -> per-bucket
part files written FROM INSIDE the map tasks (content-keyed names, so
task retries overwrite idempotently) -> driver commits each bucket dir.

Resume: a re-run lists committed buckets first and prunes them OUT of the
stream (the filter runs at the map, so completed buckets cost nothing but
the scan); only missing buckets are rewritten. At 10^10 docs each bucket
is an independent key-range unit of work — the property that lets a
killed export restart without rewriting finished output.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..sinks import table_store

MIN_CHARS = 100


def export_pages(crawl_out: str, export_root: str, n_buckets: int = 8,
                 min_chars: int = 50) -> pa.Table:
    """End-to-end training-corpus composition over REAL crawl output:
    the crawl's pages rounds stream in lazily (table_store.read_all — no
    whole-corpus materialization), each batch computes text length,
    applies the quality gate, buckets by blake2b(doc_id), and writes
    part files into the same atomic per-bucket commit structure as
    export_corpus. Resume semantics identical: committed buckets are
    skipped. Returns (bucket, n_docs) read back from disk."""
    from ..functions.ids import shard_of

    done = {
        b for b in range(n_buckets)
        if table_store.round_complete(export_root, _bucket_name(b), 0)
    }
    todo = sorted(set(range(n_buckets)) - done)
    if todo:
        tmps = {
            b: table_store.begin_round(export_root, _bucket_name(b), 0)
            for b in todo
        }
        tmps_ref = ray.put(tmps)

        def shard_write(batch: pa.Table) -> pa.Table:
            tdirs = ray.get(tmps_ref)
            # text assembly is pure Arrow ("title para1 para2 ...");
            # empty-paragraph pages keep the bare title with no trailing
            # separator, matching ' '.join([title] + paras) exactly
            paras = batch.column("text")
            title = batch.column("title")
            both = pc.binary_join_element_wise(
                title, pc.binary_join(paras, " "), " "
            )
            texts = pc.if_else(
                pc.equal(pc.list_value_length(paras), 0), title, both
            )
            n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
            keep = pc.greater_equal(n_chars, min_chars)
            slim = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "url": batch.column("url"),
                    "text": texts,
                    "n_chars": n_chars,
                }
            ).filter(keep)
            if slim.num_rows == 0:
                return pa.table({"bucket": pa.array([], pa.int64()),
                                 "n_p": pa.array([], pa.int64())})
            buckets = shard_of(slim.column("doc_id").to_pylist(), n_buckets)
            out_b, out_n = [], []
            for b in np.unique(buckets):
                b = int(b)
                sub = slim.filter(pa.array(buckets == b))
                out_b.append(b)
                out_n.append(sub.num_rows)
                if b in tdirs:
                    key = sub.column("doc_id")[0].as_py()
                    table_store.write_part(
                        tdirs[b], sub, key=f"pg{b}-{key}-{sub.num_rows}"
                    )
            return pa.table(
                {"bucket": pa.array(out_b, pa.int64()),
                 "n_p": pa.array(out_n, pa.int64())}
            )

        # prune at the read: shard_write touches only these four columns,
        # and the dominant pages payload (html, large_binary, 10-20x
        # decompression) would otherwise stream through every worker heap
        # just to be dropped
        table_store.read_all(
            crawl_out, "pages",
            columns=["doc_id", "url", "title", "text"],
        ).map_batches(
            shard_write, batch_format="pyarrow"
        ).count()
        for b in todo:
            table_store.commit_round(export_root, _bucket_name(b), 0)

    return _bucket_counts(export_root, n_buckets)


def _bucket_name(b: int) -> str:
    return f"bucket={b:04d}"


def _bucket_counts(root: str, n_buckets: int) -> pa.Table:
    """(bucket, n_docs) read back from the committed output — the on-disk
    truth, via part FOOTER metadata only (parquet footers / lance
    manifests). The previous form pulled every bucket's full table
    (including text payloads) onto the driver just to count rows — an
    O(corpus) driver materialization at 10^10 docs; footer counts are
    O(parts) tiny reads. An uncommitted/empty bucket counts 0, matching
    the empty-table read it replaced."""
    rows_b = list(range(n_buckets))
    rows_n = [
        sum(
            table_store.round_num_rows(root, _bucket_name(b), r)
            for r in table_store.list_rounds(root, _bucket_name(b))
        )
        for b in rows_b
    ]
    return pa.table(
        {"bucket": pa.array(rows_b, pa.int64()),
         "n_docs": pa.array(rows_n, pa.int64())}
    )


def export_corpus(sf_dir: str, out_root: str, n_buckets: int = 16) -> pa.Table:
    """Run (or resume) the export; returns (bucket, n_docs) read back from
    the committed output — the on-disk truth, not in-flight counters."""
    import ray.data as rd

    from .queries import _read

    done = {
        b for b in range(n_buckets)
        if table_store.round_complete(out_root, _bucket_name(b), 0)
    }
    todo = sorted(set(range(n_buckets)) - done)
    if todo:
        ds = _read(sf_dir, "documents",
                   columns=["doc_id", "text", "n_chars"])

        # keep-id set: per-batch (hash -> min doc_id) partials, tiny global
        # groupby, broadcast — same family as q_exact_dedup
        def keep_partial(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "h": [hashlib.md5(x.encode()).hexdigest()
                          for x in batch.column("text").to_pylist()],
                    "doc_id": batch.column("doc_id"),
                }
            )
            return (
                t.group_by("h").aggregate([("doc_id", "min")])
                .rename_columns(["h", "keep_p"])
            )

        from ray.data.aggregate import Min

        keep_tbl = (
            ds.map_batches(keep_partial, batch_format="pyarrow")
            .groupby("h").aggregate(Min("keep_p", alias_name="keep_id"))
        )
        # adaptive semi-join (see queries._semi_filter): keep_ids are
        # unique (one min doc_id per content hash) and number at most the
        # footer row count, so small corpora broadcast + pc.is_in (zero
        # shuffle) and 10^10-doc corpora take the hash-partitioned LEFT
        # SEMI join — the keep side never lands on the driver there
        from .queries import _semi_filter, _table_bytes, _table_rows

        ds = _semi_filter(
            ds, keep_tbl.select_columns(["keep_id"]), "doc_id", "keep_id",
            est_keep_bytes=16 * _table_rows(sf_dir, "documents"),
            shuffle_bytes=_table_bytes(sf_dir, "documents"),
        )
        tmps = {
            b: table_store.begin_round(out_root, _bucket_name(b), 0)
            for b in todo
        }
        tmps_ref = ray.put(tmps)

        def shard_write(batch: pa.Table) -> pa.Table:
            tdirs = ray.get(tmps_ref)
            batch = batch.filter(
                pc.greater_equal(batch.column("n_chars"), MIN_CHARS)
            )
            ids = batch.column("doc_id").to_numpy()
            buckets = (ids % n_buckets).astype(np.int64)
            out_b, out_n = [], []
            for b in np.unique(buckets):
                b = int(b)
                sub = batch.filter(pa.array(buckets == b))
                out_b.append(b)
                out_n.append(sub.num_rows)
                if b in tdirs:
                    lo = int(sub.column("doc_id")[0].as_py())
                    table_store.write_part(
                        tdirs[b], sub, key=f"b{b}-{lo}-{sub.num_rows}"
                    )
            return pa.table(
                {"bucket": pa.array(out_b, pa.int64()),
                 "n_p": pa.array(out_n, pa.int64())}
            )

        # drive the pass to completion (the count is the barrier), then
        # commit each bucket dir atomically
        ds.map_batches(shard_write, batch_format="pyarrow").count()
        for b in todo:
            table_store.commit_round(out_root, _bucket_name(b), 0)

    return _bucket_counts(out_root, n_buckets)
