"""Operator registry: Ray Data pipelines over the driver testdata tables,
each with (where SQL-expressible) a DuckDB oracle in ``ORACLES``.

Coverage map to SURVEY.md §2 (reference: /root/reference):
  word_index        A3  couchdb search view (couchdb.go:87-96) + F4 len>2
  stats_counts      A1  fetched/parsed counts view (couchdb.go:97-103)
  sites             A2  sites listing view (couchdb.go:104-106)
  exact_dedup       A5  doc-id first-writer-wins dedup (couchdb.go:164-166)
  anti_join_unseen  J1  candidate-links ∖ seen anti-semi-join (parse.go:110)
  topk              SO1 score ordering + limit (elastic_search.go:126-130)
  fifo_order        SO2 FIFO queue ordering (fetcher.go:95)
  pricing_summary   generic groupby/agg conformance (shuffle-heavy path)
  filter_scan       F-class predicate pushdown at the read
  broadcast_join    J3 search-hit hydrate as broadcast join
  events_hourly     windowed aggregate (streaming-shaped, §2.10 mapping)
  distinct_types    A5-adjacent distinct/unique
  token_stats, quality_scores, lang_distribution — text analysis (graft)
  minhash_lsh_pairs — MinHash+LSH near-dup candidates (graft, md5-based so
                      the DuckDB oracle computes the identical signature)
  ann_topk          brute-force cosine top-k over embeddings (graft)

Scale stance: every pipeline streams (read_parquet with column pruning ->
map_batches partial aggregation -> small groupby), no driver-side loops
over full tables, broadcast for small sides; see each docstring.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _p(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def _round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    """DuckDB-compatible round (half away from zero) — np.round is banker's
    and disagrees on exact .5 boundaries."""
    f = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(_p(sf_dir, table), columns=columns)


# ---------------------------------------------------------------------------
# A3 + F4: word inverted index
# ---------------------------------------------------------------------------

def _word_pairs(batch: pa.Table) -> pa.Table:
    """Vectorized explode: documents -> one row per (word, doc) with the
    in-doc occurrence count. Split/filters are pyarrow kernels; the per-
    (word,doc) partial count happens inside the batch (pre-aggregation
    before the word shuffle — SURVEY.md 'push aggregation partial')."""
    words = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(words)
    parents = pc.list_parent_indices(words)
    doc_ids = batch.column("doc_id").take(parents)
    keep = pc.greater(pc.utf8_length(flat), 2)  # F4: len(word) > 2
    t = pa.table({"word": flat.filter(keep), "doc_id": doc_ids.filter(keep)})
    return t.group_by(["word", "doc_id"]).aggregate([([], "count_all")]).rename_columns(
        ["word", "doc_id", "n"]
    )


def q_word_index(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ds.map_batches(_word_pairs, batch_format="pyarrow", zero_copy_batch=True)
    out = pairs.groupby("word").aggregate(
        Sum("n", alias_name="n_postings"), Count(alias_name="n_docs")
    )
    return out


# ---------------------------------------------------------------------------
# A1: stats counts
# ---------------------------------------------------------------------------

def q_stats_counts(sf_dir: str):
    """Single-row fetched/parsed counts — mirrors the CouchDB reduce view
    (_count with group_level=1). Streaming aggregate, no materialization."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parsed = int(pc.sum(pc.cast(pc.greater(batch.column("n_chars"), 100),
                                    pa.int64())).as_py() or 0)
        return pa.table({"fetched_p": [n], "parsed_p": [parsed]})

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("fetched_p", alias_name="fetched"), Sum("parsed_p", alias_name="parsed")
    )
    return pa.table({"fetched": [agg["fetched"]], "parsed": [agg["parsed"]]})


# ---------------------------------------------------------------------------
# A2: sites listing
# ---------------------------------------------------------------------------

def q_sites(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source"])
    return ds.groupby("source").aggregate(Count(alias_name="n_docs"))


# ---------------------------------------------------------------------------
# A5: exact dedup (content hash, first-writer-wins)
# ---------------------------------------------------------------------------

def _with_clones(ds, sf_dir):
    """Deterministic duplicates: docs with doc_id<50 re-appear with
    doc_id+100000 (same text) so dedup groups are non-trivial."""
    clones = _read(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr="doc_id < 50"
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(t.column("doc_id"), 100000),
        ),
        batch_format="pyarrow",
    )
    return ds.union(clones)


def q_exact_dedup(sf_dir: str):
    """Hash-partition + per-group first: md5(content) -> keep min doc_id.
    The scale pattern for exact dedup: content hash in a vectorized
    map_batches, per-batch partial (min, count), then a SMALL groupby over
    partials instead of shuffling full rows."""
    ds = _with_clones(_read(sf_dir, "documents", columns=["doc_id", "text"]), sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hashes = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        t = pa.table(
            {"content_hash": hashes, "doc_id": batch.column("doc_id")}
        )
        return (
            t.group_by("content_hash")
            .aggregate([("doc_id", "min"), ([], "count_all")])
            .rename_columns(["content_hash", "keep_p", "n_p"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("keep_p", alias_name="keep_id"),
                   Sum("n_p", alias_name="n_copies"))
    )


# ---------------------------------------------------------------------------
# J1: anti join (broadcast the small side — never a shuffle)
# ---------------------------------------------------------------------------

def q_anti_join_unseen(sf_dir: str):
    """orders with no lineitems = orders ∖ lineitem on orderkey. The
    probe-side KEY SET is broadcast via ray.put once (sorted for
    searchsorted); each batch filters vectorized — the batched form of the
    reference's per-link HEAD anti-semi-join (at 100 TB the broadcast
    becomes a Bloom filter of the key set + exact recheck of positives)."""
    seen_keys = np.unique(
        pq.read_table(_p(sf_dir, "lineitem"), columns=["l_orderkey"])
        .column("l_orderkey").to_numpy()
    )
    ref = ray.put(seen_keys)
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        probe = batch.column("o_orderkey").to_numpy()
        pos = np.searchsorted(keys, probe)
        pos = np.minimum(pos, len(keys) - 1)
        mask = keys[pos] != probe
        return batch.filter(pa.array(mask))

    return ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SO1: top-k
# ---------------------------------------------------------------------------

def q_topk(sf_dir: str):
    """Local per-batch prune to k, then one tiny global sort+limit — the
    scale-safe top-k (never a full sort of the input)."""
    k = 100
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def prune(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k=min(k, batch.num_rows),
            sort_keys=[("l_extendedprice", "descending"),
                       ("l_orderkey", "ascending"),
                       ("l_linenumber", "ascending")],
        )
        return batch.take(idx)

    return (
        ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["l_extendedprice", "l_orderkey", "l_linenumber"],
              descending=[True, False, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# SO2: FIFO / sequence ordering
# ---------------------------------------------------------------------------

def q_fifo_order(sf_dir: str):
    """events in (ts, event_id) order with a global sequence — the NATS
    FIFO-parity shape. Local prune + global sort+limit, seq assigned on
    the (small) result."""
    n = 1000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prune(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k=min(n, batch.num_rows),
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        return batch.take(idx)

    head = (
        ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["ts", "event_id"]).limit(n)
    )
    t = pa.concat_tables([ray.get(r) for r in head.to_arrow_refs()])
    return t.add_column(
        0, "seq", pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64))
    )


# ---------------------------------------------------------------------------
# groupby/agg conformance (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """Partial per-batch sums (arrow group_by) -> tiny global groupby.
    The canonical pre-aggregated shuffle; at 100 TB the exchanged rows are
    O(batches x groups), not O(input)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff))
        disc_price = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": batch.column("l_quantity"),
                "base": batch.column("l_extendedprice"),
                "disc_price": disc_price,
                "disc": batch.column("l_discount"),
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("base", "sum"), ("disc_price", "sum"),
                        ("disc", "sum"), ([], "count_all")])
            .rename_columns(["l_returnflag", "l_linestatus", "qty_p", "base_p",
                             "dp_p", "disc_p", "n_p"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_p", alias_name="sum_qty_raw"),
            Sum("base_p", alias_name="sum_base_raw"),
            Sum("dp_p", alias_name="sum_dp_raw"),
            Sum("disc_p", alias_name="sum_disc_raw"),
            Sum("n_p", alias_name="count_order"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("count_order").to_numpy().astype(np.float64)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": _round_half_away(batch.column("sum_qty_raw").to_numpy(), 2),
                "sum_base_price": _round_half_away(batch.column("sum_base_raw").to_numpy(), 2),
                "sum_disc_price": _round_half_away(batch.column("sum_dp_raw").to_numpy(), 2),
                "avg_qty": _round_half_away(batch.column("sum_qty_raw").to_numpy() / n, 4),
                "avg_disc": _round_half_away(batch.column("sum_disc_raw").to_numpy() / n, 6),
                "count_order": batch.column("count_order"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# F-class: filtered projection (pruned at the read)
# ---------------------------------------------------------------------------

def q_filter_scan(sf_dir: str):
    import pyarrow.dataset as pads

    flt = (
        (pc.field("l_shipdate") < pa.scalar(np.datetime64("1995-07-01", "us")))
        & (pc.field("l_discount") >= 0.02)
        & (pc.field("l_discount") <= 0.06)
        & (pc.field("l_quantity") < 10)
    )
    # row-group/predicate pushdown happens AT THE READ (never load-then-drop)
    return rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        filter=flt,
    )


# ---------------------------------------------------------------------------
# J3: broadcast hash join
# ---------------------------------------------------------------------------

def q_broadcast_join(sf_dir: str):
    """orders ⋈ customer with the dimension side broadcast once (ray.put)
    and merged per batch — no shuffle of the fact table."""
    cust = pq.read_table(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_mktsegment"]
    ).to_pandas()
    ref = ray.put(cust)
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(ref)
        out = batch[batch["o_totalprice"] > 150000].merge(
            dim, left_on="o_custkey", right_on="c_custkey", how="inner"
        )
        return out[["o_orderkey", "c_name", "c_mktsegment", "o_totalprice"]]

    return ds.map_batches(join, batch_format="pandas")


# ---------------------------------------------------------------------------
# streaming-shaped: hourly windowed aggregate
# ---------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.table(
            {"user_id": batch.column("user_id"), "hour": hour,
             "value": batch.column("value")}
        )
        return (
            t.group_by(["user_id", "hour"])
            .aggregate([("value", "sum"), ([], "count_all")])
            .rename_columns(["user_id", "hour", "v_p", "n_p"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "hour"])
        .aggregate(Sum("v_p", alias_name="sum_v"), Sum("n_p", alias_name="n_events"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "hour": batch.column("hour"),
                "n_events": batch.column("n_events"),
                "sum_value": _round_half_away(batch.column("sum_v").to_numpy(), 3),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distinct
# ---------------------------------------------------------------------------

def q_distinct_types(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, type=pa.string())})


# ---------------------------------------------------------------------------
# text analysis (graft): token counts, quality scores, lang distribution
# ---------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def stats(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
                "n_chars": batch.column("n_chars"),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


_NON_ALPHA = re.compile(r"[^a-zA-Z]")


def q_quality_scores(sf_dir: str):
    """Quality scoring: alphabetic ratio + mean token length per doc.
    Compiled regex reused across batches (module-level, once per worker)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_chars = np.array([len(t) for t in texts], dtype=np.float64)
        alpha = np.array(
            [len(_NON_ALPHA.sub("", t)) for t in texts], dtype=np.float64
        )
        n_toks = np.array([len(t.split(" ")) for t in texts], dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "alpha_ratio": _round_half_away(alpha / np.maximum(n_chars, 1), 6),
                "avg_token_len": _round_half_away(n_chars / np.maximum(n_toks, 1), 6),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def q_lang_distribution(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidates (graft; md5-based => SQL-oracle-able)
# ---------------------------------------------------------------------------

N_PERM = 8


def _minhash_sig(text: str) -> list[str]:
    ws = text.split(" ")
    n = len(ws)
    shingles = [
        " ".join(ws[i - 1 : i + 2]) for i in range(1, max(n - 2, 1) + 1)
    ]
    sig = []
    for k in range(N_PERM):
        pre = f"{k}|"
        sig.append(min(hashlib.md5((pre + s).encode()).hexdigest() for s in shingles))
    return sig


def _near_clone_union(sf_dir: str):
    """documents plus per-doc perturbed clones (doc_id<25: text || suffix)
    so near-dup pairs exist deterministically in BOTH engines."""
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])
    clones = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .filter(expr="doc_id < 25")
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.add(t.column("doc_id"), 200000),
                    "text": pc.binary_join_element_wise(
                        t.column("text"), " nearly identical tail", ""
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return base.union(clones)


def q_minhash_lsh_pairs(sf_dir: str):
    """shingle -> minhash (8 perms) -> 8 bands of 1 -> band-bucket groupby
    -> candidate pairs. Signatures are computed per batch (stateless,
    vectorized over docs); the ONLY shuffle is the tiny (band, hash) one."""
    ds = _near_clone_union(sf_dir)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        rows_id, rows_band, rows_hash = [], [], []
        for did, text in zip(ids, batch.column("text").to_pylist()):
            for band, mh in enumerate(_minhash_sig(text)):
                rows_id.append(did)
                rows_band.append(band)
                rows_hash.append(mh)
        return pa.table(
            {
                "doc_id": pa.array(rows_id, type=pa.int64()),
                "band_id": pa.array(rows_band, type=pa.int32()),
                "band_hash": pa.array(rows_hash, type=pa.string()),
            }
        )

    bands = ds.map_batches(sig_batch, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # distinct pairs
    return cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


# ---------------------------------------------------------------------------
# ANN: brute-force cosine top-k (graft)
# ---------------------------------------------------------------------------

def q_ann_topk(sf_dir: str):
    """Embedding similarity search: broadcast the query vector, batch
    matmul in float64, local prune, tiny global sort+limit."""
    k = 20
    emb = pq.read_table(_p(sf_dir, "embeddings"))
    qvec = np.array(emb.column("embedding")[0].as_py(), dtype=np.float64)
    qn = qvec / np.linalg.norm(qvec)
    ref = ray.put(qn)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ q) / np.maximum(norms, 1e-12)
        t = pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "label": batch.column("label"),
                "cos": cos,
            }
        ).filter(pc.not_equal(batch.column("vec_id"), 0))
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows),
            sort_keys=[("cos", "descending"), ("vec_id", "ascending")],
        )
        return t.take(idx)

    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cos", "vec_id"], descending=[True, False])
        .limit(k)
        .select_columns(["vec_id", "label"])
    )


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

QUERIES = {
    "word_index": q_word_index,
    "stats_counts": q_stats_counts,
    "sites": q_sites,
    "exact_dedup": q_exact_dedup,
    "anti_join_unseen": q_anti_join_unseen,
    "topk": q_topk,
    "fifo_order": q_fifo_order,
    "pricing_summary": q_pricing_summary,
    "filter_scan": q_filter_scan,
    "broadcast_join": q_broadcast_join,
    "events_hourly": q_events_hourly,
    "distinct_types": q_distinct_types,
    "token_stats": q_token_stats,
    "quality_scores": q_quality_scores,
    "lang_distribution": q_lang_distribution,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ann_topk": q_ann_topk,
}

_MH_COLS = ", ".join(
    f"min(md5('{k}|' || shingle)) AS mh{k}" for k in range(N_PERM)
)
_BAND_CASE = " ".join(f"WHEN {k} THEN mh{k}" for k in range(N_PERM))

ORACLES = {
    "word_index": """
        SELECT word,
               count(*)               AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_postings
        FROM (
            SELECT doc_id, word, count(*) AS n
            FROM (
                SELECT doc_id, unnest(str_split(text, ' ')) AS word
                FROM documents
            )
            WHERE length(word) > 2
            GROUP BY doc_id, word
        )
        GROUP BY word
    """,
    "stats_counts": """
        SELECT count(*) AS fetched,
               count(CASE WHEN n_chars > 100 THEN 1 END) AS parsed
        FROM documents
    """,
    "sites": """
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    """,
    "exact_dedup": """
        SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM (
            SELECT md5(text) AS content_hash, doc_id FROM documents
            UNION ALL
            SELECT md5(text), doc_id + 100000 FROM documents WHERE doc_id < 50
        )
        GROUP BY content_hash
    """,
    "anti_join_unseen": """
        SELECT o_orderkey, o_custkey FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    "topk": """
        SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    "fifo_order": """
        SELECT row_number() OVER (ORDER BY ts, event_id) AS seq,
               event_id, ts, user_id
        FROM events ORDER BY ts, event_id LIMIT 1000
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_quantity) / count(*), 4) AS avg_qty,
               round(sum(l_discount) / count(*), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "filter_scan": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1995-07-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 10
    """,
    "broadcast_join": """
        SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 150000
    """,
    "events_hourly": """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               count(*) AS n_events, round(sum(value), 3) AS sum_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    "distinct_types": """
        SELECT DISTINCT event_type FROM events
    """,
    "token_stats": """
        SELECT doc_id, len(str_split(text, ' ')) AS n_tokens, n_chars
        FROM documents
    """,
    "quality_scores": """
        SELECT doc_id,
               round(cast(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1), 6) AS alpha_ratio,
               round(cast(length(text) AS DOUBLE)
                     / greatest(len(str_split(text, ' ')), 1), 6) AS avg_token_len
        FROM documents
    """,
    "lang_distribution": """
        SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    """,
    "minhash_lsh_pairs": f"""
        WITH base AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 200000, text || ' nearly identical tail'
            FROM documents WHERE doc_id < 25
        ),
        words AS (SELECT doc_id, str_split(text, ' ') AS ws FROM base),
        sh AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 2, 1)),
                       i -> array_to_string(ws[i:i+2], ' '))) AS shingle
            FROM words
        ),
        sig AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
        bands AS (
            SELECT doc_id, band_id,
                   CASE band_id {_BAND_CASE} END AS band_hash
            FROM sig, (SELECT unnest(generate_series(0, {N_PERM - 1})) AS band_id)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                     AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """,
    "ann_topk": """
        SELECT e.vec_id, e.label
        FROM embeddings e,
             (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) qq
        WHERE e.vec_id <> 0
        ORDER BY list_cosine_similarity(e.embedding, qq.q) DESC, e.vec_id
        LIMIT 20
    """,
}
