"""Image stages (graft axis): explode page image refs -> fetch bytes ->
decode/phash -> rows in the BASELINE.json input_hint shape
(image_id, bytes, w, h, fmt, caption, phash).

The reference has no image handling; the north rule grafts it on. Binary
payloads ride ``large_binary`` Arrow columns end to end (zero-copy through
the object store); decode is numpy-vectorized per image with state-free
kernels, run as an actor-pool stage with a SMALL batch_size so
batch x concurrency of decoded pixel arrays stays within worker heaps.
"""

from __future__ import annotations

import numpy as np
import logging

import pyarrow as pa

from ..functions import codec, ids
from ..sources.corpus import SyntheticWeb, WebConfig

_LOG = logging.getLogger("owlcrawler_ray.images")

class ImageFetcher:
    """image_url batch -> +bytes (corpus-backed; a real impl holds an HTTP
    session per actor). Missing/foreign urls yield empty bytes + ok=False."""

    def __init__(self, web_cfg: WebConfig):
        self.web = SyntheticWeb(web_cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("image_url").to_pylist()
        bufs, oks = [], []
        for u in urls:
            try:
                bufs.append(self.web.image_bytes(u))
                oks.append(True)
            except KeyError:
                bufs.append(b"")
                oks.append(False)
        return batch.append_column(
            "bytes", pa.array(bufs, type=pa.large_binary())
        ).append_column("ok", pa.array(oks, type=pa.bool_()))


class ImageDecoder:
    """+bytes -> image_id, w, h, fmt, phash (the input_hint row shape).

    Rows whose payload fails to decode are dropped, mirroring the
    reference's drop-on-error stance for fetch failures (fetcher.go:
    51-54); the per-actor ``n_bad`` counter and a WARNING log record the
    drop volume (the "no silent caps" rule).
    """

    def __init__(self):
        codec._dct_matrix(32)  # build the DCT basis once per actor
        self.n_bad = 0  # undecodable payloads dropped by this actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("image_url").to_pylist()
        bufs = batch.column("bytes").to_pylist()
        caps = batch.column("caption").to_pylist()
        ticks = batch.column("tick").to_pylist()
        idxs = batch.column("img_idx").to_pylist()
        pages = (
            batch.column("page_url").to_pylist()
            if "page_url" in batch.column_names else [None] * len(urls)
        )
        rows = {k: [] for k in
                ("image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                 "tick", "img_idx", "page_url")}
        for u, b, c, t, i, p in zip(urls, bufs, caps, ticks, idxs, pages):
            if not b:
                continue
            try:
                pix, fmt, w, h = codec.decode(bytes(b))
            except ValueError:  # codec normalizes all corrupt-payload errors
                self.n_bad += 1
                _LOG.warning("ImageDecoder: dropped undecodable payload "
                             "for %s (%d so far on this actor)", u, self.n_bad)
                continue
            rows["image_id"].append(ids.doc_id(u))
            rows["bytes"].append(b)
            rows["w"].append(w)
            rows["h"].append(h)
            rows["fmt"].append(fmt)
            rows["caption"].append(c)
            rows["phash"].append(codec.phash64(pix))
            rows["tick"].append(t)
            rows["img_idx"].append(i)
            rows["page_url"].append(p)
        out = pa.table(
            {
                "image_id": pa.array(rows["image_id"], type=pa.string()),
                # large_binary (64-bit offsets), same as the fetch stage:
                # int32-offset binary overflows past 2 GiB of payload per
                # batch — the module contract is large_binary end to end
                "bytes": pa.array(rows["bytes"], type=pa.large_binary()),
                "w": pa.array(np.asarray(rows["w"], dtype=np.int32)),
                "h": pa.array(np.asarray(rows["h"], dtype=np.int32)),
                "fmt": pa.array(rows["fmt"], type=pa.string()),
                "caption": pa.array(rows["caption"], type=pa.string()),
                "phash": pa.array(np.asarray(rows["phash"], dtype=np.int64)),
                "tick": pa.array(np.asarray(rows["tick"], dtype=np.int64)),
                "img_idx": pa.array(np.asarray(rows["img_idx"], dtype=np.int32)),
            }
        )
        if "page_url" in batch.column_names:
            out = out.append_column(
                "page_url", pa.array(rows["page_url"], type=pa.string())
            )
        return out
