"""Embedding-column kernels: zero-copy list<float> -> ndarray matrix.

Every ANN / dedup / centroid stage over the ``embeddings`` table needs
the batch's ``list<float>`` column as an (n, d) float64 matrix. The
historical path was ``np.asarray(col.to_pylist(), dtype=np.float64)`` —
a per-row, per-element Python-object walk (n x d PyFloat boxes per
batch), the exact "Python loop in a hot stage" shape the scale rules
forbid. This kernel goes through the Arrow values buffer instead:
one zero-copy ``to_numpy`` over the flat child array + a reshape.

Bit-identity with the old path is guaranteed by IEEE-754: both routes
widen each float32 value to float64 exactly (to_pylist boxes the f32 as
a Python float = f64; astype(f64) performs the same exact widening), so
every downstream cosine / centroid / code computation is unchanged.
Pinned by tests/test_vecs.py (random, chunked, sliced, empty inputs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """Fixed-width ``list<float>`` column -> (n, d) ndarray, no Python
    boxing. Accepts Array or ChunkedArray (chunks combined once), honors
    slices (offsets window into the shared values buffer), and fails
    loudly on ragged widths or null rows — an embedding table with
    either is corrupt upstream, not something to paper over here."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("list_to_matrix: null embedding rows")
    offs = np.asarray(col.offsets, dtype=np.int64)
    widths = np.diff(offs)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("list_to_matrix: ragged list widths")
    # .values is the UNSLICED child array; offs[] are absolute into it
    flat = col.values.slice(offs[0], n * d).to_numpy(zero_copy_only=False)
    return flat.reshape(n, d).astype(dtype, copy=False)
