"""Multimodal map_batches stages: image resize/thumbnail, video frame
sampling, audio feature extraction.

All payloads ride opaque ``binary`` Arrow columns with typed metadata
(fmt/w/h, frame counts, sample counts); each stage is a callable class so
the real-codec initialization (PIL / PyAV / soundfile in production; the
deterministic OWLC/OWLV/OWLA codecs here) happens once per actor. Batch
sizes stay small because batch x concurrency of DECODED arrays is the
memory envelope (SURVEY.md §4 memory notes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codec


class Thumbnailer:
    """images batch (bytes) -> + thumb (encoded), thumb_w, thumb_h,
    thumb_phash. Undecodable payloads pass through with null thumbs."""

    def __init__(self, out_w: int = 32, out_h: int = 32, fmt: str = "jpeg"):
        self.out_w, self.out_h, self.fmt = out_w, out_h, fmt
        codec._dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs, tw, th, tph = [], [], [], []
        for buf in batch.column("bytes").to_pylist():
            try:
                pix, _, _, _ = codec.decode(bytes(buf))
                small = codec.resize_nearest(pix, self.out_w, self.out_h)
                thumbs.append(codec.encode(small, self.fmt))
                tw.append(self.out_w)
                th.append(self.out_h)
                tph.append(codec.phash64(small))
            except ValueError:
                thumbs.append(None)
                tw.append(0)
                th.append(0)
                tph.append(0)
        return (
            batch.append_column("thumb", pa.array(thumbs, pa.binary()))
            .append_column("thumb_w", pa.array(np.asarray(tw, np.int32)))
            .append_column("thumb_h", pa.array(np.asarray(th, np.int32)))
            .append_column("thumb_phash", pa.array(np.asarray(tph, np.int64)))
        )


class VideoFrameSampler:
    """videos batch (video_id, bytes) -> one row per sampled frame
    (video_id, frame_idx, frame bytes, w, h, phash). stride = every k-th
    frame. Foreign containers are skipped (counted via n_bad)."""

    def __init__(self, stride: int = 2, max_frames: int = 8, fmt: str = "png"):
        self.stride, self.max_frames, self.fmt = stride, max_frames, fmt
        self.n_bad = 0  # undecodable containers skipped by this actor
        codec._dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, frames, ws, hs, phs = [], [], [], [], [], []
        for vid, buf in zip(
            batch.column("video_id").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            try:
                sampled = codec.decode_video_frames(
                    bytes(buf), stride=self.stride, max_frames=self.max_frames
                )
            except ValueError:
                self.n_bad += 1
                continue
            for i, frame in enumerate(sampled):
                vids.append(vid)
                idxs.append(i * self.stride)
                frames.append(codec.encode(frame, self.fmt))
                hs.append(frame.shape[0])
                ws.append(frame.shape[1])
                phs.append(codec.phash64(frame))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(np.asarray(idxs, np.int32)),
                "frame": pa.array(frames, pa.binary()),
                "w": pa.array(np.asarray(ws, np.int32)),
                "h": pa.array(np.asarray(hs, np.int32)),
                "phash": pa.array(np.asarray(phs, np.int64)),
            }
        )


class AudioFeatures:
    """audio batch (clip_id, bytes) -> + n_samples, rms, zcr, peak."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, rms, zcr, peak = [], [], [], []
        for buf in batch.column("bytes").to_pylist():
            try:
                samples = codec.decode_audio(bytes(buf))
            except ValueError:
                samples = np.zeros(0, dtype=np.int16)
            f = codec.audio_features(samples)
            ns.append(len(samples))
            rms.append(f["rms"])
            zcr.append(f["zcr"])
            peak.append(f["peak"])
        return (
            batch.append_column("n_samples", pa.array(np.asarray(ns, np.int64)))
            .append_column("rms", pa.array(np.asarray(rms, np.float64)))
            .append_column("zcr", pa.array(np.asarray(zcr, np.float64)))
            .append_column("peak", pa.array(np.asarray(peak, np.float64)))
        )
