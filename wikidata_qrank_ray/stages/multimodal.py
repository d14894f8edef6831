"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container) behind ``DecodeUnavailable`` or a deterministic fake, but the
Ray-side plumbing is real and tested: schema, actor-pool signature, small
batch sizes for large binary payloads, and output layout.

Design notes for 100 TB: binary payloads dominate block size, so these
stages run with small ``batch_size`` and ``batch_format="pyarrow"`` (binary
columns don't survive pandas round-trips losslessly as zero-copy); let the
object store spill rather than holding decoded frames in Python lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),       # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real-decode paths: media libraries are not installed."""


class ImageFeatureExtractor:
    """Actor-pool stage: (media rows) -> (media_id, feature:list<float>).

    ``fake=True`` (default here) derives a deterministic 8-dim feature from
    the payload bytes -- the real path would load a vision model once per
    actor in __init__ and batch-infer in __call__.
    """

    def __init__(self, fake: bool = True, dim: int = 8):
        if not fake:
            raise DecodeUnavailable("no image decode library in this environment")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for buf in batch["payload"].to_pylist():
            arr = np.frombuffer(buf or b"\x00", dtype=np.uint8)
            # deterministic fake feature: byte histogram moments
            h = np.bincount(arr % self.dim, minlength=self.dim).astype(np.float32)
            feats.append(h / max(1.0, h.sum()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """video rows -> (media_id, frame_idx) rows at a fixed stride; the real
    path would demux frames -- here duration_ms drives a deterministic count."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        mids = batch["media_id"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        for mid, dur in zip(mids, durs):
            n = max(0, (dur or 0) // self.every_ms)
            ids.extend([mid] * n)
            frames.extend(range(n))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frames, type=pa.int32()),
            }
        )


def extract_image_features(media: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    return media.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=64,  # large binary rows: keep batches small
        concurrency=concurrency,
    )


def sample_frames(media: ray.data.Dataset, every_ms: int = 1000) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )


class CodepointHistogramExtractor:
    """Deterministic FAKE feature kernel with a SQL twin: payload is the
    utf-32-le encoding of a text (an opaque binary column as far as the
    pipeline is concerned); the 'feature' is the codepoint%dim histogram
    normalized by length, emitted as ``dim`` float64 columns. The Ray-side
    plumbing -- binary column, small batches, actor pool, typed output --
    is exactly what a real decoder stage uses; only the kernel is fake
    (and honest about it)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        feats = np.zeros((n, self.dim), dtype=np.float64)
        for i, buf in enumerate(batch["payload"].to_pylist()):
            if not buf:
                continue
            codes = np.frombuffer(buf, dtype=np.uint32)
            h = np.bincount(codes % np.uint32(self.dim), minlength=self.dim)
            feats[i] = h.astype(np.int64) / np.int64(len(codes))
        cols = {"media_id": batch["media_id"]}
        for j in range(self.dim):
            cols[f"f{j}"] = pa.array(feats[:, j])
        return pa.table(cols)


def extract_codepoint_features(
    media: ray.data.Dataset, dim: int = 8, concurrency: int = 2
) -> ray.data.Dataset:
    return media.map_batches(
        CodepointHistogramExtractor,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[np.arange(n) % 3]
    payloads = [rng.bytes(64 + (i % 5) * 32) for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n),
            "width": pa.array(np.where(kinds == "image", 64, -1).astype(np.int32)),
            "height": pa.array(np.where(kinds == "image", 64, -1).astype(np.int32)),
            "duration_ms": pa.array(
                np.where(kinds != "image", (np.arange(n) % 4) * 1500, -1).astype(np.int32)
            ),
        }
    )


class ImageResizer:
    """Actor-pool stage: media rows -> same layout with ``payload`` resized
    to ``(target_w, target_h)`` and width/height updated.

    The real kernel (decode -> resample -> re-encode) needs an image
    library this container doesn't have -- ``fake=False`` raises
    ``DecodeUnavailable``. The default deterministic fake treats the
    payload as a row-major byte raster of the row's (width, height) and
    nearest-neighbor samples it to the target size, so output payload
    length is EXACTLY target_w*target_h and downstream stages exercise
    real re-sized binary columns. Rows with unknown dims (-1) pass
    through unchanged.
    """

    def __init__(self, target_w: int, target_h: int, fake: bool = True):
        if not fake:
            raise DecodeUnavailable("no image decode library in this environment")
        self.tw = int(target_w)
        self.th = int(target_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        kinds = batch["kind"].to_pylist()
        out_p, out_w, out_h = [], [], []
        for buf, w, h, kind in zip(payloads, ws, hs, kinds):
            if kind != "image" or not buf or w is None or w <= 0 or h is None or h <= 0:
                out_p.append(buf)
                out_w.append(w if w is not None else -1)
                out_h.append(h if h is not None else -1)
                continue
            arr = np.frombuffer(buf, dtype=np.uint8)
            arr = arr[: w * h]
            if len(arr) < w * h:  # short payload: pad to the declared raster
                arr = np.pad(arr, (0, w * h - len(arr)))
            img = arr.reshape(h, w)
            yi = (np.arange(self.th) * h) // self.th
            xi = (np.arange(self.tw) * w) // self.tw
            out_p.append(img[np.ix_(yi, xi)].tobytes())
            out_w.append(self.tw)
            out_h.append(self.th)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out_p, type=pa.binary()),
                "mime": batch["mime"],
                "width": pa.array(out_w, type=pa.int32()),
                "height": pa.array(out_h, type=pa.int32()),
                "duration_ms": batch["duration_ms"],
            }
        )


def resize_images(
    media: ray.data.Dataset, target_w: int, target_h: int, concurrency: int = 2
) -> ray.data.Dataset:
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
