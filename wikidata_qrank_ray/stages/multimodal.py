"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

AUDIO decode is REAL (round 4): stdlib ``wave`` parses genuine RIFF/WAVE
payloads -- header + PCM frames -- in an actor-pool stage with a
value-exact oracle (AudioFeatureExtractor below). Image/video decode
kernels remain STUBBED (no image/video libraries in this container)
behind ``DecodeUnavailable`` or a deterministic fake, with the Ray-side
plumbing real and tested: schema, actor-pool signature, small batch
sizes for large binary payloads, and output layout.

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


# ---------------------------------------------------------------------------
# Real audio container decode (stdlib `wave`): the audio seam is no longer
# a stub -- payloads are genuine RIFF/WAVE binaries and the extractor
# PARSES them (header + PCM frames); only image/video decode remains
# environment-blocked behind DecodeUnavailable.
# ---------------------------------------------------------------------------

import io
import wave


def synth_wav_payload(media_id: int, sample_rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono WAV: n = 100 + media_id % 50 frames,
    sample k = ((media_id * 1000003 + k * 37) % 65536) - 32768. The
    sample formula is integer-exact and SQL-replayable, so a decoder that
    truly parses the container can be value-oracled end to end."""
    n = 100 + media_id % 50
    k = np.arange(n, dtype=np.int64)
    s = ((media_id * 1000003 + k * 37) % 65536) - 32768
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.astype("<i2").tobytes())
    return buf.getvalue()


class AudioFeatureExtractor:
    """Actor-pool stage that REALLY decodes WAV payloads: stdlib ``wave``
    parses the RIFF header (channels / width / rate / frame count) and the
    PCM frames are decoded to int16 -> integer-exact features
    (n_frames, sample_rate, duration_ms, sumsq, peak). Binary-safe Arrow
    batches, small batch_size (payloads dominate block size)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        outs = {"media_id": [], "n_frames": [], "sample_rate": [],
                "duration_ms": [], "sumsq": [], "peak": []}
        for mid, buf in zip(ids, batch["payload"].to_pylist()):
            with wave.open(io.BytesIO(buf), "rb") as w:
                assert w.getnchannels() == 1 and w.getsampwidth() == 2
                rate = w.getframerate()
                n = w.getnframes()
                pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.int64)
            outs["media_id"].append(mid)
            outs["n_frames"].append(n)
            outs["sample_rate"].append(rate)
            outs["duration_ms"].append(n * 1000 // rate)
            outs["sumsq"].append(int((pcm * pcm).sum()))
            outs["peak"].append(int(np.abs(pcm).max()) if n else 0)
        return pa.table({
            "media_id": pa.array(outs["media_id"], pa.int64()),
            "n_frames": pa.array(outs["n_frames"], pa.int64()),
            "sample_rate": pa.array(outs["sample_rate"], pa.int64()),
            "duration_ms": pa.array(outs["duration_ms"], pa.int64()),
            "sumsq": pa.array(outs["sumsq"], pa.int64()),
            "peak": pa.array(outs["peak"], pa.int64()),
        })


def extract_audio_features(media: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    return media.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=64,  # large binary rows: keep batches small
        concurrency=concurrency,
    )


AUDIO_FRAME_WIN = 32  # samples per analysis window


class AudioFrameExtractor:
    """Windowed audio analysis over REALLY decoded WAV payloads: the PCM
    stream splits into fixed AUDIO_FRAME_WIN-sample windows (short last
    window kept) and each window reduces to integer-exact energy features
    -> (media_id, win, n_samples, sumsq, peak). The per-payload loop is
    unavoidable (each row is an independent container); the per-window
    reduction is vectorized via np.add/maximum.reduceat."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, wins, ns, sumsq, peak = [], [], [], [], []
        for mid, buf in zip(batch["media_id"].to_pylist(),
                            batch["payload"].to_pylist()):
            with wave.open(io.BytesIO(buf), "rb") as w:
                assert w.getnchannels() == 1 and w.getsampwidth() == 2
                n = w.getnframes()
                pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.int64)
            if n == 0:
                continue
            starts = np.arange(0, n, AUDIO_FRAME_WIN)
            nw = len(starts)
            ids.extend([mid] * nw)
            wins.extend(range(nw))
            ends = np.minimum(starts + AUDIO_FRAME_WIN, n)
            ns.extend((ends - starts).tolist())
            sumsq.extend(np.add.reduceat(pcm * pcm, starts).tolist())
            peak.extend(np.maximum.reduceat(np.abs(pcm), starts).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "win": pa.array(wins, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "sumsq": pa.array(sumsq, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
        })


def extract_audio_frames(media: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    return media.map_batches(
        AudioFrameExtractor,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
