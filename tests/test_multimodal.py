import pytest
import ray
import ray.data

from wikidata_qrank_ray.stages.multimodal import (
    DecodeUnavailable,
    ImageFeatureExtractor,
    extract_image_features,
    sample_frames,
    synth_media_table,
)


def test_real_decode_path_is_gated():
    """fake=False is REAL for BMP since round 5; anything the container
    has no codec for (PNG/JPEG/...) still raises, at call time."""
    import numpy as np
    import pyarrow as pa

    from wikidata_qrank_ray.stages.multimodal import decode_bmp, synth_bmp_payload

    ex = ImageFeatureExtractor(fake=False)
    with pytest.raises(DecodeUnavailable):
        ex(pa.table({"media_id": pa.array([1], pa.int64()),
                     "payload": pa.array([b"\x89PNG..."], pa.binary())}))
    payload = synth_bmp_payload(3)
    out = ex(pa.table({"media_id": pa.array([3], pa.int64()),
                       "payload": pa.array([payload], pa.binary())}))
    px = decode_bmp(payload).ravel()
    h = np.bincount(px % 8, minlength=8).astype(np.float32)
    assert out["feature"][0].as_py() == pytest.approx((h / h.sum()).tolist())


def test_feature_extractor_plumbing():
    media = ray.data.from_arrow(synth_media_table(n=12))
    out = extract_image_features(media, concurrency=1).to_pandas()
    assert len(out) == 12
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic across runs
    out2 = extract_image_features(
        ray.data.from_arrow(synth_media_table(n=12)), concurrency=1
    ).to_pandas()
    assert out.sort_values("media_id")["feature"].apply(list).tolist() == \
        out2.sort_values("media_id")["feature"].apply(list).tolist()


def test_frame_sampler_counts():
    media = ray.data.from_arrow(synth_media_table(n=9))
    out = sample_frames(media, every_ms=1000).to_pandas()
    # durations are 0/1500/3000/4500 ms cycling -> 0/1/3/4 frames for non-images
    per = out.groupby("media_id").size()
    assert (per >= 1).all()


def test_resize_images_layout_and_determinism():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from wikidata_qrank_ray.stages.multimodal import (
        DecodeUnavailable,
        ImageResizer,
        resize_images,
        synth_media_table,
    )

    t = synth_media_table(n=12)
    out = (
        resize_images(ray.data.from_arrow(t), 4, 3)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    src = t.to_pandas().set_index("media_id").sort_index()
    for mid, row in out.iterrows():
        if src.loc[mid, "kind"] == "image" and src.loc[mid, "width"] > 0:
            assert row["width"] == 4 and row["height"] == 3
            assert len(row["payload"]) == 12
        else:  # non-images pass through untouched
            assert row["payload"] == src.loc[mid, "payload"]
    # deterministic: nearest-neighbor of a known 2x2 raster
    r = ImageResizer(2, 2)
    one = pa.table(
        {
            "media_id": pa.array([1], type=pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([bytes([10, 20, 30, 40])], type=pa.binary()),
            "mime": pa.array(["x"]),
            "width": pa.array([2], type=pa.int32()),
            "height": pa.array([2], type=pa.int32()),
            "duration_ms": pa.array([-1], type=pa.int32()),
        }
    )
    got = r(one)["payload"].to_pylist()[0]
    assert got == bytes([10, 20, 30, 40])  # identity resize
    # fake=False is the REAL BMP path since round 5: it parses the
    # container, so a non-BMP image payload raises at call time (the
    # honest seam for formats this container has no codec for)
    with pytest.raises(DecodeUnavailable):
        ImageResizer(2, 2, fake=False)(one)


def test_audio_decode_is_real():
    """The WAV extractor genuinely parses the container: header fields are
    read back from the bytes, PCM samples round-trip, and a corrupted
    payload raises instead of silently producing features."""
    import io
    import wave

    import numpy as np
    import pyarrow as pa
    import pytest

    from wikidata_qrank_ray.stages.multimodal import (
        AudioFeatureExtractor,
        synth_wav_payload,
    )

    payload = synth_wav_payload(7)
    with wave.open(io.BytesIO(payload), "rb") as w:  # genuine RIFF header
        assert w.getframerate() == 8000
        assert w.getnframes() == 100 + 7 % 50
    ex = AudioFeatureExtractor()
    out = ex(pa.table({"media_id": pa.array([7], pa.int64()),
                       "payload": pa.array([payload], pa.binary())}))
    k = np.arange(100 + 7 % 50, dtype=np.int64)
    s = ((7 * 1000003 + k * 37) % 65536) - 32768
    assert out["sumsq"][0].as_py() == int((s * s).sum())
    assert out["peak"][0].as_py() == int(np.abs(s).max())
    with pytest.raises(Exception):
        ex(pa.table({"media_id": pa.array([1], pa.int64()),
                     "payload": pa.array([b"not a wav"], pa.binary())}))


def test_bmp_decode_is_real():
    """The BMP codec genuinely parses the container: round-trips both row
    orders, honours per-row 4-byte padding and BGR order, reads geometry
    from the header, and rejects non-BMP / truncated / compressed
    payloads instead of silently producing features."""
    import struct

    import numpy as np
    import pyarrow as pa
    import pytest

    from wikidata_qrank_ray.stages.multimodal import (
        BmpFeatureExtractor,
        DecodeUnavailable,
        decode_bmp,
        encode_bmp,
        synth_bmp_payload,
    )

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 4), (5, 7), (2, 6)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for td in (False, True):
            buf = encode_bmp(px, top_down=td)
            # genuine container: magic, declared offset, signed height
            assert buf[:2] == b"BM"
            (off,) = struct.unpack_from("<I", buf, 10)
            assert off == 54
            _, ww, hh = struct.unpack_from("<Iii", buf, 14)
            assert ww == w and hh == (-h if td else h)
            assert (decode_bmp(buf) == px).all()

    # synth payload formula is replayed exactly by the extractor
    payload = synth_bmp_payload(9)
    img = decode_bmp(payload).astype(np.int64)
    assert img.shape == (3 + 9 % 4, 4 + 9 % 5, 3)
    out = BmpFeatureExtractor()(
        pa.table({"media_id": pa.array([9], pa.int64()),
                  "payload": pa.array([payload], pa.binary())})
    )
    assert out["sum_r"][0].as_py() == int(img[:, :, 0].sum())
    assert out["sumsq"][0].as_py() == int((img * img).sum())
    assert out["peak"][0].as_py() == int(img.max())

    for bad in (b"\x89PNG not a bmp", payload[:40], b"", None):
        with pytest.raises(DecodeUnavailable):
            decode_bmp(bad)
    # declared-but-truncated pixel array
    with pytest.raises(DecodeUnavailable):
        decode_bmp(payload[:-4])
    # compressed / non-24bpp variants are the honest seam
    hacked = bytearray(payload)
    struct.pack_into("<H", hacked, 28, 8)  # biBitCount = 8
    with pytest.raises(DecodeUnavailable):
        decode_bmp(bytes(hacked))


def test_bmp_patch_stats_match_brute_force():
    import numpy as np
    import pyarrow as pa

    from wikidata_qrank_ray.stages.multimodal import (
        BMP_PATCH,
        BmpPatchStatsExtractor,
        decode_bmp,
        synth_bmp_payload,
    )

    mids = list(range(12))
    batch = pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "payload": pa.array([synth_bmp_payload(m) for m in mids], pa.binary()),
    })
    out = BmpPatchStatsExtractor()(batch).to_pandas()
    for m in mids:
        img = decode_bmp(synth_bmp_payload(m)).astype(np.int64)
        h, w, _ = img.shape
        sub = out[out.media_id == m]
        ny = -(-h // BMP_PATCH)
        nx = -(-w // BMP_PATCH)
        assert len(sub) == ny * nx
        for _, r in sub.iterrows():
            tile = img[r.py * BMP_PATCH:(r.py + 1) * BMP_PATCH,
                       r.px * BMP_PATCH:(r.px + 1) * BMP_PATCH]
            assert r.n_px == tile.size
            assert r.psum == tile.sum()
            assert r.pmax == tile.max()


def test_bmp_real_resize_chain():
    """decode -> nearest-neighbor resample -> re-encode -> decode is
    integer-exact against the index-mapping replay, for both stored row
    orders, and non-image rows pass through untouched."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from wikidata_qrank_ray.stages.multimodal import (
        decode_bmp,
        resize_images,
        synth_bmp_payload,
    )

    mids = list(range(8))
    n = len(mids)
    t = pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "kind": pa.array(["image"] * (n - 1) + ["audio"]),
        "payload": pa.array(
            [synth_bmp_payload(m) for m in mids[:-1]] + [b"pcm-bytes"],
            pa.binary()),
        "mime": pa.array(["image/bmp"] * (n - 1) + ["audio/wav"]),
        "width": pa.array([-1] * n, pa.int32()),
        "height": pa.array([-1] * n, pa.int32()),
        "duration_ms": pa.array([-1] * n, pa.int32()),
    })
    out = (
        resize_images(ray.data.from_arrow(t), 4, 3, fake=False)
        .to_pandas().set_index("media_id").sort_index()
    )
    for m in mids[:-1]:
        img = decode_bmp(synth_bmp_payload(m))
        h, w, _ = img.shape
        got = decode_bmp(out.loc[m, "payload"])
        yi = (np.arange(3) * h) // 3
        xi = (np.arange(4) * w) // 4
        assert (got == img[np.ix_(yi, xi)]).all()
        assert out.loc[m, "width"] == 4 and out.loc[m, "height"] == 3
    # non-image row passes through
    assert out.loc[mids[-1], "payload"] == b"pcm-bytes"
    assert out.loc[mids[-1], "width"] == -1
