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
    with pytest.raises(DecodeUnavailable):
        ImageFeatureExtractor(fake=False)


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
