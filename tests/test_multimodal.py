"""Multimodal binary-column plumbing: per-kind stages (image resize, audio
framing, video frame sampling), explicit stubbed-codec failure, batch sizing,
kind-routed pipeline, partitioned sink layout."""

import os

import numpy as np
import pyarrow as pa
import pytest

from rayschema.multimodal import (
    AudioFrameStage,
    ImageResizeStage,
    MediaFeatureStage,
    VideoFrameSampleStage,
    fake_decode,
    media_feature_pipeline,
    resize_nearest,
    suggest_batch_size,
    synth_media_table,
    write_media_features,
)


def test_stub_raises_without_decode_fn():
    t = synth_media_table(4)
    for stage in (MediaFeatureStage(), ImageResizeStage(), AudioFrameStage(),
                  VideoFrameSampleStage()):
        with pytest.raises(NotImplementedError):
            stage(t)


def test_suggest_batch_size_budget():
    assert suggest_batch_size(1 << 20, budget_bytes=256 << 20, concurrency=8) == 32
    assert suggest_batch_size(1, concurrency=1) == 4096   # capped
    assert suggest_batch_size(1 << 30, concurrency=8) == 1  # floor


def test_resize_nearest_exact():
    t = np.arange(8, dtype=np.float32).reshape(2, 4)
    out = resize_nearest(t, 4, 2)
    # rows duplicate, columns pick every other source pixel
    assert out.shape == (4, 2)
    assert out[0].tolist() == [0.0, 2.0]
    assert out[3].tolist() == [4.0, 6.0]


def test_image_resize_stage():
    t = synth_media_table(32)
    out = ImageResizeStage(decode_fn=fake_decode, out_h=4, out_w=4)(t)
    kinds = out["kind"].to_pylist()
    pix = out["pixels"].to_pylist()
    for k, p in zip(kinds, pix):
        if k == "image":
            assert p is not None and len(p) == 16
        else:
            assert p is None
    # deterministic: same payload -> same pixels
    out2 = ImageResizeStage(decode_fn=fake_decode, out_h=4, out_w=4)(t)
    assert out["pixels"].to_pylist() == out2["pixels"].to_pylist()


def test_audio_frame_stage_counts():
    t = synth_media_table(32)
    out = AudioFrameStage(decode_fn=fake_decode, frame_len=8, hop=4)(t)
    for k, rms, n in zip(out["kind"].to_pylist(), out["frame_rms"].to_pylist(),
                         out["n_audio_frames"].to_pylist()):
        if k == "audio":
            # fake codec yields 32 samples -> sliding(8)[::4] = 7 frames
            assert n == 7 and len(rms) == 7
            assert all(r >= 0 for r in rms)
        else:
            assert rms is None and n == 0


def test_video_frame_sample_stage():
    t = synth_media_table(32)
    out = VideoFrameSampleStage(decode_fn=fake_decode, stride=2)(t)
    for k, idx in zip(out["kind"].to_pylist(), out["frame_idx"].to_pylist()):
        if k == "video":
            assert idx is not None and idx == list(range(0, max(idx) + 1, 2))
        else:
            assert idx is None


def test_media_pipeline_and_partitioned_sink(ray_session, tmp_path):
    import ray.data as rd

    t = synth_media_table(96)
    ds = rd.from_arrow(t)
    out = media_feature_pipeline(ds, decode_fn=fake_decode, concurrency=(1, 2))
    df = out.to_pandas()
    assert len(df) == 96
    assert set(df["kind"]) == {"image", "audio", "video"}
    assert (df.loc[df["kind"] == "image", "n_features"] == 16).all()
    out_dir = write_media_features(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        str(tmp_path / "media_feats"))
    kinds_on_disk = {d for d in os.listdir(out_dir) if d.startswith("kind=")}
    assert kinds_on_disk == {"kind=image", "kind=audio", "kind=video"}
