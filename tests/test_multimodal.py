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


def test_decode_ppm_golden():
    """Handcrafted 2x2 P6 image: decoded bytes must match exactly,
    luminance = channel mean / 255."""
    from rayschema.multimodal import decode_ppm

    rgb = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [30, 60, 90]]], dtype=np.uint8)
    payload = b"P6\n# a comment\n2 2\n255\n" + rgb.tobytes()
    got = decode_ppm(payload)
    assert (got["rgb"] == rgb).all()
    exp = rgb.astype(np.float32).mean(axis=2) / 255.0
    assert np.allclose(got["tensor"], exp)
    assert got["tensor"].shape == (2, 2)


def test_decode_pgm_and_roundtrip():
    from rayschema.multimodal import decode_ppm, encode_ppm

    g = np.array([[0, 128], [200, 255]], dtype=np.uint8)
    p5 = b"P5\n2 2\n255\n" + g.tobytes()
    got = decode_ppm(p5)
    assert np.allclose(got["tensor"], g.astype(np.float32) / 255.0)
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    rt = decode_ppm(encode_ppm(rgb))
    assert (rt["rgb"] == rgb).all()


def test_decode_bmp_golden():
    """Minimal bottom-up 24-bit BMP (2x2, stride padding) decodes to the
    expected RGB."""
    import struct

    from rayschema.multimodal import decode_bmp

    # rows stored bottom-up as BGR with 2-byte padding (stride 8)
    top = [(255, 0, 0), (0, 255, 0)]      # RGB of visual top row
    bot = [(0, 0, 255), (10, 20, 30)]
    def row(pix):
        return b"".join(bytes([b, g, r]) for r, g, b in pix) + b"\x00\x00"
    pixeldata = row(bot) + row(top)       # bottom-up
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixeldata), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixeldata),
                      2835, 2835, 0, 0)
    got = decode_bmp(header + dib + pixeldata)
    assert got["rgb"].shape == (2, 2, 3)
    assert tuple(got["rgb"][0, 0]) == (255, 0, 0)
    assert tuple(got["rgb"][0, 1]) == (0, 255, 0)
    assert tuple(got["rgb"][1, 1]) == (10, 20, 30)


def test_decode_wav_golden():
    """Handcrafted 16-bit PCM mono WAV: samples decode exactly (scaled by
    1/32768), sample rate surfaces, stereo downmixes by mean."""
    import struct

    from rayschema.multimodal import decode_wav

    pcm = np.array([0, 16384, -32768, 32767], dtype="<i2")
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + 8, b"WAVE",
                      b"fmt ", 16, 1, 1, 8000, 16000, 2, 16, b"data", 8)
    got = decode_wav(hdr + pcm.tobytes())
    assert got["sample_rate"] == 8000 and got["n_frames"] == 4
    assert np.allclose(got["tensor"],
                       [0.0, 0.5, -1.0, 32767 / 32768], atol=1e-6)
    # stereo: L/R interleaved, downmix = mean
    st = np.array([32767, -32767, 0, 16384], dtype="<i2")
    hdr2 = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + 8, b"WAVE",
                       b"fmt ", 16, 1, 2, 44100, 176400, 4, 16, b"data", 8)
    got2 = decode_wav(hdr2 + st.tobytes())
    assert got2["n_frames"] == 2
    assert abs(float(got2["tensor"][0])) < 1e-4          # L+R cancel
    assert abs(float(got2["tensor"][1]) - 0.25) < 1e-4


def test_wav_roundtrip_and_float_format():
    import struct

    from rayschema.multimodal import decode_wav, encode_wav

    x = np.sin(np.linspace(0, 6.28, 100)).astype(np.float32) * 0.8
    rt = decode_wav(encode_wav(x, sample_rate=16000))
    assert rt["sample_rate"] == 16000
    # one LSB quantization + the 32767-encode/32768-decode scale asymmetry
    assert np.allclose(rt["tensor"], x, atol=2.0 / 32768)
    # IEEE-float WAV (format tag 3)
    f = np.array([0.25, -0.5], dtype="<f4")
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + 8, b"WAVE",
                      b"fmt ", 16, 3, 1, 8000, 32000, 4, 32, b"data", 8)
    got = decode_wav(hdr + f.tobytes())
    assert np.allclose(got["tensor"], [0.25, -0.5])


def test_decode_y4m_golden_and_roundtrip():
    from rayschema.multimodal import decode_y4m, encode_y4m

    frames = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4) * 5
    got = decode_y4m(encode_y4m(frames, fps=30))
    assert got["n_frames"] == 2
    assert got["fps_num"] == 30 and got["fps_den"] == 1
    assert got["tensor"].shape == (2, 2, 4)
    assert np.allclose(got["tensor"], frames.astype(np.float32) / 255.0)
    # mono colorspace: no chroma planes between frames
    y = np.full((1, 2, 2), 9, dtype=np.uint8)
    mono = b"YUV4MPEG2 W2 H2 Cmono\x0a" + b"FRAME\x0a" + y.tobytes()
    g2 = decode_y4m(mono)
    assert g2["n_frames"] == 1 and np.allclose(g2["tensor"][0], 9 / 255.0)


def test_real_audio_video_decode_end_to_end(ray_session):
    """The synth table's audio/video payloads are real WAV/Y4M; the default
    codec table decodes them for real — frame counts must match the actual
    sample/frame structure, not the fake codec's 32-sample digest."""
    import ray.data as rd

    from rayschema.multimodal import (
        AudioFrameStage,
        VideoFrameSampleStage,
        decode_wav,
        decode_y4m,
        default_decode,
        synth_media_table,
    )

    t = synth_media_table(64)
    payloads = dict(zip(t.column("media_id").to_pylist(),
                        t.column("payload").to_pylist()))
    aud = (rd.from_arrow(t).filter(expr="kind == 'audio'")
           .map_batches(AudioFrameStage,
                        fn_constructor_kwargs=dict(decode_fn=default_decode,
                                                   frame_len=8, hop=4),
                        batch_format="pyarrow", batch_size=16,
                        concurrency=(1, 2)).to_pandas().set_index("media_id"))
    assert len(aud) > 5
    for mid, row in aud.iterrows():
        # synth audio rotates WAV (plain + compressed) and FLAC — dispatch
        n_samp = len(default_decode(payloads[mid], "audio")["tensor"])
        assert row["n_audio_frames"] == (n_samp - 8) // 4 + 1
    vid = (rd.from_arrow(t).filter(expr="kind == 'video'")
           .map_batches(VideoFrameSampleStage,
                        fn_constructor_kwargs=dict(decode_fn=default_decode,
                                                   stride=2),
                        batch_format="pyarrow", batch_size=16,
                        concurrency=(1, 2)).to_pandas().set_index("media_id"))
    assert len(vid) > 5
    for mid, row in vid.iterrows():
        # synth videos alternate Y4M and MJPEG-AVI — dispatch like the stage
        d = default_decode(payloads[mid], "video")
        nf = int(d["n_frames"])
        assert list(row["frame_idx"]) == list(range(0, nf, 2))
        # sampled frame means come from the REAL luma planes
        exp0 = float(d["tensor"][0].mean())
        assert abs(row["frame_mean"][0] - exp0) < 1e-6


def test_real_image_decode_end_to_end(ray_session):
    """multimodal_features runs a REAL decode for every image row of the
    synthetic table (no fake codec on the image path): feat_mean must equal
    the luminance mean of the actual decoded pixels — PPM rows via
    decode_ppm, JPEG rows via the round-4 baseline JPEG decoder."""
    import ray.data as rd

    from rayschema.jpeg import decode_jpeg
    from rayschema.multimodal import (
        MediaFeatureStage,
        decode_ppm,
        default_decode,
        synth_media_table,
    )

    t = synth_media_table(128)
    out = (rd.from_arrow(t)
           .map_batches(MediaFeatureStage,
                        fn_constructor_kwargs=dict(decode_fn=default_decode),
                        batch_format="pyarrow", batch_size=16,
                        concurrency=(1, 2))
           .to_pandas().set_index("media_id"))
    payloads = dict(zip(t.column("media_id").to_pylist(),
                        t.column("payload").to_pylist()))
    kinds = dict(zip(t.column("media_id").to_pylist(),
                     t.column("kind").to_pylist()))
    n_ppm = n_jpg = 0
    for mid, k in kinds.items():
        if k != "image":
            continue
        p = payloads[mid]
        if p[:2] == b"\xff\xd8":
            n_jpg += 1
            exp = float(decode_jpeg(p)["tensor"].mean())
            dim = 256                          # 16x16 luminance tensor
        elif p[:6] in (b"GIF87a", b"GIF89a"):
            from rayschema.codecs import decode_gif
            exp = float(decode_gif(p)["tensor"].mean())
            dim = 54                           # 6x9 luminance tensor
        elif p[:8] == b"\x89PNG\r\n\x1a\n":
            from rayschema.codecs import decode_png
            exp = float(decode_png(p)["tensor"].mean())
            dim = 120                          # 12x10 luminance tensor
        elif p[:4] in (b"II*\x00", b"MM\x00*"):
            from rayschema.codecs import decode_tiff
            exp = float(decode_tiff(p)["tensor"].mean())
            dim = 99                           # 9x11 luminance tensor
        else:
            n_ppm += 1
            exp = float(decode_ppm(p)["tensor"].mean())
            dim = 32                           # 4x8 luminance tensor
        assert abs(out.loc[mid, "feat_mean"] - exp) < 1e-6
        assert out.loc[mid, "feat_dim"] == dim
    assert n_ppm >= 1 and n_jpg >= 1


def test_jpeg_roundtrip_444_and_420():
    """Baseline JPEG codec golden: encode->decode round trips a smooth RGB
    image within quantization error at 4:4:4 and 4:2:0; dims preserved for
    non-multiple-of-16 sizes."""
    from rayschema.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack([xx * 255 // 52, yy * 255 // 36,
                    127 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0)],
                   axis=2).clip(0, 255).astype(np.uint8)
    for sub, tol in ((False, 2.0), (True, 8.0)):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert out["rgb"].shape == img.shape
        assert out["n_frames"] == 1
        err = np.abs(out["rgb"].astype(int) - img.astype(int)).mean()
        assert err < tol, (sub, err)


def test_jpeg_flat_image_exact_and_grayscale():
    from rayschema.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((16, 24, 3), 200, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert np.abs(out["rgb"].astype(int) - 200).max() == 0

    yy = np.mgrid[0:24, 0:32][0]
    g = (yy * 255 // 23).astype(np.uint8)
    og = decode_jpeg(encode_jpeg(g, quality=90))
    assert og["rgb"].shape == (24, 32, 3)
    assert np.abs(og["rgb"][:, :, 0].astype(int) - g.astype(int)).mean() < 1.5


def test_jpeg_decoder_guards():
    import pytest as _pytest

    from rayschema.jpeg import decode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"nope")
    # lossless (SOF3) must be rejected, not mis-decoded
    from rayschema.jpeg import encode_jpeg
    data = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(data))
    # a baseline stream mislabeled SOF2 is malformed progressive (its
    # interleaved Ss=0..Se=63 scan violates T.81 G.1) — rejected, not
    # silently DC-only decoded
    data[i + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_jpeg_geometry_fuzz():
    """Shape integrity across awkward dims (1x1, 7x9, 8x8, 15x17, 16x16,
    33x31), both subsampling modes, colors and grayscale: decode always
    returns the exact input dims, deterministically, with bounded error
    on smooth content."""
    from rayschema.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(123)
    for h, w in [(1, 1), (7, 9), (8, 8), (15, 17), (16, 16), (33, 31)]:
        yy, xx = np.mgrid[0:h, 0:w]
        smooth = np.stack([
            (xx * 255) // max(w - 1, 1),
            (yy * 255) // max(h - 1, 1),
            np.full((h, w), 77)], axis=2).astype(np.uint8)
        for sub in (False, True):
            data = encode_jpeg(smooth, quality=92, subsample=sub)
            assert data == encode_jpeg(smooth, quality=92, subsample=sub)
            out = decode_jpeg(data)
            assert out["rgb"].shape == (h, w, 3), (h, w, sub)
            err = np.abs(out["rgb"].astype(int)
                         - smooth.astype(int)).mean()
            assert err < 12, (h, w, sub, err)
        g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
        og = decode_jpeg(encode_jpeg(g, quality=92))
        assert og["rgb"].shape == (h, w, 3)
    # noise content: no exception, exact dims (error unconstrained)
    noisy = rng.randint(0, 256, (19, 13, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(noisy, quality=50,
                                   subsample=True))["rgb"].shape \
        == (19, 13, 3)


def test_progressive_jpeg_matches_baseline_exactly():
    """Cross-codec oracle: SOF2 progressive decode must equal baseline
    decode of the SAME quantized coefficients pixel for pixel — a
    symmetric encoder/decoder bug in the Annex-G scan logic cannot
    cancel out across the two codecs."""
    from rayschema.jpeg import (decode_jpeg, encode_jpeg,
                                encode_jpeg_progressive)

    rng = np.random.default_rng(3)
    for (h, w) in ((40, 56), (33, 49), (8, 24)):
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        img = np.stack([
            (x * 255 // w).astype(np.uint8),
            (y * 255 // h).astype(np.uint8),
            ((x + y) % 256).astype(np.uint8)], axis=2)
        img[h // 4:h // 2, w // 4:w // 2] = rng.integers(
            0, 256, (h // 2 - h // 4, w // 2 - w // 4, 3), dtype=np.uint8)
        for subsample in (False, True):
            for q in (85, 50):
                base = decode_jpeg(encode_jpeg(
                    img, quality=q, subsample=subsample))
                prog = decode_jpeg(encode_jpeg_progressive(
                    img, quality=q, subsample=subsample))
                assert np.array_equal(base["rgb"], prog["rgb"]), \
                    (h, w, subsample, q)


def test_progressive_jpeg_golden_pixels():
    """Golden-pixel pin: a fixed 4:4:4 progressive stream decodes to
    exact known values (4:4:4 q=95 is near-lossless on smooth data)."""
    from rayschema.jpeg import decode_jpeg, encode_jpeg_progressive

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(16, dtype=np.uint8)[None, :] * 16
    img[:, :, 1] = 128
    img[:, :, 2] = np.arange(16, dtype=np.uint8)[:, None] * 16
    out = decode_jpeg(encode_jpeg_progressive(img, quality=95))
    assert out["rgb"].shape == (16, 16, 3)
    assert int(out["n_frames"]) == 1
    # near-lossless: mean abs error tiny, structure preserved exactly
    err = np.abs(out["rgb"].astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 12
    assert np.all(np.diff(out["rgb"][8, :, 0].astype(int)) >= 0)


def test_progressive_jpeg_grayscale_roundtrip():
    from rayschema.jpeg import (decode_jpeg, encode_jpeg,
                                encode_jpeg_progressive)

    x, y = np.meshgrid(np.arange(24), np.arange(16))
    g = ((x * 5 + y * 3) % 256).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(g, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(g, quality=85))
    assert np.array_equal(base["rgb"], prog["rgb"])


def test_synth_media_rotates_progressive_jpeg():
    """The media table carries real SOF2 payloads and the decode stage
    handles them end to end (magic-sniffed, no mime dispatch needed)."""
    t = synth_media_table(96)
    mimes = t.column("mime").to_pylist()
    assert "image/jpeg;progressive" in mimes
    i = mimes.index("image/jpeg;progressive")
    payload = t.column("payload")[i].as_py()
    assert payload[:2] == b"\xff\xd8"
    assert b"\xff\xc2" in payload            # SOF2 marker present
    from rayschema.multimodal import default_decode
    out = default_decode(payload, "image")
    assert out["rgb"].shape == (16, 16, 3)


def test_progressive_jpeg_truncation_fails_clean():
    """A progressive stream cut inside a scan raises (EOFError from the
    bit reader or ValueError from the parser) — never hangs or returns
    silently-wrong pixels."""
    import pytest as _pytest

    from rayschema.jpeg import decode_jpeg, encode_jpeg_progressive

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    blob = encode_jpeg_progressive(img, quality=85)
    for cut in (len(blob) // 3, len(blob) // 2, len(blob) - 10):
        with _pytest.raises((ValueError, EOFError, IndexError)):
            decode_jpeg(blob[:cut])


def test_media_mix_real_decode_rate_is_total():
    """Measured stub-rate on the synthetic media mix (the r4 verdict's
    codec-boundary metric): every payload the rotation produces decodes
    through a REAL codec — the deterministic fake is reached by NONE of
    them. The boundary (MP3 Layer III / AAC, H.264/HEVC) exists only
    for real-world corpora, and this pins that it cannot silently grow."""
    from rayschema import multimodal as mm

    t = synth_media_table(256)
    hits = {"real": 0, "fake": 0}
    orig = mm.fake_decode

    def counting_fake(payload, kind):
        hits["fake"] += 1
        return orig(payload, kind)

    mm.fake_decode = counting_fake
    try:
        for payload, kind in zip(t.column("payload").to_pylist(),
                                 t.column("kind").to_pylist()):
            out = mm.default_decode(payload, kind)
            assert "tensor" in out
            hits["real"] += 1
    finally:
        mm.fake_decode = orig
    assert hits["fake"] == 0 and hits["real"] == 256


def test_progressive_jpeg_with_restart_intervals():
    """Progressive streams with DRI/RSTn restart markers (common in real
    web JPEGs) decode bit-identically to baseline: DC predictor and
    EOBRUN reset at each marker, in every scan kind."""
    from rayschema.jpeg import (decode_jpeg, encode_jpeg,
                                encode_jpeg_progressive)

    rng = np.random.default_rng(11)
    x, y = np.meshgrid(np.arange(49), np.arange(33))
    img = np.stack([(x * 5 % 256).astype(np.uint8),
                    (y * 7 % 256).astype(np.uint8),
                    ((x + y) % 256).astype(np.uint8)], axis=2)
    img[8:20, 8:20] = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    for sub in (False, True):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        for ri in (1, 2, 3, 7):
            blob = encode_jpeg_progressive(img, quality=85,
                                           subsample=sub,
                                           restart_interval=ri)
            assert b"\xff\xdd" in blob          # DRI present
            assert any(bytes([0xFF, 0xD0 + k]) in blob for k in range(8))
            prog = decode_jpeg(blob)
            assert np.array_equal(base["rgb"], prog["rgb"]), (sub, ri)
