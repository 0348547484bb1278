"""Writer<->parser round-trips for the entropy-coded-boundary metadata
probes (rayschema/mediaprobe.py): MPEG audio frame walk, AAC ADTS walk,
H.264 Annex-B NAL/SPS parse, and the MediaProbeStage Ray plumbing."""
import numpy as np
import pyarrow as pa
import pytest

from rayschema import mediaprobe as mp


# ---------------------------------------------------------------- MPEG audio

def test_mp3_cbr_walk():
    b = mp.synth_mpeg_audio_stream(25, layer=3, sample_rate=44100, kbps=128)
    info = mp.probe_mpeg_audio(b)
    assert info["codec"] == "mp3"
    assert info["n_frames"] == 25
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert not info["vbr"]
    assert info["avg_kbps"] == 128
    assert info["clean_eof"] and info["trailing_bytes"] == 0
    assert info["duration_s"] == pytest.approx(25 * 1152 / 44100)
    assert info["frame_offsets"][0] == 0
    assert len(info["frame_offsets"]) == 25


def test_mp3_vbr_and_xing():
    rates = [64, 128, 192, 96]
    b = mp.synth_mpeg_audio_stream(16, layer=3, kbps=rates, xing=True)
    info = mp.probe_mpeg_audio(b)
    assert info["vbr"]
    assert info["xing"]["tag"] == "Xing"
    assert info["xing"]["frames"] == 16
    assert info["xing"]["bytes"] == len(b)
    assert info["avg_kbps"] == pytest.approx(np.mean(rates))


def test_mp3_id3_and_mono_and_layers():
    body = mp.synth_mpeg_audio_stream(8, layer=3, kbps=64, channels=1)
    tag = b"TAGDATA!"
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, len(tag) >> 7, len(tag) & 0x7F]) \
        + tag
    info = mp.probe_mpeg_audio(id3 + body)
    assert info["channels"] == 1 and info["n_frames"] == 8
    for layer, spf in ((1, 384), (2, 1152)):
        b = mp.synth_mpeg_audio_stream(6, layer=layer, kbps=192)
        inf = mp.probe_mpeg_audio(b)
        assert inf["layer"] == layer
        assert inf["duration_s"] == pytest.approx(6 * spf / 44100)


def test_mp3_truncation_reported_not_guessed():
    b = mp.synth_mpeg_audio_stream(10, layer=3, kbps=128)
    cut = b[: len(b) - 100]
    info = mp.probe_mpeg_audio(cut)
    assert info["n_frames"] == 9
    assert not info["clean_eof"]
    assert info["trailing_bytes"] > 0
    with pytest.raises(ValueError):
        mp.probe_mpeg_audio(b"\x00\x01garbage")


# ---------------------------------------------------------------------- ADTS

def test_adts_walk():
    b = mp.synth_adts_stream(40, sample_rate=48000, channels=2,
                             body_bytes=300)
    info = mp.probe_adts(b)
    assert info["codec"] == "aac" and info["profile"] == "LC"
    assert info["n_frames"] == 40
    assert info["sample_rate"] == 48000 and info["channels"] == 2
    assert info["duration_s"] == pytest.approx(40 * 1024 / 48000)
    assert info["clean_eof"]
    expected_kbps = 307 * 8 * 40 / info["duration_s"] / 1000
    assert info["avg_kbps"] == pytest.approx(expected_kbps)


def test_adts_truncation():
    b = mp.synth_adts_stream(5, body_bytes=100)
    info = mp.probe_adts(b[:-50])
    assert info["n_frames"] == 4 and not info["clean_eof"]
    with pytest.raises(ValueError):
        mp.probe_adts(b"\x12\x34\x56\x78" * 4)


# ---------------------------------------------------------------------- H264

def test_h264_nal_inventory_and_sps():
    b = mp.synth_h264_stream(n_gops=3, gop=5, width=640, height=480)
    info = mp.probe_h264_annexb(b)
    assert info["codec"] == "h264"
    assert info["width"] == 640 and info["height"] == 480
    assert info["profile_idc"] == 66 and info["level_idc"] == 30
    assert info["n_keyframes"] == 3
    assert info["n_pictures"] == 15
    assert info["nal_counts"]["sps"] == 1
    assert info["nal_counts"]["pps"] == 1
    assert info["nal_counts"]["idr"] == 3
    assert info["nal_counts"]["slice"] == 12


def test_h264_sps_cropping_and_high_profile():
    # hand-build a High-profile SPS with cropping: 1920x1080 from 1920x1088
    w = mp._BitsW()
    w.u(100, 8).u(0, 8).u(40, 8)          # High, level 4.0
    w.ue(0)                               # sps id
    w.ue(1)                               # chroma_format_idc 4:2:0
    w.ue(0).ue(0)                         # bit depths
    w.u(0, 1)                             # transform bypass
    w.u(0, 1)                             # no scaling matrix
    w.ue(0)                               # log2_max_frame_num_minus4
    w.ue(2)                               # poc type
    w.ue(4)                               # max_num_ref_frames
    w.u(0, 1)
    w.ue(1920 // 16 - 1)
    w.ue(1088 // 16 - 1)
    w.u(1, 1)                             # frame_mbs_only
    w.u(1, 1)                             # direct_8x8
    w.u(1, 1)                             # cropping
    w.ue(0).ue(0).ue(0).ue(4)             # bottom crop 4 -> -8 luma rows
    w.u(0, 1)                             # no VUI
    sps = mp.parse_sps(w.rbsp_trailing().bytes())
    assert sps["width"] == 1920 and sps["height"] == 1080
    assert sps["profile_idc"] == 100


def test_h264_emulation_prevention_roundtrip():
    raw = b"\x00\x00\x00\x00\x01\x00\x00\x02\x7f\x00\x00\x03ab"
    esc = mp._escape_rbsp(raw)
    assert mp._unescape_rbsp(esc) == raw
    # no bare start codes survive escaping
    assert b"\x00\x00\x01" not in esc and b"\x00\x00\x00" not in esc


def test_h264_garbage_raises():
    with pytest.raises(ValueError):
        mp.probe_h264_annexb(b"\xff\xfe\xfd no start codes here")


# ------------------------------------------------------------------ dispatch

def test_probe_media_dispatch():
    assert mp.probe_media(
        mp.synth_mpeg_audio_stream(3, layer=3, kbps=128))["codec"] == "mp3"
    assert mp.probe_media(mp.synth_adts_stream(3))["codec"] == "aac"
    assert mp.probe_media(mp.synth_h264_stream(1, 2))["codec"] == "h264"
    assert mp.probe_media(b"\x89PNG\r\n\x1a\nxxxx")["codec"] == "png"
    assert mp.probe_media(b"\xff\xd8\xff\xe0rest")["codec"] == "jpeg"
    with pytest.raises(ValueError):
        mp.probe_media(b"\x01\x02\x03\x04")


# ------------------------------------------------------------------ Ray stage

def test_media_probe_stage_batch(ray_session):
    import ray
    payloads = [
        mp.synth_mpeg_audio_stream(10, layer=3, kbps=128),
        mp.synth_adts_stream(8, sample_rate=44100),
        mp.synth_h264_stream(2, 3, width=320, height=240),
        b"not-a-media-file",
        None,
    ]
    kinds = ["audio", "audio", "video", "audio", "audio"]
    t = pa.table({"media_id": list(range(5)), "kind": kinds,
                  "payload": pa.array(payloads, type=pa.binary())})
    ds = ray.data.from_arrow(t).map_batches(
        mp.MediaProbeStage, concurrency=1, batch_size=5,
        batch_format="pyarrow")
    out = ds.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert list(out["codec"][:3]) == ["mp3", "aac", "h264"]
    assert out["n_frames"][0] == 10
    assert out["duration_s"][1] == pytest.approx(8 * 1024 / 44100)
    assert out["width"][2] == 320 and out["n_keyframes"][2] == 2
    assert out["probe_err"][3] is not None
    assert out["probe_err"][4] is not None
    assert "payload" not in out.columns


# ------------------------------------------------------------------ HEVC

def test_hevc_nal_inventory():
    b = mp.synth_hevc_stream(n_gops=3, gop=5, width=1280, height=720)
    info = mp.probe_hevc_annexb(b)
    assert info["codec"] == "hevc"
    assert info["width"] == 1280 and info["height"] == 720
    assert info["profile_idc"] == 1 and info["level_idc"] == 120
    assert info["nal_counts"]["vps"] == 1
    assert info["nal_counts"]["sps"] == 1
    assert info["nal_counts"]["pps"] == 1
    assert info["nal_counts"]["idr_w_radl"] == 3
    assert info["nal_counts"]["vcl1"] == 12
    assert info["n_keyframes"] == 3
    assert info["n_pictures"] == 15


def test_hevc_vs_h264_dispatch():
    assert mp.probe_media(mp.synth_hevc_stream(1, 2))["codec"] == "hevc"
    assert mp.probe_media(mp.synth_h264_stream(1, 2))["codec"] == "h264"


# ------------------------------------------------------------------ MP4

def test_mp4_walk():
    b = mp.synth_mp4(width=1280, height=720, n_samples=120,
                     timescale=600, duration=3000, codec=b"avc1")
    info = mp.probe_mp4(b)
    assert info["container"] == "mp4" and info["brand"] == "isom"
    assert info["codec"] == "avc1"
    assert info["width"] == 1280 and info["height"] == 720
    assert info["n_frames"] == 120
    assert info["duration_s"] == pytest.approx(5.0)
    assert info["n_tracks"] == 1
    assert mp.probe_media(b)["codec"] == "avc1"


def test_mp4_malformed_raises():
    good = mp.synth_mp4()
    with pytest.raises(ValueError):
        mp.probe_mp4(b"\x00\x00\x00\x08mdat")          # no ftyp
    bad = bytearray(good)
    bad[0:4] = (len(good) + 99).to_bytes(4, "big")     # box overruns
    with pytest.raises(ValueError):
        mp.probe_mp4(bytes(bad))
    # an EMPTY mvhd leaf at end-of-stream must raise ValueError, not
    # IndexError (MediaProbeStage only catches ValueError)
    empty_mvhd = mp._box(b"ftyp", b"isomxxxx")         + mp._box(b"moov", mp._box(b"mvhd", b""))
    with pytest.raises(ValueError):
        mp.probe_mp4(empty_mvhd)


def test_hevc_sps_conformance_crop():
    # 1920x1088 coded, bottom crop 4 chroma units -> 1920x1080 display
    b = mp.synth_hevc_stream(1, 2, width=1920, height=1080, crop_bottom=4)
    info = mp.probe_hevc_annexb(b)
    assert info["width"] == 1920 and info["height"] == 1080


# ------------------------------------------------------------------ fuzzing

def test_probe_never_escapes_valueerror():
    """probe_media on arbitrary garbage and on truncations of every
    valid synth stream must either return a dict or raise ValueError —
    anything else (IndexError, KeyError) would kill a MediaProbeStage
    block instead of landing in probe_err."""
    import itertools
    rng = np.random.default_rng(99)
    streams = [
        mp.synth_mpeg_audio_stream(6, layer=3, kbps=128, xing=True),
        mp.synth_mpeg_audio_stream(4, layer=1, kbps=192),
        mp.synth_adts_stream(5),
        mp.synth_h264_stream(2, 3),
        mp.synth_hevc_stream(2, 3),
        mp.synth_mp4(),
        mp.synth_matroska(),
        mp.synth_ogg(),
    ]
    cases = []
    for s in streams:
        cuts = sorted(set(int(x) for x in
                          rng.integers(0, len(s), 40)) | {0, 1, len(s)})
        cases.extend(s[:c] for c in cuts)
        # bit-flip corruption
        for _ in range(20):
            b = bytearray(s)
            for pos in rng.integers(0, len(s), 3):
                b[pos] ^= 1 << int(rng.integers(0, 8))
            cases.append(bytes(b))
    for _ in range(200):
        cases.append(rng.integers(0, 256,
                                  int(rng.integers(0, 64)),
                                  dtype=np.uint8).tobytes())
    n_ok = n_err = 0
    for payload in cases:
        try:
            info = mp.probe_media(payload)
            assert isinstance(info, dict)
            n_ok += 1
        except ValueError:
            n_err += 1
    assert n_ok + n_err == len(cases) and n_ok > 0 and n_err > 0


def test_media_probe_pipeline_and_sink(ray_session, tmp_path):
    import ray
    payloads = [mp.synth_mp4(), mp.synth_adts_stream(4),
                mp.synth_mpeg_audio_stream(4, layer=2, kbps=96),
                b"garbage-bytes"]
    t = pa.table({"media_id": list(range(4)),
                  "kind": ["video", "audio", "audio", "audio"],
                  "payload": pa.array(payloads, type=pa.binary())})
    out = mp.media_probe_pipeline(ray.data.from_arrow(t), batch_size=2)
    d = tmp_path / "probes"
    mp.write_media_probes(out, str(d))
    back = ray.data.read_parquet(str(d)).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert set(back["container"]) == {"mp4", "adts", "mpeg-audio",
                                      "unknown"}
    assert back.loc[back["media_id"] == 3, "probe_err"].notna().all()
    # partitioned layout: one directory per container
    assert sorted(p.name.split("=")[1] for p in d.iterdir()
                  if p.is_dir()) == ["adts", "mp4", "mpeg-audio",
                                     "unknown"]


def test_mp4_nesting_bomb_and_midstream_short_leaf():
    # ~1100 nested moov boxes must raise ValueError, not RecursionError
    bomb = b""
    for _ in range(1100):
        bomb = mp._box(b"moov", bomb)
    bomb = mp._box(b"ftyp", b"isomxxxx") + bomb
    with pytest.raises(ValueError):
        mp.probe_mp4(bomb)
    # an empty mvhd FOLLOWED by a trak must raise, not read the trak's
    # bytes as duration fields
    mid = mp._box(b"ftyp", b"isomxxxx") + mp._box(
        b"moov", mp._box(b"mvhd", b"") + mp._box(b"trak", b""))
    with pytest.raises(ValueError):
        mp.probe_mp4(mid)


def test_adts_channel_mapping():
    assert mp.probe_adts(mp.synth_adts_stream(3, channels=7))["channels"] \
        == 8                       # cfg 7 means 7.1
    assert mp.probe_adts(mp.synth_adts_stream(3, channels=0))["channels"] \
        is None                    # cfg 0: PCE-defined, unknown here


# ------------------------------------------------------------------ Matroska

def test_matroska_walk():
    b = mp.synth_matroska(width=1920, height=1080, duration_s=42.0,
                          codec="V_VP9", webm=True)
    info = mp.probe_matroska(b)
    assert info["container"] == "webm"
    assert info["codec"] == "V_VP9"
    assert info["width"] == 1920 and info["height"] == 1080
    assert info["duration_s"] == pytest.approx(42.0)
    assert info["n_tracks"] == 1
    assert mp.probe_media(b)["container"] == "webm"
    mkv = mp.synth_matroska(codec="V_MPEG4/ISO/AVC", webm=False)
    assert mp.probe_matroska(mkv)["container"] == "matroska"


def test_matroska_malformed():
    with pytest.raises(ValueError):
        mp.probe_matroska(b"\x00\x00\x00\x00")
    good = mp.synth_matroska()
    with pytest.raises(ValueError):
        mp.probe_matroska(good[:len(good) // 2])  # truncated mid-element
    # nesting bomb: deeply nested unknown Segment masters
    bomb = b"\x1a\x45\xdf\xa3" + b""
    inner = b""
    for _ in range(64):
        inner = mp._ebml_el(0x18538067, inner)
    with pytest.raises(ValueError):
        mp.probe_matroska(b"\x1a\x45\xdf\xa3\x80" + inner)


# ------------------------------------------------------------------ Ogg

def test_ogg_opus_and_vorbis():
    b = mp.synth_ogg(codec="opus", duration_s=3.25, n_pages=5)
    info = mp.probe_ogg(b)
    assert info["codec"] == "opus"
    assert info["sample_rate"] == 48000 and info["channels"] == 2
    assert info["n_frames"] == 6            # BOS + 5 data pages
    assert info["duration_s"] == pytest.approx(3.25)
    assert info["clean_eof"]
    v = mp.synth_ogg(codec="vorbis", duration_s=1.5, channels=1)
    iv = mp.probe_ogg(v)
    assert iv["codec"] == "vorbis" and iv["sample_rate"] == 44100
    assert iv["channels"] == 1
    assert iv["duration_s"] == pytest.approx(1.5, abs=1e-4)
    assert mp.probe_media(b)["codec"] == "opus"


def test_ogg_truncation_and_garbage():
    b = mp.synth_ogg()
    info = mp.probe_ogg(b[:-30])
    assert not info["clean_eof"] and info["trailing_bytes"] > 0
    with pytest.raises(ValueError):
        mp.probe_ogg(b"NotOggData")
