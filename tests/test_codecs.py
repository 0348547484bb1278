"""Golden + round-trip tests for the round-4 compressed-media codecs
(rayschema/codecs.py): GIF LZW, G.711 mu-law/A-law, IMA ADPCM, MJPEG-AVI.
Pure-numpy — no Ray needed."""

import struct

import numpy as np
import pytest

from rayschema.codecs import (
    ALAW_LUT,
    MULAW_LUT,
    _lzw_decode,
    _lzw_encode,
    alaw_decode,
    alaw_encode,
    decode_avi_mjpeg,
    decode_gif,
    encode_avi_mjpeg,
    encode_gif,
    encode_wav_compressed,
    ima_adpcm_decode_block,
    ima_adpcm_encode,
    mulaw_decode,
    mulaw_encode,
)
from rayschema.multimodal import decode_wav


# ---------------------------------------------------------------- LZW / GIF

def test_lzw_roundtrip_small_and_table_full():
    rng = np.random.default_rng(7)
    for mcs, nsym, size in ((2, 4, 64), (4, 16, 2048), (5, 20, 30000)):
        px = rng.integers(0, nsym, size).astype(np.uint8).tobytes()
        assert _lzw_decode(mcs, _lzw_encode(mcs, px), size) == px
    # highly repetitive stream drives long dictionary chains
    px = (b"\x00\x01" * 5000) + b"\x02" * 5000
    assert _lzw_decode(2, _lzw_encode(2, px), len(px)) == px


def test_gif_roundtrip_lossless_under_256_colors():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (13, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 13, (23, 31))]
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out["rgb"], img)
    assert out["tensor"].shape == (23, 31)
    assert out["tensor"].dtype == np.float32
    assert int(out["n_frames"]) == 1
    exp = img.astype(np.float32).mean(axis=2) / 255.0
    assert np.allclose(out["tensor"], exp)


def test_gif_over_256_colors_quantizes_not_crashes():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    out = decode_gif(encode_gif(img))
    assert out["rgb"].shape == (32, 32, 3)


def _gif_header(w, h, pal):
    ctbits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    table = np.zeros((1 << ctbits, 3), dtype=np.uint8)
    table[:len(pal)] = pal
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (ctbits - 1),
                                    0, 0) + table.tobytes(), ctbits)


def _gif_image_block(left, top, w, h, idx, mcs, interlace=False):
    out = bytearray(struct.pack("<BHHHHB", 0x2C, left, top, w, h,
                                0x40 if interlace else 0))
    out.append(mcs)
    lzw = _lzw_encode(mcs, idx.astype(np.uint8).tobytes())
    for i in range(0, len(lzw), 255):
        blk = lzw[i:i + 255]
        out.append(len(blk))
        out += blk
    out.append(0)
    return bytes(out)


def test_gif_interlaced_rows_deinterlace():
    # 8 rows, each a distinct palette index: interlaced storage order is
    # passes (0,8),(4,8),(2,4),(1,2) -> stored rows 0,4,2,6,1,3,5,7
    pal = np.array([[i * 30, 0, 0] for i in range(8)], dtype=np.uint8)
    hdr, ctbits = _gif_header(4, 8, pal)
    disp = np.repeat(np.arange(8, dtype=np.uint8)[:, None], 4, axis=1)
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(start, 8, step)]
    stored = disp[order]
    payload = hdr + _gif_image_block(0, 0, 4, 8, stored.reshape(-1),
                                     max(2, ctbits), interlace=True) + b"\x3b"
    out = decode_gif(payload)
    assert np.array_equal(out["rgb"], pal[disp])


def test_gif_multiframe_subrect_and_transparency():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    hdr, ctbits = _gif_header(4, 4, pal)
    mcs = max(2, ctbits)
    f1 = np.zeros((4, 4), dtype=np.uint8)          # all red
    # GCE: transparency on, transparent index 2
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 2, 0])
    f2 = np.array([[1, 2], [2, 1]], dtype=np.uint8)  # green/transparent
    payload = (hdr + _gif_image_block(0, 0, 4, 4, f1.reshape(-1), mcs)
               + gce + _gif_image_block(1, 1, 2, 2, f2.reshape(-1), mcs)
               + b"\x3b")
    out = decode_gif(payload)
    assert int(out["n_frames"]) == 2
    # returned frame is the FIRST composited frame: all red
    assert np.array_equal(out["rgb"], pal[f1])


# ---------------------------------------------------------------- G.711

def test_g711_golden_extremes():
    # canonical Sun g711.c decode values
    assert mulaw_decode(np.array([0x00]))[0] == -32124
    assert mulaw_decode(np.array([0x80]))[0] == 32124
    assert mulaw_decode(np.array([0xFF]))[0] == 0
    assert alaw_decode(np.array([0x55]))[0] == -8
    assert alaw_decode(np.array([0xD5]))[0] == 8
    assert alaw_decode(np.array([0x2A]))[0] == -32256
    assert alaw_decode(np.array([0xAA]))[0] == 32256


def test_g711_exhaustive_involution():
    codes = np.arange(256, dtype=np.uint8)
    # A-law decode values are all distinct: exact involution
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)
    # mu-law: 0x7F and 0xFF both decode to 0 — one maps onto the other,
    # every other code round-trips exactly
    rt = mulaw_encode(mulaw_decode(codes))
    bad = np.nonzero(rt != codes)[0]
    assert set(bad.tolist()) <= {0x7F, 0xFF}
    # and re-decoding always reproduces the same linear value
    assert np.array_equal(mulaw_decode(rt), mulaw_decode(codes))


def test_g711_luts_are_odd_symmetric():
    # mu-law: code ^ 0x80 flips sign
    c = np.arange(128, dtype=np.uint8)
    assert np.array_equal(MULAW_LUT[c], -MULAW_LUT[c | 0x80])
    assert np.array_equal(ALAW_LUT[c | 0x80], -ALAW_LUT[c])


# ---------------------------------------------------------------- IMA ADPCM

def test_ima_adpcm_tracks_smooth_signal():
    t = np.arange(4000)
    pcm = (np.sin(t / 80.0) * 16000).astype(np.int16)
    blocks = ima_adpcm_encode(pcm, block_align=256)
    dec = np.concatenate(
        [ima_adpcm_decode_block(blocks[i:i + 256], 1)
         for i in range(0, len(blocks), 256)], axis=0)[:, 0][:4000]
    err = np.abs(dec.astype(np.int32) - pcm.astype(np.int32))
    # after the initial step-size adaptation the tracker stays tight
    assert err[200:].max() < 600
    assert err[200:].mean() < 60


def test_ima_adpcm_block_header_is_first_sample():
    pcm = np.arange(-500, 505, 1, dtype=np.int16)
    blocks = ima_adpcm_encode(pcm, block_align=64)
    first = ima_adpcm_decode_block(blocks[:64], 1)
    assert first[0, 0] == -500


# ------------------------------------------------------- WAV integration

@pytest.mark.parametrize("codec,tol", [("mulaw", 0.04), ("alaw", 0.04),
                                       ("ima_adpcm", 0.08)])
def test_compressed_wav_roundtrip_through_decode_wav(codec, tol):
    t = np.arange(333)
    wave = 0.8 * np.sin(t / 9.0)
    payload = encode_wav_compressed(wave, sample_rate=8000, codec=codec,
                                    block_align=64)
    out = decode_wav(payload)
    assert int(out["sample_rate"]) == 8000
    assert int(out["n_frames"]) == 333        # fact chunk drops pad samples
    err = np.abs(out["tensor"] - wave.astype(np.float32))
    assert float(err[50:].max()) < tol


def test_compressed_wav_fact_chunk_truncates_padding():
    # 70 samples, 64-byte blocks = 121 samples/block: one padded block
    wave = np.linspace(-0.5, 0.5, 70)
    payload = encode_wav_compressed(wave, 8000, codec="ima_adpcm",
                                    block_align=64)
    assert int(decode_wav(payload)["n_frames"]) == 70


# ---------------------------------------------------------------- MJPEG AVI

def test_avi_mjpeg_roundtrip_matches_per_frame_jpeg():
    from rayschema.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    out = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=30))
    assert out["tensor"].shape == (4, 16, 16)
    assert int(out["n_frames"]) == 4
    assert int(out["fps_num"]) == 30 and int(out["fps_den"]) == 1
    # container adds nothing: each frame equals its standalone JPEG decode
    for i in range(4):
        solo = decode_jpeg(encode_jpeg(frames[i], quality=85,
                                       subsample=True))["tensor"]
        assert np.array_equal(out["tensor"][i], solo)


def test_default_decode_covers_every_synth_payload_for_real():
    """No synth payload falls through to the fake codec: every audio row
    decodes with a sample_rate, every image row with real geometry, every
    video row with a (n, h, w) frame tensor."""
    from rayschema.multimodal import default_decode, synth_media_table

    t = synth_media_table(96)
    for row in t.to_pylist():
        out = default_decode(row["payload"], row["kind"])
        if row["kind"] == "audio":
            assert "sample_rate" in out
        elif row["kind"] == "image":
            assert "rgb" in out or out["tensor"].shape[0] >= 4
            assert out["tensor"].ndim == 2
        else:
            assert out["tensor"].ndim == 3


# ---------------------------------------------------------------- PNG

def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib
    return struct.pack(">I", len(body)) + ctype + body \
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)


def _png_wrap(w, h, color, raw: bytes, plte: bytes = b"",
              interlace: int = 0) -> bytes:
    import zlib
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace))
    if plte:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) \
        + _png_chunk(b"IEND", b"")


def test_png_roundtrip_rgb():
    from rayschema.codecs import decode_png, encode_png

    rng = np.random.default_rng(8)
    for shape in ((1, 1), (5, 7), (32, 17)):
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert np.array_equal(out["rgb"], img)
        assert np.allclose(out["tensor"],
                           img.astype(np.float32).mean(axis=2) / 255.0)


def test_png_all_filter_types_decode():
    """Hand-built 4x4 gray image using every filter type 0-4; expected
    pixels computed by an independent straight-line spec transcription."""
    from rayschema.codecs import decode_png

    rows_raw = [
        (0, [10, 20, 30, 40]),    # none
        (1, [5, 5, 5, 5]),        # sub: cumulative
        (2, [1, 2, 3, 4]),        # up
        (3, [7, 7, 7, 7]),        # average
        (4, [9, 9, 9, 9]),        # paeth
    ][:4]
    raw = b"".join(bytes([ft] + vals) for ft, vals in rows_raw)
    out = decode_png(_png_wrap(4, 4, 0, raw))
    exp = np.zeros((4, 4), dtype=np.int32)
    exp[0] = [10, 20, 30, 40]
    cur = 0
    for i in range(4):                       # sub
        cur = (5 + cur) & 0xFF if i else 5
        exp[1, i] = cur
    exp[2] = (np.array([1, 2, 3, 4]) + exp[1]) & 0xFF
    for i in range(4):                       # average
        left = exp[3, i - 1] if i else 0
        exp[3, i] = (7 + ((left + exp[2, i]) >> 1)) & 0xFF
    assert np.array_equal(out["rgb"][:, :, 0], exp.astype(np.uint8))


def test_png_paeth_filter_golden():
    from rayschema.codecs import decode_png

    # 2x3 RGB: row0 none, row1 paeth with known predictor outcomes
    row0 = [100, 0, 0, 0, 100, 0, 0, 0, 100]
    row1 = [10, 10, 10, 10, 10, 10, 10, 10, 10]
    raw = bytes([0] + row0 + [4] + row1)
    out = decode_png(_png_wrap(3, 2, 2, raw))
    exp = np.zeros((2, 3, 3), dtype=np.int32)
    exp[0] = np.array(row0).reshape(3, 3)
    prior = exp[0].reshape(-1)
    cur = np.zeros(9, dtype=np.int32)
    for i in range(9):
        a = cur[i - 3] if i >= 3 else 0
        b = prior[i]
        c = prior[i - 3] if i >= 3 else 0
        p = a + b - c
        pred = a if (abs(p - a) <= abs(p - b) and abs(p - a) <= abs(p - c)) \
            else (b if abs(p - b) <= abs(p - c) else c)
        cur[i] = (10 + pred) & 0xFF
    exp[1] = cur.reshape(3, 3)
    assert np.array_equal(out["rgb"], exp.astype(np.uint8))


def test_png_palette_and_gray_alpha():
    from rayschema.codecs import decode_png

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 2, 0] + [0, 2, 1, 0, 2])  # 2 filtered rows of 4 px
    out = decode_png(_png_wrap(4, 2, 3, raw, plte=plte))
    pal = np.frombuffer(plte, np.uint8).reshape(3, 3)
    exp = pal[np.array([[0, 1, 2, 0], [2, 1, 0, 2]])]
    assert np.array_equal(out["rgb"], exp)
    # gray+alpha: alpha dropped
    raw = bytes([0, 50, 255, 100, 0])           # 2 px (g,a)
    out = decode_png(_png_wrap(2, 1, 4, raw))
    assert np.array_equal(out["rgb"][0, :, 0], np.array([50, 100]))


def test_png_adam7_interlace():
    """Build an interlaced PNG by emitting the 7 passes of a known 8x8
    gray image (all filters 0) and check the deinterlace reassembly."""
    from rayschema.codecs import decode_png

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) & 0xFF
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        for r in sub:
            raw.append(0)
            raw += r.tobytes()
    out = decode_png(_png_wrap(8, 8, 0, bytes(raw), interlace=1))
    assert np.array_equal(out["rgb"][:, :, 0], img)


def test_png_rgba_alpha_dropped():
    from rayschema.codecs import decode_png

    raw = bytes([0, 1, 2, 3, 9, 4, 5, 6, 9])    # 2 RGBA px
    out = decode_png(_png_wrap(2, 1, 6, raw))
    assert np.array_equal(out["rgb"],
                          np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8))


# ---------------------------------------------------------------- FLAC

def _flac_streaminfo(rate, nch, bps, total, blocksize=256):
    from rayschema.flac import _BitWriter
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _flac_frame_header(blocksize, ch_code, fidx=0):
    from rayschema.flac import _BitWriter, _crc8, _utf8_number
    hw = _BitWriter()
    hw.write(0x3FFE, 14)
    hw.write(0, 2)
    hw.write(6, 4)                     # 8-bit blocksize-1 field
    hw.write(0, 4)                     # rate from STREAMINFO
    hw.write(ch_code, 4)
    hw.write(4, 3)                     # 16 bps
    hw.write(0, 1)
    hw.align()
    hdr = hw.bytes() + _utf8_number(fidx) + bytes([blocksize - 1])
    return hdr + bytes([_crc8(hdr)])


def test_flac_roundtrip_lossless():
    from rayschema.flac import decode_flac, encode_flac

    rng = np.random.default_rng(6)
    for n in (5, 777, 2048):
        pcm = rng.integers(-32768, 32768, n).astype(np.int16)
        out = decode_flac(encode_flac(pcm, sample_rate=22050,
                                      blocksize=192))
        rec = np.round(out["tensor"].astype(np.float64) * 32768)
        assert int(out["sample_rate"]) == 22050
        assert int(out["n_frames"]) == n
        assert np.array_equal(rec.astype(np.int64), pcm.astype(np.int64))


def test_flac_lpc_subframe_hand_built():
    """LPC order 1, coef 2, shift 1: x_j = r_j + ((2*x_{j-1}) >> 1) =
    r_j + x_{j-1} — a hand-checkable running sum."""
    import struct as _st

    from rayschema.flac import _BitWriter, _crc16, decode_flac

    n = 8
    warm = 100
    resid = [1, -2, 3, -4, 5, -6, 7]
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(32 | (1 - 1), 6)          # LPC order 1
    bw.write(0, 1)
    bw.write(warm & 0xFFFF, 16)        # warmup
    bw.write(4 - 1, 4)                 # precision 4
    bw.write(1, 5)                     # shift 1
    bw.write(2, 4)                     # coef 2 (4-bit signed)
    bw.write(0, 2)                     # rice method 0
    bw.write(0, 4)                     # partition order 0
    bw.write(0, 4)                     # rice param 0
    for r in resid:
        v = (r << 1) ^ (-1 if r < 0 else 0)
        bw.write_unary(v)
    bw.align()
    body = bw.bytes()
    hdr = _flac_frame_header(n, ch_code=0)
    payload = _flac_streaminfo(8000, 1, 16, n) + hdr + body \
        + _st.pack(">H", _crc16(hdr + body))
    out = decode_flac(payload)
    exp = np.cumsum([warm] + resid)
    rec = np.round(out["tensor"].astype(np.float64) * 32768).astype(np.int64)
    assert np.array_equal(rec, exp)


def test_flac_stereo_mid_side_and_left_side():
    """Hand-built 2-channel frames: verbatim subframes under mid/side and
    left/side decorrelation must reconstruct the planted L/R exactly
    (output = channel mean)."""
    import struct as _st

    from rayschema.flac import _BitWriter, _crc16, decode_flac

    L = np.array([100, -200, 300, -400], dtype=np.int64)
    R = np.array([90, -190, 290, -390], dtype=np.int64)
    side = L - R
    mid = (L + R) >> 1

    def verbatim(vals, bits):
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(1, 6)                 # verbatim
        bw.write(0, 1)
        for v in vals:
            bw.write(int(v) & ((1 << bits) - 1), bits)
        return bw

    for ch_code, subs in ((10, [(mid, 16), (side, 17)]),
                          (8, [(L, 16), (side, 17)]),
                          (9, [(side, 17), (R, 16)])):
        bw = _BitWriter()
        for vals, bits in subs:
            sub = verbatim(vals, bits)
            # concatenate: replay sub's bits into bw
            tmp = sub
            tmp_bits = tmp.nbits
            for byte in tmp.buf:
                bw.write(byte, 8)
            if tmp_bits:
                bw.write(tmp.cur, tmp_bits)
        bw.align()
        body = bw.bytes()
        hdr = _flac_frame_header(4, ch_code=ch_code)
        payload = _flac_streaminfo(8000, 2, 16, 4) + hdr + body \
            + _st.pack(">H", _crc16(hdr + body))
        out = decode_flac(payload)
        rec = np.round(out["tensor"].astype(np.float64) * 32768)
        assert np.array_equal(rec.astype(np.int64), (L + R) / 2), ch_code


def test_flac_escape_and_multi_partition_residual():
    """Fixed order 0 with (a) an escape partition (raw 7-bit residuals)
    and (b) partition order 1 with two different rice params."""
    import struct as _st

    from rayschema.flac import _BitWriter, _crc16, decode_flac

    vals = [-60, 50, -40, 30, -20, 10, -5, 3]
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(8, 6)                     # fixed order 0
    bw.write(0, 1)
    bw.write(0, 2)
    bw.write(0, 4)                     # partition order 0
    bw.write(0xF, 4)                   # escape
    bw.write(7, 5)                     # 7 raw bits
    for v in vals:
        bw.write(v & 0x7F, 7)
    bw.align()
    body = bw.bytes()
    hdr = _flac_frame_header(8, ch_code=0)
    payload = _flac_streaminfo(8000, 1, 16, 8) + hdr + body \
        + _st.pack(">H", _crc16(hdr + body))
    rec = np.round(decode_flac(payload)["tensor"].astype(np.float64)
                   * 32768).astype(np.int64)
    assert np.array_equal(rec, np.array(vals))

    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(8, 6)
    bw.write(0, 1)
    bw.write(0, 2)
    bw.write(1, 4)                     # partition order 1 -> 2 partitions
    for half, param in ((vals[:4], 2), (vals[4:], 0)):
        bw.write(param, 4)
        for r in half:
            v = (r << 1) ^ (-1 if r < 0 else 0)
            bw.write_unary(v >> param)
            if param:
                bw.write(v & ((1 << param) - 1), param)
    bw.align()
    body = bw.bytes()
    hdr = _flac_frame_header(8, ch_code=0)
    payload = _flac_streaminfo(8000, 1, 16, 8) + hdr + body \
        + _st.pack(">H", _crc16(hdr + body))
    rec = np.round(decode_flac(payload)["tensor"].astype(np.float64)
                   * 32768).astype(np.int64)
    assert np.array_equal(rec, np.array(vals))


def test_flac_wasted_bits_and_constant():
    import struct as _st

    from rayschema.flac import _BitWriter, _crc16, decode_flac

    # constant subframe with 2 wasted bits: stored value 25 -> output 100
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)                     # constant
    bw.write(1, 1)                     # wasted-bits flag
    bw.write_unary(1)                  # k-1 = 1 -> wasted = 2
    bw.write(25 & 0x3FFF, 14)          # bps - wasted = 14
    bw.align()
    body = bw.bytes()
    hdr = _flac_frame_header(4, ch_code=0)
    payload = _flac_streaminfo(8000, 1, 16, 4) + hdr + body \
        + _st.pack(">H", _crc16(hdr + body))
    rec = np.round(decode_flac(payload)["tensor"].astype(np.float64)
                   * 32768).astype(np.int64)
    assert np.array_equal(rec, np.full(4, 100))


# ---------------------------------------------------------------- AU / AIFF

def test_au_and_aiff_roundtrip_and_dispatch():
    from rayschema.codecs import (decode_aiff, decode_au, encode_aiff,
                                  encode_au)
    from rayschema.multimodal import default_decode

    w = 0.7 * np.sin(np.arange(300) / 11.0)
    for payload, tol in ((encode_au(w, 8000, encoding=3), 1e-4),
                         (encode_au(w, 8000, encoding=1), 0.04),
                         (encode_aiff(w, 44100), 1e-4)):
        out = default_decode(payload, "audio")
        assert int(out["n_frames"]) == 300
        assert np.abs(out["tensor"] - w).max() < tol
    # golden: AU mu-law encoding tag routes through the G.711 LUT
    au = encode_au(np.array([0.0]), 8000, encoding=1)
    assert decode_au(au)["tensor"][0] == 0.0
    # AIFF 80-bit float sample rates parse exactly
    for rate in (8000, 11025, 22050, 44100, 48000, 96000):
        assert int(decode_aiff(encode_aiff(w[:10], rate))
                   ["sample_rate"]) == rate


# ---------------------------------------------------------------- TIFF

def test_tiff_roundtrip_all_compressions_and_strips():
    from rayschema.codecs import decode_tiff, encode_tiff

    rng = np.random.default_rng(14)
    for comp in (1, 5, 32773):
        img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
        out = decode_tiff(encode_tiff(img, compression=comp,
                                      rows_per_strip=4))
        assert np.array_equal(out["rgb"], img), comp
        assert np.allclose(out["tensor"],
                           img.astype(np.float32).mean(axis=2) / 255.0)


def test_tiff_lzw_early_change_boundaries():
    from rayschema.codecs import _lzw_decode_tiff, _lzw_encode_tiff

    rng = np.random.default_rng(15)
    for size in (1, 250, 260, 600, 40000):   # crosses 9->10 and table-full
        data = rng.integers(0, 256, size).astype(np.uint8).tobytes()
        assert _lzw_decode_tiff(_lzw_encode_tiff(data), size) == data


def test_tiff_packbits_golden():
    from rayschema.codecs import _packbits_decode, _packbits_encode

    # the Apple TN1023 example
    raw = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA,
                 0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA,
                 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
    packed = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                    0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    assert _packbits_decode(packed, len(raw)) == raw
    assert _packbits_decode(_packbits_encode(raw), len(raw)) == raw


def test_tiff_big_endian_and_gray():
    """Hand-built big-endian single-strip 8-bit gray TIFF."""
    from rayschema.codecs import decode_tiff

    img = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    data = img.tobytes()
    # header + one IFD with 7 entries
    nent = 7
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * nent + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += struct.pack(">H", nent)
    for tag, typ, cnt, val in ((256, 4, 1, 4), (257, 4, 1, 3),
                               (258, 3, 1, 8 << 16), (259, 3, 1, 1 << 16),
                               (262, 3, 1, 1 << 16),
                               (273, 4, 1, data_off), (279, 4, 1, len(data))):
        out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    out += data
    got = decode_tiff(bytes(out))
    assert np.array_equal(got["rgb"][:, :, 0], img)
    from rayschema.multimodal import default_decode
    assert default_decode(bytes(out), "image")["tensor"].shape == (3, 4)


def test_tfrecord_crc32c_golden():
    """The canonical CRC-32C check vector: crc32c('123456789') ==
    0xE3069283 (RFC 3720 appendix); masking follows the TF rotr15+const
    convention."""
    import numpy as np

    from rayschema.tfrecord import crc32c_many, masked_crc

    c = crc32c_many([b"123456789"])
    assert int(c[0]) == 0xE3069283
    assert int(masked_crc(c)[0]) == (((0xE3069283 >> 15)
                                      | (0xE3069283 << 17 & 0xFFFFFFFF))
                                     + 0xA282EAD8) & 0xFFFFFFFF
    # vectorized path == per-record path
    many = crc32c_many([b"", b"a", b"abc", b"123456789"])
    assert [int(x) for x in many] == [int(crc32c_many([p])[0])
                                      for p in (b"", b"a", b"abc",
                                                b"123456789")]


def test_tfrecord_roundtrip_and_corruption(tmp_path):
    import os

    import pyarrow as pa
    import pytest

    from rayschema.tfrecord import read_tfrecord_file, write_tfrecord

    t = pa.table({"doc_id": pa.array([1, 2, None]),
                  "text": pa.array(["héllo", None, "naïve ✓"])})
    fp = os.path.join(tmp_path, "x.tfrecord")
    write_tfrecord(t, fp)
    back = read_tfrecord_file(fp)
    assert back.column("doc_id").to_pylist() == [1, 2, None]
    assert back.column("text").to_pylist() == ["héllo", None, "naïve ✓"]
    raw = bytearray(open(fp, "rb").read())
    raw[len(raw) // 2] ^= 0xFF                 # flip one payload byte
    with pytest.raises(ValueError, match="CRC mismatch|truncated"):
        read_tfrecord_file(bytes(raw))
