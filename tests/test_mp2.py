"""MPEG-1 Audio Layer II codec tests (rayschema/mp2.py).

The cross-layer oracle: the requantization closed form s'' = (2c+1-n)/n
is proven per quantizer class against the ISO Table B.4 C/D formulation
(C = 2^nb/n, D = 2^(1-nb): C*(c/2^(nb-1) - 1 + D) must equal it for
every code) — so a symmetric encode/decode bug in the sample layer
cannot cancel out. Filterbank: the embedded window pair is asserted
PERFECT-reconstruction (machine-precision cascade) inside the exact ISO
polyphase structure.
"""
import math

import numpy as np
import pytest

from rayschema.mp2 import (BITRATES, QUANT_BITS, RATES, TABLE_A, TABLE_B,
                           TABLE_C, TABLE_D, _alloc_table, _Analyze,
                           _requant, _Synth, decode_mp2, encode_mp2)

DELAY = 481


def _snr(a, b):
    return 10 * np.log10(np.sum(a * a) / max(np.sum((a - b) ** 2), 1e-30))


def test_requant_matches_iso_cd_formulation():
    for n in sorted(QUANT_BITS):
        nb = {3: 2, 5: 3, 9: 4}.get(n) or int(math.ceil(math.log2(n + 1)))
        C = (1 << nb) / n
        D = 1.0 - (n - 1) / (1 << nb)    # = 2^(1-nb) for n = 2^nb - 1,
        #                                  = 1/2 for the grouped 3/5/9
        for c in range(min(n, 600)):
            iso = C * (c / 2.0 ** (nb - 1) - 1 + D)
            assert abs(_requant(c, n) - iso) < 1e-12, (n, c)


def test_alloc_tables_fit_their_nbal():
    """Every allocation table row must index at most 2^nbal - 1
    quantizers — the bug class behind the 384 kbps desync (a 3-bit row
    cannot reference an 8th quantizer)."""
    for table in (TABLE_A, TABLE_B, TABLE_C, TABLE_D):
        for nbal, levels in table:
            assert len(levels) <= (1 << nbal) - 1
            assert all(lv in QUANT_BITS for lv in levels)
    assert (len(TABLE_A), len(TABLE_B), len(TABLE_C), len(TABLE_D)) == \
        (27, 30, 8, 12)


def test_alloc_table_selection_rule():
    assert _alloc_table(48000, 192) is TABLE_A
    assert _alloc_table(44100, 64) is TABLE_A
    assert _alloc_table(44100, 96) is TABLE_B
    assert _alloc_table(32000, 96) is TABLE_B
    assert _alloc_table(44100, 48) is TABLE_C
    assert _alloc_table(32000, 48) is TABLE_D


def test_filterbank_perfect_reconstruction():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(1152 * 4)
    sub = _Analyze().run(x)
    y = _Synth().run(sub)
    a = x[200:3000]
    b = y[200 + DELAY:3000 + DELAY]
    assert _snr(a, b) > 200      # machine-precision PR


def test_roundtrip_tonal_high_fidelity():
    fs = 48000
    t = np.arange(fs) / fs
    x = 0.5 * np.sin(2 * np.pi * 440 * t) \
        + 0.2 * np.sin(2 * np.pi * 3000 * t + 0.3)
    y = decode_mp2(encode_mp2(x, sample_rate=fs, kbps=192))
    assert int(y["sample_rate"]) == fs
    z = y["tensor"].astype(np.float64)
    assert _snr(x[1000:40000], z[1000 + DELAY:40000 + DELAY]) > 55


def test_roundtrip_all_table_configs():
    rng = np.random.default_rng(1)
    x = np.convolve(rng.standard_normal(1152 * 6) * 0.3,
                    np.ones(8) / 8, mode="same")
    for fs, kb, min_snr in ((48000, 192, 15), (44100, 160, 15),
                            (32000, 96, 14), (44100, 48, 7)):
        y = decode_mp2(encode_mp2(x, sample_rate=fs, kbps=kb))["tensor"]
        z = y.astype(np.float64)
        got = _snr(x[1000:6000], z[1000 + DELAY:6000 + DELAY])
        assert got > min_snr, (fs, kb, got)


def test_bitrate_improves_fidelity():
    rng = np.random.default_rng(2)
    x = np.convolve(rng.standard_normal(1152 * 6) * 0.3,
                    np.ones(6) / 6, mode="same")
    snrs = []
    for kb in (64, 128, 256):
        z = decode_mp2(encode_mp2(x, sample_rate=48000, kbps=kb))[
            "tensor"].astype(np.float64)
        snrs.append(_snr(x[1000:6000], z[1000 + DELAY:6000 + DELAY]))
    assert snrs[0] < snrs[1] < snrs[2]


def test_frame_geometry_and_resync():
    fs, kb = 48000, 192
    x = np.zeros(1152 * 3)
    blob = encode_mp2(x, sample_rate=fs, kbps=kb)
    assert len(blob) == 3 * (144 * kb * 1000 // fs)
    assert blob[0] == 0xFF and blob[1] == 0xFD
    # decoder resyncs over garbage prefixes (ID3-style junk)
    out = decode_mp2(b"JUNKJUNK" + blob)
    assert int(out["n_frames"]) == 1152 * 3


def test_rejects_invalid_params():
    with pytest.raises(ValueError):
        encode_mp2(np.zeros(1152), sample_rate=8000)
    with pytest.raises(ValueError):
        encode_mp2(np.zeros(1152), sample_rate=48000, kbps=42)
    with pytest.raises(ValueError):
        decode_mp2(b"not audio at all")


def test_media_table_rotates_mp2_and_decodes():
    from rayschema.multimodal import default_decode, synth_media_table

    t = synth_media_table(128)
    mimes = t.column("mime").to_pylist()
    assert "audio/mpeg;layer=2" in mimes
    i = mimes.index("audio/mpeg;layer=2")
    payload = t.column("payload")[i].as_py()
    assert payload[0] == 0xFF and (payload[1] & 0xFE) == 0xFC
    out = default_decode(payload, "audio")
    assert int(out["sample_rate"]) == 48000
    assert int(out["n_frames"]) == 1152


def test_bitrate_header_fields_roundtrip():
    for kb in (64, 128, 384):
        for fs in RATES:
            blob = encode_mp2(np.zeros(1152), sample_rate=fs, kbps=kb)
            assert BITRATES[blob[2] >> 4] == kb
            assert RATES[(blob[2] >> 2) & 3] == fs


def test_layer1_roundtrip_and_header():
    from rayschema.mp2 import BITRATES_L1, decode_mp1, encode_mp1

    fs = 48000
    t = np.arange(fs) / fs
    x = 0.5 * np.sin(2 * np.pi * 440 * t) \
        + 0.2 * np.sin(2 * np.pi * 3000 * t + 0.3)
    blob = encode_mp1(x, sample_rate=fs, kbps=384)
    assert blob[0] == 0xFF and blob[1] == 0xFF      # layer I sync
    assert BITRATES_L1[blob[2] >> 4] == 384
    out = decode_mp1(blob)
    assert int(out["sample_rate"]) == fs
    z = out["tensor"].astype(np.float64)
    assert _snr(x[1000:40000], z[1000 + DELAY:40000 + DELAY]) > 60
    # lower rate still intelligible
    z2 = decode_mp1(encode_mp1(x[:384 * 20], sample_rate=44100,
                               kbps=192))["tensor"].astype(np.float64)
    assert _snr(x[1000:7000], z2[1000 + DELAY:7000 + DELAY]) > 25


def test_layer1_dispatch_via_default_decode():
    from rayschema.mp2 import encode_mp1
    from rayschema.multimodal import default_decode

    blob = encode_mp1(np.zeros(384 * 2), sample_rate=32000, kbps=192)
    out = default_decode(blob, "audio")
    assert int(out["sample_rate"]) == 32000
    assert int(out["n_frames"]) == 384 * 2


def _mk_frame_body(bits):
    """Pack (value, nbits) tuples MSB-first into bytes."""
    from rayschema.mp2 import _BitWriter
    bw = _BitWriter()
    for v, nb in bits:
        bw.write(v, nb)
    return bw.flush()


def test_stereo_frame_decode_semantics():
    """Hand-crafted STEREO (mode 0) frame: channel-interleaved
    allocations / scfsi / scale factors / grouped codes, pinned against
    the spec's read order — sb0 gets 3-level grouped codes on both
    channels with different scale factors."""
    from rayschema.mp2 import (SCALE, TABLE_A, _BitReader, _decode_frame,
                               _requant)

    table = TABLE_A
    bits = []
    # allocations: sb0 ch0=1, ch1=1; all other subbands 0 on both
    bits += [(1, 4), (1, 4)]
    for sb in range(1, 27):
        nbal = table[sb][0]
        bits += [(0, nbal), (0, nbal)]
    # scfsi: both allocated -> pattern 2 (one sf for all parts)
    bits += [(2, 2), (2, 2)]
    # scale factors: ch0 idx 0 (sf=2.0), ch1 idx 3 (sf=1.0)
    bits += [(0, 6), (3, 6)]
    # samples: 12 granules, sb0 both channels, grouped 3-level code
    # v = c0 + 3*c1 + 9*c2 with codes (2,1,0) -> middle code = 0 value
    v = 2 + 3 * 1 + 9 * 0
    for gr in range(12):
        bits += [(v, 5), (v, 5)]
    body = _mk_frame_body(bits)
    sub = _decode_frame(_BitReader(body), 48000, 192, 0, 0)
    assert sub.shape == (2, 36, 32)
    r0, r1, r2 = (_requant(2, 3), _requant(1, 3), _requant(0, 3))
    for gr in range(12):
        assert sub[0, 3 * gr + 0, 0] == r0 * SCALE[0]
        assert sub[0, 3 * gr + 1, 0] == r1 * SCALE[0]
        assert sub[0, 3 * gr + 2, 0] == r2 * SCALE[0]
        assert sub[1, 3 * gr + 0, 0] == r0 * SCALE[3]
    assert not sub[:, :, 1:].any()


def test_joint_stereo_bound_sharing():
    """Joint stereo (mode 1, mode_ext 0 -> bound 4): subbands >= bound
    carry ONE allocation and ONE set of codes but PER-CHANNEL scale
    factors — the decoder must write both channels from the shared
    codes, each scaled by its own factor."""
    from rayschema.mp2 import (SCALE, TABLE_A, _BitReader, _decode_frame,
                               _requant)

    table = TABLE_A
    bits = []
    # allocations: below bound (sb 0..3) zero on both channels;
    # sb4 (>= bound): ONE shared allocation = 1 (3-level grouped);
    # sb5..26 shared zero
    for sb in range(4):
        nbal = table[sb][0]
        bits += [(0, nbal), (0, nbal)]
    bits += [(1, table[4][0])]
    for sb in range(5, 27):
        bits += [(0, table[sb][0])]
    # scfsi for each channel of the allocated sb4 (both read)
    bits += [(2, 2), (2, 2)]
    # per-channel scale factors for sb4: ch0 idx 0 (2.0), ch1 idx 6 (0.5)
    bits += [(0, 6), (6, 6)]
    # shared grouped codes
    v = 2 + 3 * 2 + 9 * 2           # all codes = 2 -> +2/3
    for gr in range(12):
        bits += [(v, 5)]
    body = _mk_frame_body(bits)
    sub = _decode_frame(_BitReader(body), 48000, 192, 1, 0)
    r = _requant(2, 3)
    for gr in range(36):
        assert sub[0, gr, 4] == r * SCALE[0]
        assert sub[1, gr, 4] == r * SCALE[6]
    assert not sub[:, :, :4].any() and not sub[:, :, 5:].any()


def test_decoder_robust_to_truncation_and_garbage():
    """Truncated or bit-corrupted streams must FAIL CLEAN (ValueError)
    or decode the intact prefix — never hang or crash the actor."""
    from rayschema.mp2 import decode_mp1, decode_mp2, encode_mp1, \
        encode_mp2

    x = np.sin(2 * np.pi * 440 * np.arange(1152 * 3) / 48000)
    blob = encode_mp2(x, sample_rate=48000, kbps=192)
    # truncated mid-frame: whole frames before the cut still decode
    out = decode_mp2(blob[:len(blob) // 2])
    assert int(out["n_frames"]) >= 1152
    # header-only / garbage
    with pytest.raises(ValueError):
        decode_mp2(bytes(64))
    with pytest.raises(ValueError):
        decode_mp1(bytes(64))
    b1 = encode_mp1(x[:384 * 2], sample_rate=48000, kbps=384)
    out1 = decode_mp1(b1[:len(b1) - 7])
    assert int(out1["n_frames"]) >= 384
