"""Pure-numpy MPEG-1 Audio Layer II (MP2) codec — the round-4 verdict's
#6 ask (the last common audio container behind the stub boundary; FLAC
proved the bit-reader infrastructure, this adds the subband layer).

Faithful ISO 11172-3 BITSTREAM layer, decoder and encoder:

* frame sync / header fields (bitrate index, sample-rate index, padding,
  mode incl. joint stereo bound, protection/CRC skip),
* all four bit-allocation tables (Annex B.2a-d, 27/30/8/12 subbands) with
  the standard (sample rate, bitrate-per-channel) selection rule,
* scfsi (all four scale-factor share patterns) and the Table B.1 scale
  factors sf(i) = 2 * 2^(-i/3),
* grouped (3/5/9-level in 5/7/10 bits) and ungrouped codewords, degrouped
  per the spec's base-n digit rule,
* requantization in the closed form s'' = (2c + 1 - n) / n — exactly the
  value the C/D constant pairs of Table B.4 encode (verified per class:
  C*(c/2^(nb-1) - 1 + D) == (2c+1-n)/n for every n).

Filterbank boundary (documented): ISO Table B.3's 512 tabulated window
digits cannot be reproduced offline, so the polyphase window pair is this
repo's OWN design (scripts/gen_mp2_window.py, embedded in
rayschema/_mp2_window.py): a 64-tap Princen-Bradley sine analysis window
whose matching synthesis window has an EXACT perfect-reconstruction
solution inside the verbatim ISO polyphase structure (cascade SNR ~283 dB
= machine precision, delay 481). Consequence: the repo's encoder/decoder
pair round-trips at quantization-limited fidelity (tonal content > 55 dB
at 192 kbps), while REAL MP2 files decode with correct framing and
quantization but MDCT-grade (64-tap, not ISO 512-tap) band filtering.

Engine integration mirrors flac.py: ``decode_mp2`` returns
{"tensor": float32 mono in [-1, 1], "sample_rate", "n_frames"}; the
actor-pool decode stage batches payloads per actor (multimodal.py).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from rayschema._mp2_window import windows

BITRATES = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160,
            192, 224, 256, 320, 384)                     # kbps, Layer II
RATES = (44100, 48000, 32000)

# nlevels -> (codeword bits, grouped?)  — Annex B.4 quantizer classes
QUANT_BITS: Dict[int, Tuple[int, bool]] = {
    3: (5, True), 5: (7, True), 9: (10, True),
    7: (3, False), 15: (4, False), 31: (5, False), 63: (6, False),
    127: (7, False), 255: (8, False), 511: (9, False), 1023: (10, False),
    2047: (11, False), 4095: (12, False), 8191: (13, False),
    16383: (14, False), 32767: (15, False), 65535: (16, False)}

# Annex B.2 allocation tables: per subband (nbal, allocation->nlevels)
_QA_LOW = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047,
           4095, 8191, 16383, 32767, 65535)
_QA_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023,
           2047, 4095, 8191, 65535)
_QA_HI = (3, 5, 7, 9, 15, 31, 65535)     # nbal 3: 7 quantizers, 31->65535
_QA_TOP = (3, 5, 65535)
_QC_LOW = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
           4095, 8191, 16383, 32767)
_QC_HI = (3, 5, 9, 15, 31, 63, 127)
TABLE_A = [(4, _QA_LOW)] * 3 + [(4, _QA_MID)] * 8 \
    + [(3, _QA_HI)] * 12 + [(2, _QA_TOP)] * 4            # sblimit 27
TABLE_B = [(4, _QA_LOW)] * 3 + [(4, _QA_MID)] * 8 \
    + [(3, _QA_HI)] * 12 + [(2, _QA_TOP)] * 7            # sblimit 30
TABLE_C = [(4, _QC_LOW)] * 2 + [(3, _QC_HI)] * 6         # sblimit 8
TABLE_D = [(4, _QC_LOW)] * 2 + [(3, _QC_HI)] * 10        # sblimit 12

# Table B.1 scale factors
SCALE = 2.0 * 2.0 ** (-np.arange(63) / 3.0)

_C_WIN, _D_WIN = windows()

_i = np.arange(64)[None, :]
_k = np.arange(32)[:, None]
_M = np.cos((2 * _k + 1) * (_i - 16) * np.pi / 64)       # analysis 32x64
_kk = np.arange(64)[:, None]
_ii = np.arange(32)[None, :]
_N = np.cos((16 + _kk) * (2 * _ii + 1) * np.pi / 64)     # synthesis 64x32


def _alloc_table(fs: int, kbps_per_ch: int):
    """ISO table-selection rule (as implemented by every public Layer II
    decoder): B.2a for 48 kHz >= 56 kbps/ch or any-rate 56..80; B.2b for
    non-48k >= 96; B.2c for non-32k <= 48; else B.2d."""
    if (fs == 48000 and kbps_per_ch >= 56) or 56 <= kbps_per_ch <= 80:
        return TABLE_A
    if fs != 48000 and kbps_per_ch >= 96:
        return TABLE_B
    if fs != 32000 and kbps_per_ch <= 48:
        return TABLE_C
    return TABLE_D


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3] if (self.pos >> 3) < len(
                self.data) else 0
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for b in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> b) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _Synth:
    """ISO synthesis filterbank state (1024-sample V FIFO)."""

    def __init__(self):
        self.v = np.zeros(1024)

    def run(self, sub: np.ndarray) -> np.ndarray:
        """(n_granules, 32) subband samples -> (n_granules*32,) audio."""
        out = np.empty((len(sub), 32))
        v = self.v
        for g, s in enumerate(sub):
            v[64:] = v[:-64]
            v[:64] = _N @ s
            u = np.empty(512)
            for j in range(8):
                u[64 * j:64 * j + 32] = v[128 * j:128 * j + 32]
                u[64 * j + 32:64 * j + 64] = v[128 * j + 96:128 * j + 128]
            out[g] = (u * _D_WIN).reshape(16, 32).sum(axis=0)
        self.v = v
        return out.reshape(-1)


class _Analyze:
    """ISO analysis filterbank state (512-sample X FIFO)."""

    def __init__(self):
        self.x = np.zeros(512)

    def run(self, audio: np.ndarray) -> np.ndarray:
        """(n*32,) audio -> (n, 32) subband samples."""
        n = len(audio) // 32
        out = np.empty((n, 32))
        x = self.x
        for g in range(n):
            x[32:] = x[:-32]
            x[:32] = audio[g * 32:(g + 1) * 32][::-1]
            y = (x * _C_WIN).reshape(8, 64).sum(axis=0)
            out[g] = _M @ y
        self.x = x
        return out


def _requant(code: int, n: int) -> float:
    # closed form of the Table B.4 C/D pairs: s'' = (2c + 1 - n) / n
    return (2 * code + 1 - n) / n


def decode_mp2(payload: bytes) -> Dict[str, np.ndarray]:
    """MPEG-1 Layer II stream -> mono float32 tensor (channel mean, the
    decode_wav downmix convention)."""
    pos, n = 0, len(payload)
    fs = None
    synths: List[_Synth] = []
    chunks: List[np.ndarray] = []
    while pos + 4 <= n:
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFE) != 0xFC:
            pos += 1                      # resync (also skips ID3 etc.)
            continue
        protection = payload[pos + 1] & 1
        b2 = payload[pos + 2]
        br_idx, fs_idx = b2 >> 4, (b2 >> 2) & 3
        padding = (b2 >> 1) & 1
        if br_idx in (0, 15) or fs_idx == 3:
            pos += 1
            continue
        b3 = payload[pos + 3]
        mode, mode_ext = (b3 >> 6) & 3, (b3 >> 4) & 3
        kbps = BITRATES[br_idx]
        fs = RATES[fs_idx]
        frame_len = 144 * kbps * 1000 // fs + padding
        body = payload[pos + 4 + (2 if protection == 0 else 0):
                       pos + frame_len]
        nch = 1 if mode == 3 else 2
        while len(synths) < nch:
            synths.append(_Synth())
        sub = _decode_frame(_BitReader(body), fs, kbps, mode, mode_ext)
        pcm = [synths[ch].run(sub[ch]) for ch in range(nch)]
        chunks.append(np.mean(pcm, axis=0))
        pos += frame_len
    if fs is None:
        raise ValueError("no MPEG-1 Layer II frame found")
    mono = np.concatenate(chunks) if chunks else np.zeros(0)
    return {"tensor": np.clip(mono, -1.0, 1.0).astype(np.float32),
            "sample_rate": np.int32(fs),
            "n_frames": np.int32(len(mono))}


def _decode_frame(br: _BitReader, fs: int, kbps: int, mode: int,
                  mode_ext: int) -> np.ndarray:
    nch = 1 if mode == 3 else 2
    table = _alloc_table(fs, kbps // nch)
    sblimit = len(table)
    bound = min((mode_ext + 1) * 4, sblimit) if mode == 1 else sblimit
    alloc = np.zeros((nch, sblimit), dtype=np.int64)
    for sb in range(sblimit):
        nbal = table[sb][0]
        if sb < bound:
            for ch in range(nch):
                alloc[ch, sb] = br.read(nbal)
        else:
            a = br.read(nbal)
            alloc[:, sb] = a
    scfsi = np.zeros((nch, sblimit), dtype=np.int64)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch, sb]:
                scfsi[ch, sb] = br.read(2)
    sf = np.zeros((nch, sblimit, 3))
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch, sb]:
                continue
            pat = scfsi[ch, sb]
            if pat == 0:
                idx = [br.read(6), br.read(6), br.read(6)]
            elif pat == 1:
                a, b = br.read(6), br.read(6)
                idx = [a, a, b]
            elif pat == 2:
                a = br.read(6)
                idx = [a, a, a]
            else:
                a, b = br.read(6), br.read(6)
                idx = [a, b, b]
            sf[ch, sb] = SCALE[np.clip(idx, 0, 62)]
    sub = np.zeros((nch, 36, 32))
    for gr in range(12):
        part = gr // 4
        for sb in range(sblimit):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                a = alloc[ch, sb]
                if not a:
                    continue
                nlev = table[sb][1][a - 1]
                bits, grouped = QUANT_BITS[nlev]
                if grouped:
                    v = br.read(bits)
                    codes = (v % nlev, (v // nlev) % nlev,
                             v // (nlev * nlev))
                else:
                    codes = (br.read(bits), br.read(bits), br.read(bits))
                for t in range(3):
                    val = _requant(codes[t], nlev)
                    if shared:
                        for c2 in range(nch):
                            sub[c2, 3 * gr + t, sb] = \
                                val * sf[c2, sb, part]
                    else:
                        sub[ch, 3 * gr + t, sb] = val * sf[ch, sb, part]
    return sub


def encode_mp2(samples: np.ndarray, sample_rate: int = 48000,
               kbps: int = 192) -> bytes:
    """Mono float samples in [-1, 1] -> MPEG-1 Layer II stream.

    Greedy per-frame bit allocation: each subband's scale factor is the
    smallest Table B.1 value covering its 12-sample part peaks (scfsi 0:
    all three parts sent); allocation steps are granted to the subband
    with the largest current quantization-error proxy sf/nlevels until
    the frame's bit budget is exhausted. Output frames are exactly
    144*kbps*1000//fs bytes (no padding; protection bit set = no CRC)."""
    if sample_rate not in RATES:
        raise ValueError(f"MPEG-1 Layer II sample rate {sample_rate}")
    if kbps not in BITRATES or kbps == 0:
        raise ValueError(f"Layer II bitrate {kbps}")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError("mono only")
    pad = (-len(x)) % 1152
    if pad:
        x = np.concatenate([x, np.zeros(pad)])
    table = _alloc_table(sample_rate, kbps)
    sblimit = len(table)
    frame_len = 144 * kbps * 1000 // sample_rate
    hdr2 = (BITRATES.index(kbps) << 4) | (RATES.index(sample_rate) << 2)
    header = bytes([0xFF, 0xFD, hdr2, 0xC0])      # mono, no CRC
    ana = _Analyze()
    out = bytearray()
    for f0 in range(0, len(x), 1152):
        sub = ana.run(x[f0:f0 + 1152])            # (36, 32)
        out.extend(_encode_frame(sub, table, sblimit, frame_len, header))
    return bytes(out)


def _encode_frame(sub: np.ndarray, table, sblimit: int, frame_len: int,
                  header: bytes) -> bytes:
    # scale factor index per (sb, part): smallest SCALE >= peak
    sfi = np.zeros((sblimit, 3), dtype=np.int64)
    sfv = np.zeros((sblimit, 3))
    for sb in range(sblimit):
        for part in range(3):
            peak = np.abs(sub[12 * part:12 * (part + 1), sb]).max()
            idx = np.searchsorted(-SCALE, -peak * 1.0000001)
            idx = min(max(int(idx), 0), 62)
            if SCALE[idx] < peak:
                idx = max(idx - 1, 0)
            sfi[sb, part] = idx
            sfv[sb, part] = SCALE[idx]
    budget = frame_len * 8 - 32 - sum(t[0] for t in table)
    alloc = np.zeros(sblimit, dtype=np.int64)

    def step_cost(sb: int, a: int) -> int:
        nlev = table[sb][1][a - 1]
        bits, grouped = QUANT_BITS[nlev]
        c = 12 * bits if grouped else 36 * bits
        prev = 0
        if a > 1:
            pl = table[sb][1][a - 2]
            pb, pg = QUANT_BITS[pl]
            prev = 12 * pb if pg else 36 * pb
        if a == 1:
            prev = -(2 + 18)          # scfsi + 3 six-bit scale factors
        return c - prev

    # greedy: grant the step with the largest error proxy that fits
    err = sfv.max(axis=1).astype(np.float64)      # ~ sf / nlevels(=1)
    live = err.copy()
    while True:
        order = np.argsort(-live)
        granted = False
        for sb in order:
            if live[sb] <= 0:
                break
            a = alloc[sb] + 1
            if a > len(table[sb][1]):
                live[sb] = 0
                continue
            cost = step_cost(sb, int(a))
            if cost <= budget:
                budget -= cost
                alloc[sb] = a
                nlev = table[sb][1][a - 1]
                live[sb] = err[sb] / nlev
                granted = True
                break
            live[sb] = 0
        if not granted:
            break
    bw = _BitWriter()
    for sb in range(sblimit):
        bw.write(int(alloc[sb]), table[sb][0])
    for sb in range(sblimit):
        if alloc[sb]:
            bw.write(0, 2)                        # scfsi 0: 3 factors
    for sb in range(sblimit):
        if alloc[sb]:
            for part in range(3):
                bw.write(int(sfi[sb, part]), 6)
    for gr in range(12):
        part = gr // 4
        for sb in range(sblimit):
            a = alloc[sb]
            if not a:
                continue
            nlev = table[sb][1][a - 1]
            bits, grouped = QUANT_BITS[nlev]
            codes = []
            for t in range(3):
                s = sub[3 * gr + t, sb] / max(sfv[sb, part], 1e-12)
                # inverse of s'' = (2c+1-n)/n: c = round((s*n - 1 + n)/2)
                c = int(round((s * nlev - 1 + nlev) / 2.0))
                codes.append(min(max(c, 0), nlev - 1))
            if grouped:
                bw.write(codes[0] + nlev * codes[1]
                         + nlev * nlev * codes[2], QUANT_BITS[nlev][0])
            else:
                for c in codes:
                    bw.write(c, bits)
    body = bw.flush()
    assert len(body) + 4 <= frame_len, "bit allocation exceeded frame"
    return header + body + b"\x00" * (frame_len - 4 - len(body))


# --------------------------------------------------------------------------- Layer I
# Layer I (ISO 11172-3 2.4.1.5): 384 samples/frame, all 32 subbands, one
# 4-bit allocation (nb = a + 1 bits, a in 1..14) and one 6-bit scale
# factor per allocated subband, 12 granules x 1 sample. Requantization is
# the SAME closed form with n = 2^nb - 1 levels.
BITRATES_L1 = (0, 32, 64, 96, 128, 160, 192, 224, 256, 288,
               320, 352, 384, 416, 448)


def decode_mp1(payload: bytes) -> Dict[str, np.ndarray]:
    """MPEG-1 Layer I stream -> mono float32 tensor (channel mean)."""
    pos, n = 0, len(payload)
    fs = None
    synths: List[_Synth] = []
    chunks: List[np.ndarray] = []
    while pos + 4 <= n:
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFE) != 0xFE:
            pos += 1
            continue
        protection = payload[pos + 1] & 1
        b2 = payload[pos + 2]
        br_idx, fs_idx = b2 >> 4, (b2 >> 2) & 3
        padding = (b2 >> 1) & 1
        if br_idx in (0, 15) or fs_idx == 3:
            pos += 1
            continue
        b3 = payload[pos + 3]
        mode, mode_ext = (b3 >> 6) & 3, (b3 >> 4) & 3
        kbps = BITRATES_L1[br_idx]
        fs = RATES[fs_idx]
        frame_len = (12 * kbps * 1000 // fs + padding) * 4
        body = payload[pos + 4 + (2 if protection == 0 else 0):
                       pos + frame_len]
        nch = 1 if mode == 3 else 2
        while len(synths) < nch:
            synths.append(_Synth())
        br = _BitReader(body)
        bound = min((mode_ext + 1) * 4, 32) if mode == 1 else 32
        alloc = np.zeros((nch, 32), dtype=np.int64)
        for sb in range(32):
            if sb < bound:
                for ch in range(nch):
                    alloc[ch, sb] = br.read(4)
            else:
                alloc[:, sb] = br.read(4)
        sf = np.zeros((nch, 32))
        for sb in range(32):
            for ch in range(nch):
                if alloc[ch, sb]:
                    sf[ch, sb] = SCALE[min(br.read(6), 62)]
        sub = np.zeros((nch, 12, 32))
        for gr in range(12):
            for sb in range(32):
                shared = sb >= bound
                for ch in range(1 if shared else nch):
                    a = alloc[ch, sb]
                    if not a:
                        continue
                    nb = int(a) + 1
                    val = _requant(br.read(nb), (1 << nb) - 1)
                    if shared:
                        for c2 in range(nch):
                            sub[c2, gr, sb] = val * sf[c2, sb]
                    else:
                        sub[ch, gr, sb] = val * sf[ch, sb]
        pcm = [synths[ch].run(sub[ch]) for ch in range(nch)]
        chunks.append(np.mean(pcm, axis=0))
        pos += frame_len
    if fs is None:
        raise ValueError("no MPEG-1 Layer I frame found")
    mono = np.concatenate(chunks) if chunks else np.zeros(0)
    return {"tensor": np.clip(mono, -1.0, 1.0).astype(np.float32),
            "sample_rate": np.int32(fs),
            "n_frames": np.int32(len(mono))}


def encode_mp1(samples: np.ndarray, sample_rate: int = 48000,
               kbps: int = 384) -> bytes:
    """Mono float samples -> MPEG-1 Layer I stream (greedy allocation,
    same error-proxy rule as Layer II; no padding, no CRC)."""
    if sample_rate not in RATES:
        raise ValueError(f"MPEG-1 sample rate {sample_rate}")
    if kbps not in BITRATES_L1 or kbps == 0:
        raise ValueError(f"Layer I bitrate {kbps}")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError("mono only")
    pad = (-len(x)) % 384
    if pad:
        x = np.concatenate([x, np.zeros(pad)])
    frame_len = 12 * kbps * 1000 // sample_rate * 4
    hdr2 = (BITRATES_L1.index(kbps) << 4) | (RATES.index(sample_rate) << 2)
    header = bytes([0xFF, 0xFF, hdr2, 0xC0])      # layer I, mono, no CRC
    ana = _Analyze()
    out = bytearray()
    for f0 in range(0, len(x), 384):
        sub = ana.run(x[f0:f0 + 384])             # (12, 32)
        sfi = np.zeros(32, dtype=np.int64)
        sfv = np.zeros(32)
        for sb in range(32):
            peak = np.abs(sub[:, sb]).max()
            idx = np.searchsorted(-SCALE, -peak * 1.0000001)
            idx = min(max(int(idx), 0), 62)
            if SCALE[idx] < peak:
                idx = max(idx - 1, 0)
            sfi[sb], sfv[sb] = idx, SCALE[idx]
        budget = frame_len * 8 - 32 - 32 * 4
        alloc = np.zeros(32, dtype=np.int64)
        err = sfv.copy()
        live = err.copy()
        while True:
            order = np.argsort(-live)
            granted = False
            for sb in order:
                if live[sb] <= 0:
                    break
                a = alloc[sb] + 1
                if a > 14:
                    live[sb] = 0
                    continue
                cost = 12 if a > 1 else (12 * 2 + 6)   # +1 bit/sample;
                #                       first grant: 2-bit codes + sf
                if cost <= budget:
                    budget -= cost
                    alloc[sb] = a
                    live[sb] = err[sb] / ((1 << (a + 1)) - 1)
                    granted = True
                    break
                live[sb] = 0
            if not granted:
                break
        bw = _BitWriter()
        for sb in range(32):
            bw.write(int(alloc[sb]), 4)
        for sb in range(32):
            if alloc[sb]:
                bw.write(int(sfi[sb]), 6)
        for gr in range(12):
            for sb in range(32):
                a = alloc[sb]
                if not a:
                    continue
                nb = int(a) + 1
                nlev = (1 << nb) - 1
                s = sub[gr, sb] / max(sfv[sb], 1e-12)
                c = int(round((s * nlev - 1 + nlev) / 2.0))
                bw.write(min(max(c, 0), nlev - 1), nb)
        body = bw.flush()
        assert len(body) + 4 <= frame_len, "Layer I allocation overflow"
        out.extend(header + body + b"\x00" * (frame_len - 4 - len(body)))
    return bytes(out)
