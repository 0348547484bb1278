"""Pure-python/numpy FLAC decoder + minimal encoder (round-4).

FLAC is the dominant lossless container for speech/audio ML corpora
(LibriSpeech et al.), so the multimodal audio path decodes it for real:
STREAMINFO parsing, frame sync, UTF-8 frame numbers, all four subframe
types (constant / verbatim / fixed orders 0-4 / LPC orders 1-32), Rice
residual coding (both 4- and 5-bit parameter methods, escape-to-raw
partitions), wasted-bits shifts, and the three stereo decorrelation modes
(left/side, right/side, mid/side). CRCs are written correctly by the
encoder and skipped (not verified) by the decoder.

Reference semantics: the public FLAC format specification
(xiph.org/flac/format.html / RFC 9639). The encoder is the deterministic
test/synth counterpart (same policy as encode_jpeg/encode_png): verbatim
or fixed-order-2 subframes with real Rice coding, so decoder round-trips
are bit-exact and exercise the Rice path.

The per-sample loops live inside the per-payload decode of an actor-pool
stage (same boundary as jpeg.py's Huffman loop) — never corpus-wide.
"""

from __future__ import annotations

import struct
from typing import Dict, List

import numpy as np

_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                 4: [4, -6, 4, -1]}


class _BitReader:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8          # absolute bit position

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        end_byte = (self.pos + 7) >> 3
        chunk = int.from_bytes(self.data[p >> 3:end_byte], "big")
        pad = (end_byte << 3) - self.pos
        return (chunk >> pad) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_utf8_number(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        while (b0 << n) & 0x80:
            n += 1
        v = b0 & (0x7F >> n)
        for _ in range(n - 1):
            v = (v << 6) | (self.read(8) & 0x3F)
        return v


_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE_CODE = {0: 0, 1: 88200, 2: 176400, 3: 192000, 4: 8000,
                     5: 16000, 6: 22050, 7: 24000, 8: 32000, 9: 44100,
                     10: 48000, 11: 96000}


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> List[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    parts = 1 << po
    if blocksize % parts:
        raise ValueError("FLAC partition order does not divide block size")
    out: List[int] = []
    for p in range(parts):
        n = blocksize // parts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(br.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | (br.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe sync error (padding bit set)")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted
    if ftype == 0:                                   # constant
        samples = [br.read_signed(bps)] * blocksize
    elif ftype == 1:                                 # verbatim
        samples = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:                           # fixed order 0-4
        order = ftype - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - i] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif ftype >= 32:                                # LPC
        order = (ftype & 31) + 1
        samples = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        for r in resid:
            acc = sum(c * samples[-1 - i] for i, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    arr = np.asarray(samples, dtype=np.int64)
    if wasted:
        arr <<= wasted
    return arr


def decode_flac(payload: bytes) -> Dict[str, np.ndarray]:
    """FLAC -> the audio pipeline contract {'tensor' 1-D float32 mono in
    [-1, 1] (channel mean), 'sample_rate', 'n_frames'}."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:                                      # metadata blocks
        hdr = payload[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        if btype == 0:                               # STREAMINFO
            body = payload[pos + 4:pos + 4 + ln]
            br = _BitReader(body)
            br.read(16)                              # min blocksize
            br.read(16)                              # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, nch, bps, total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps_si, total = info
    br = _BitReader(payload, pos)
    nbits = len(payload) * 8
    chans: List[List[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    while br.pos + 32 <= nbits and (total == 0 or got < total):
        if br.read(14) != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        br.read(1)                                   # reserved
        br.read(1)                                   # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)                                   # reserved
        br.read_utf8_number()                        # frame/sample number
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        bps = bps_si if ss_code == 0 else _SAMPLE_SIZE_CODE[ss_code]
        br.read(8)                                   # header CRC-8
        if ch_code < 8:                              # independent
            subs = [_decode_subframe(br, blocksize, bps)
                    for _ in range(ch_code + 1)]
        elif ch_code == 8:                           # left/side
            left = _decode_subframe(br, blocksize, bps)
            side = _decode_subframe(br, blocksize, bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:                           # right/side
            side = _decode_subframe(br, blocksize, bps + 1)
            right = _decode_subframe(br, blocksize, bps)
            subs = [right + side, right]
        elif ch_code == 10:                          # mid/side
            mid = _decode_subframe(br, blocksize, bps)
            side = _decode_subframe(br, blocksize, bps + 1)
            left = ((mid << 1) | (side & 1)) + side
            subs = [left >> 1, (left - (side << 1)) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        br.align()
        br.read(16)                                  # frame CRC-16
        for c, s in enumerate(subs):
            chans[c].append(s)
        got += blocksize
    if not chans[0]:
        raise ValueError("FLAC stream has no frames")
    mat = np.stack([np.concatenate(c) for c in chans], axis=1) \
        .astype(np.float64)
    if total:
        mat = mat[:total]
    x = mat.mean(axis=1) / float(1 << (bps_si - 1))
    return {"tensor": x.astype(np.float32), "sample_rate": np.int32(rate),
            "n_frames": np.int32(len(x))}


# --------------------------------------------------------------------- crc

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.cur = (self.cur << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.cur >> self.nbits) & 0xFF)
        self.cur &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_param(resid: np.ndarray) -> int:
    mean = float(np.abs(resid).mean()) if len(resid) else 0.0
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def encode_flac(samples: np.ndarray, sample_rate: int = 16000,
                blocksize: int = 1024, fixed_order: int = 2) -> bytes:
    """Mono int16 -> FLAC with fixed-order predicted subframes + real Rice
    residual coding (one partition), correct CRC-8/CRC-16 and STREAMINFO.
    The deterministic test/synth counterpart of decode_flac."""
    pcm = np.asarray(samples, dtype=np.int64)
    total = len(pcm)
    bps = 16
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)                                   # channels - 1
    si.write(bps - 1, 5)
    si.write(total, 36)
    streaminfo = si.bytes() + b"\x00" * 16           # MD5 unset
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fidx, start in enumerate(range(0, total, blocksize)):
        blk = pcm[start:start + blocksize]
        n = len(blk)
        order = fixed_order if n > fixed_order else 0
        coefs = _FIXED_COEFFS[order]
        hw = _BitWriter()
        hw.write(0x3FFE, 14)
        hw.write(0, 1)
        hw.write(0, 1)                               # fixed blocksize
        hw.write(7, 4)                               # 16-bit blocksize field
        hw.write(0, 4)                               # rate from STREAMINFO
        hw.write(0, 4)                               # 1 channel
        hw.write(4, 3)                               # 16 bps
        hw.write(0, 1)
        hw.align()
        hdr = hw.bytes() + _utf8_number(fidx) \
            + struct.pack(">H", n - 1)
        hdr += bytes([_crc8(hdr)])
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(8 + order, 6)                       # fixed subframe
        bw.write(0, 1)                               # no wasted bits
        for i in range(order):
            bw.write(int(blk[i]) & 0xFFFF, bps)
        resid = blk[order:].copy()
        for i, c in enumerate(coefs):
            resid = resid - c * pcm[start + order - 1 - i:
                                    start + n - 1 - i]
        param = _rice_param(resid)
        bw.write(0, 2)                               # rice method 0
        bw.write(0, 4)                               # partition order 0
        bw.write(param, 4)
        for r in resid:
            v = (int(r) << 1) ^ (int(r) >> 63)       # zigzag
            bw.write_unary(v >> param)
            if param:
                bw.write(v & ((1 << param) - 1), param)
        bw.align()
        body = bw.bytes()
        out += hdr + body + struct.pack(">H", _crc16(hdr + body))
    return bytes(out)
