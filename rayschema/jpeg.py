"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, SOF0).

The round-3 verdict's last real multimodal gap: JPEG is the dominant image
format of any real corpus, and this container has no codec library. Decoder
and encoder are built from the public spec only:

* ``decode_jpeg``: marker parse (DQT / SOF0 / DHT / SOS / DRI), canonical
  Huffman entropy decode with byte-unstuffing and RSTn handling, dequant,
  de-zigzag, exact orthonormal 8x8 IDCT (two matmuls), integer-factor
  chroma upsampling for any (h, v) sampling (4:4:4 / 4:2:2 / 4:2:0), JFIF
  BT.601 full-range YCbCr -> RGB. Grayscale (1 component) supported.
* ``encode_jpeg``: the matching baseline encoder (level shift, optional
  2x2 chroma box subsampling, FDCT, quality-scaled quant, zigzag, fixed
  flat-length canonical Huffman tables written into DHT) — it exists so the
  decoder has real compressed bitstreams to be golden-tested against
  without any external library.

Entropy decode is per-coefficient Python (a decode-bound actor stage would
batch images per actor; the per-image cost is the codec, not the engine).
All array math (IDCT/FDCT, color transform, upsampling) is numpy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# zigzag position -> (row, col), generated per the T.81 diagonal rule
_ZIGZAG: List[Tuple[int, int]] = []
for _s in range(15):
    _cells = [(r, _s - r) for r in range(_s + 1) if r < 8 and _s - r < 8]
    if _s % 2 == 0:
        _cells = _cells[::-1]
    _ZIGZAG += _cells
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

# orthonormal DCT-II basis: M[u, x] = a(u) cos((2x+1) u pi / 16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _DCT_M[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex-K luminance quantization table (the canonical example table); the
# encoder embeds whatever it uses in DQT, so the decoder never assumes it
_QUANT_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)


def _quality_table(quality: int) -> np.ndarray:
    """IJG-style quality scaling of the base table (50 = base)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QUANT_BASE * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman tables: canonical codes from (bits-per-length, symbol list)


class _HuffDecoder:
    """Canonical Huffman decode table: (length, code) -> symbol."""

    def __init__(self, counts: List[int], symbols: List[int]):
        self.lut: Dict[Tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _flat_tables(n_symbols: int, length: int):
    """Encoder-side fixed tables: every symbol at the same code length —
    a valid canonical code whenever n_symbols < 2^length (the all-ones
    code stays unused, as T.81 requires). Returns (counts, symbols,
    code_of_symbol)."""
    assert n_symbols < (1 << length)
    counts = [0] * 16
    counts[length - 1] = n_symbols
    symbols = list(range(n_symbols))
    codes = {s: (length, s) for s in symbols}
    return counts, symbols, codes


# DC categories 0..11; AC run/size symbols 0x00..0xFA (162 used values,
# but a dense 0..250 table keeps the flat-code construction trivial)
_DC_COUNTS, _DC_SYMBOLS, _DC_CODES = _flat_tables(12, 5)
_AC_COUNTS, _AC_SYMBOLS, _AC_CODES = _flat_tables(251, 9)


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0
        self.cur = 0

    def read_bit(self) -> int:
        if self.bit == 0:
            if self.pos >= len(self.data):
                raise EOFError("entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1          # stuffed byte
                else:
                    raise EOFError("marker inside entropy stream")
            self.cur = b
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bit = 0


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= (8 - self.nbits)
            self.acc |= (1 << (8 - self.nbits)) - 1   # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> Dict[str, np.ndarray]:
    """Baseline sequential JPEG -> {'tensor' (gray float32 0..1), 'rgb'
    (H,W,3 uint8), 'n_frames': 1}. Raises ValueError on non-baseline
    frames (progressive SOF2 etc.)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:                       # EOI
            break
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals.astype(np.int64)
                qt[tid] = tbl
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline)
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG frame (SOF{marker - 0xC0})")
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                nsym = sum(counts)
                symbols = list(seg[i + 17:i + 17 + nsym])
                huff[(tc, th)] = _HuffDecoder(counts, symbols)
                i += 17 + nsym
        elif marker == 0xDD:                     # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "td": tt >> 4, "ta": tt & 15})
            data_start = pos + seglen
            return _decode_scan(payload, data_start, frame, scan, qt,
                                huff, restart_interval)
        pos += seglen
    raise ValueError("no scan data found")


def _decode_scan(payload, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in scan:
        planes.append(np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                               dtype=np.float64))
    br = _BitReader(payload[pos:])
    preds = [0] * len(scan)
    mt = _DCT_M.T
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.align()
            # skip the RSTn marker bytes
            while br.pos < len(br.data) and br.data[br.pos] == 0xFF \
                    and 0xD0 <= br.data[br.pos + 1] <= 0xD7:
                br.pos += 2
                break
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            dc_t = huff[(0, c["td"])]
            ac_t = huff[(1, c["ta"])]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int64)
                    t = dc_t.decode(br)
                    preds[ci] += _extend(br.receive(t), t)
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(br)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break                  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index out of range")
                        coef[k] = _extend(br.receive(s), s)
                        k += 1
                    block = np.zeros((8, 8), dtype=np.float64)
                    block[_ZZ_ROWS, _ZZ_COLS] = coef * q[_ZZ_ROWS, _ZZ_COLS]
                    pix = mt @ block @ _DCT_M + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(full[0], 0, 255)
        rgb = np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
    tensor = rgb.astype(np.float32).mean(axis=2) / 255.0
    return {"tensor": tensor, "rgb": rgb, "n_frames": np.int32(1)}


# ---------------------------------------------------------------------------
# encoder


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) level-shifted plane -> (H//8 * W//8, 64) zigzagged quantized
    int coefficients; the FDCT runs as one batched einsum over all blocks."""
    hh, ww = plane.shape
    blocks = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    freq = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    qd = np.round(freq / q[None, :, :]).astype(np.int64)
    return qd[:, _ZZ_ROWS, _ZZ_COLS]


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _emit_block(bw: _BitWriter, zz: np.ndarray, pred: int) -> int:
    diff = int(zz[0]) - pred
    t = _cat(diff)
    length, code = _DC_CODES[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            al, ac = _AC_CODES[0xF0]
            bw.write(ac, al)
            run -= 16
        s = _cat(v)
        al, ac = _AC_CODES[(run << 4) | s]
        bw.write(ac, al)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        al, ac = _AC_CODES[0x00]
        bw.write(ac, al)
    return int(zz[0])


def _pad_to(p: np.ndarray, mult: int) -> np.ndarray:
    hh, ww = p.shape
    ph = (-hh) % mult
    pw = (-ww) % mult
    return np.pad(p, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(rgb: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale) -> baseline JPEG bytes.
    ``subsample=True`` emits 4:2:0 (2x2 chroma box average + interleaved
    4Y+Cb+Cr MCUs), exercising the decoder's multi-block-MCU path."""
    rgb = np.asarray(rgb)
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    q = _quality_table(quality)
    if gray:
        planes = [rgb.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        r = rgb[:, :, 0].astype(np.float64)
        g = rgb[:, :, 1].astype(np.float64)
        b = rgb[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            yp = _pad_to(y, 16)
            cbp = _pad_to(cb, 16)
            crp = _pad_to(cr, 16)
            cb2 = cbp.reshape(cbp.shape[0] // 2, 2,
                              cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(crp.shape[0] // 2, 2,
                              crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [yp - 128.0, cb2 - 128.0, cr2 - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
    planes = [_pad_to(p, 8) for p in planes]
    zz = [_fdct_quant(p, q) for p in planes]

    out = bytearray(b"\xff\xd8")                       # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(int(q[r_, c_])       # DQT, table 0
                                 for r_, c_ in _ZIGZAG))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS) \
        + bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS)
    seg(0xC4, dht)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    hmax = max(s_[0] for s_ in samp)
    vmax = max(s_[1] for s_ in samp)
    mcux = planes[0].shape[1] // (8 * hmax)
    mcuy = planes[0].shape[0] // (8 * vmax)
    wblocks = [p.shape[1] // 8 for p in planes]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * wblocks[ci] + (mx * hs + bx)
                        preds[ci] = _emit_block(bw, zz[ci][bi], preds[ci])
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")                            # EOI
    return bytes(out)
