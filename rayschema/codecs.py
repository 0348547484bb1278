"""Round-4 compressed-media codecs, pure numpy/stdlib (no codec library in
this container): GIF (LZW, GIF87a/89a, interlace + multi-frame), PNG
(DEFLATE via stdlib zlib; all five scanline filters, palette, Adam7
interlace), G.711 mu-law / A-law and IMA ADPCM compressed audio inside
RIFF/WAVE, and MJPEG-in-AVI video (RIFF AVI 'movi' chunks of baseline JPEG
frames, decoded by rayschema/jpeg.py). Together with jpeg.py these make every common
*container* kind in the synthetic corpus decode for real; the remaining
documented stub boundary is the DCT/entropy video codecs (H.264/HEVC) and
MP3/AAC, which genuinely need external libraries.

All decoders return the multimodal pipeline contract (see
rayschema/multimodal.py): images -> {'tensor' (h, w) float32 luma 0..1,
'rgb' (h, w, 3) uint8, 'n_frames'}; audio -> {'tensor' 1-D float32 mono,
'sample_rate', 'n_frames'}; video -> {'tensor' (n, h, w) float32 luma}.

Encoders exist as the deterministic test/synth counterparts (same policy as
encode_ppm / encode_jpeg): every decoder is exercised end-to-end by a
round-trip through its own encoder plus golden-value tests; G.711 codecs are
additionally verified by exhaustive 256-code involution
(encode(decode(c)) == c for every code byte).

Reference semantics (public specs): GIF89a specification (W3C/CompuServe,
1990) appendix F LZW; ITU-T G.711 (mu-law/A-law companding, the public-domain
Sun Microsystems g711.c formulation); IMA ADPCM (IMA Digital Audio Focus
Group, 1992; WAVE format tag 0x11); OpenDML AVI (RIFF 'AVI ' / 'movi');
W3C PNG specification / RFC 2083 (scanline filters, Adam7).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# --------------------------------------------------------------------------
# GIF (LZW)
# --------------------------------------------------------------------------

_GIF_MAX_CODE = 1 << 12          # LZW code width is capped at 12 bits


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, clear/EOI codes, code width
    grows when the table fills 2^width, capped at 12 bits (a full table
    stops growing until the next clear — 'deferred clear' streams decode)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table: List[bytes] = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    prev: bytes | None = None
    while bitpos + code_size <= nbits:
        i = bitpos >> 3
        word = int.from_bytes(data[i:i + 3], "little")
        code = (word >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream (first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _GIF_MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < _GIF_MAX_CODE:
                table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code gap)")
        out += entry
        prev = entry
        if len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError(
            f"GIF LZW underrun: {len(out)} of {expected} pixels")
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    """Real LZW compression (dict of prefixes), the decoder's inverse.
    Emits clear + resets when the table fills — every stream it produces
    stays within the 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    curbits = 0

    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1

    def emit(code: int) -> None:
        nonlocal cur, curbits
        cur |= code << curbits
        curbits += code_size
        while curbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            curbits -= 8

    emit(clear)
    w = b""
    for px in pixels:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _GIF_MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # decoder widens one append later than the power boundary:
            # after ITS append makes the table 2^width long, the NEXT read
            # uses width+1 — mirror that timing exactly
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:                       # table full: clear and start over
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(eoi)
    if curbits:
        out.append(cur & 0xFF)
    return bytes(out)


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))   # GIF89a interlace passes


def decode_gif(payload: bytes) -> Dict[str, np.ndarray]:
    """Pure-python/numpy GIF87a/89a decoder: global + local color tables,
    LZW image data, interlacing, multiple frames (composited onto the
    logical screen, disposal 'leave in place' — enough for feature
    extraction), GCE transparency honored as 'keep underlying pixel'.
    Returns the first composited frame's luma/rgb + n_frames."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[0]
    first = None
    n_frames = 0
    transparent = -1
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:                              # trailer
            break
        if b0 == 0x21:                              # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # GCE
                flags = payload[pos + 1]
                transparent = payload[pos + 4] if flags & 1 else -1
            while payload[pos]:                     # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, w, h, ipk = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipk & 0x80:
            n = 2 << (ipk & 7)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image without any color table")
        mcs = payload[pos]
        pos += 1
        parts = []
        while payload[pos]:
            ln = payload[pos]
            parts.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(mcs, b"".join(parts), w * h),
                            np.uint8)
        if ipk & 0x40:                              # interlaced
            rows = np.empty(h, dtype=np.int64)
            r = 0
            for start, step in _DEINTERLACE:
                nrow = len(range(start, h, step))
                rows[start:h:step] = np.arange(r, r + nrow)
                r += nrow
            idx = idx.reshape(h, w)[rows]
        else:
            idx = idx.reshape(h, w)
        region = canvas[top:top + h, left:left + w]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent >= 0:
            keep = idx == transparent
            rgb = np.where(keep[:, :, None], region, rgb)
        canvas[top:top + h, left:left + w] = rgb
        n_frames += 1
        if first is None:
            first = canvas.copy()
        transparent = -1
    if n_frames == 0:
        raise ValueError("GIF has no image data")
    tensor = first.astype(np.float32).mean(axis=2) / 255.0
    return {"tensor": tensor, "rgb": first,
            "n_frames": np.int32(n_frames)}


def encode_gif(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> single-frame GIF89a with a 256-entry color table
    built from the image's unique colors (quantizes to the 256 most frequent
    when over — synth images stay under). Test/synth counterpart of
    decode_gif."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    packed24 = (flat[:, 0].astype(np.int64) << 16) \
        | (flat[:, 1].astype(np.int64) << 8) | flat[:, 2]
    colors, inv, counts = np.unique(packed24, return_inverse=True,
                                    return_counts=True)
    if len(colors) > 256:
        keep = np.argsort(-counts)[:256]
        kept = colors[keep]
        order = np.argsort(kept)
        kept_sorted = kept[order]
        # nearest kept color by packed value (cheap quantizer, test-grade)
        p = np.clip(np.searchsorted(kept_sorted, packed24), 0,
                    len(kept_sorted) - 1)
        pm = np.clip(p - 1, 0, len(kept_sorted) - 1)
        pick = np.where(
            np.abs(kept_sorted[p] - packed24)
            <= np.abs(kept_sorted[pm] - packed24), p, pm)
        colors = kept_sorted
        idx = pick.astype(np.uint8)
    else:
        idx = inv.astype(np.uint8)
    n = len(colors)
    ctbits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    ctsize = 1 << ctbits
    table = np.zeros((ctsize, 3), dtype=np.uint8)
    table[:n, 0] = (colors >> 16) & 0xFF
    table[:n, 1] = (colors >> 8) & 0xFF
    table[:n, 2] = colors & 0xFF
    mcs = max(2, ctbits)
    lzw = _lzw_encode(mcs, idx.tobytes())
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (ctbits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        blk = lzw[i:i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# G.711 companded audio (mu-law / A-law) — vectorized via 256-entry LUTs
# --------------------------------------------------------------------------

def _build_mulaw_lut() -> np.ndarray:
    u = np.arange(256, dtype=np.int64) ^ 0xFF           # ~u
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _build_alaw_lut() -> np.ndarray:
    a = np.arange(256, dtype=np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


MULAW_LUT = _build_mulaw_lut()
ALAW_LUT = _build_alaw_lut()


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """u8 code bytes -> int16 linear PCM (ITU-T G.711 mu-law)."""
    return MULAW_LUT[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """u8 code bytes -> int16 linear PCM (ITU-T G.711 A-law)."""
    return ALAW_LUT[np.asarray(codes, dtype=np.uint8)]


def _lut_encoder(lut: np.ndarray):
    """Nearest-decoded-value quantizer over a 256-entry companding LUT —
    encode is exactly the decode table's inverse by construction (the one
    mu-law degeneracy: codes 0x7F and 0xFF both decode to 0, so one of the
    two maps to the other on re-encode), and it vectorizes to a single
    searchsorted per batch."""
    order = np.argsort(lut, kind="stable").astype(np.uint8)
    svals = lut[order].astype(np.int32)

    def enc(pcm: np.ndarray) -> np.ndarray:
        x = np.asarray(pcm, dtype=np.int32)
        p = np.clip(np.searchsorted(svals, x), 1, len(svals) - 1)
        lo = p - 1
        pick = np.where(np.abs(svals[p] - x) < np.abs(x - svals[lo]), p, lo)
        return order[pick]

    return enc


#: int16 linear -> u8 mu-law codes, vectorized.
mulaw_encode = _lut_encoder(MULAW_LUT)
#: int16 linear -> u8 A-law codes, vectorized.
alaw_encode = _lut_encoder(ALAW_LUT)


# --------------------------------------------------------------------------
# IMA ADPCM (WAVE format tag 0x11)
# --------------------------------------------------------------------------

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int,
                        index: int) -> np.ndarray:
    """Sequential IMA ADPCM inner loop for one block (state-carrying by
    definition; blocks are short — 505 samples at the standard 256-byte
    block_align — and each payload decodes inside an actor, so the loop is
    per-block, never per-corpus)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    step_t = IMA_STEP_TABLE
    idx_t = IMA_INDEX_TABLE
    for i, nb in enumerate(nibbles):
        step = int(step_t[index])
        diff = step >> 3
        if nb & 4:
            diff += step
        if nb & 2:
            diff += step >> 1
        if nb & 1:
            diff += step >> 2
        pred = pred - diff if nb & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(idx_t[nb & 7])))
        out[i] = pred
    return out


def ima_adpcm_decode_block(block: bytes, n_ch: int) -> np.ndarray:
    """One WAVE IMA ADPCM block -> (samples, n_ch) int16. Block layout:
    per-channel 4-byte header (predictor int16, step index u8, reserved),
    then interleaved 4-byte channel groups of 8 nibbles each."""
    heads = []
    for c in range(n_ch):
        pred, index, _r = struct.unpack_from("<hBB", block, c * 4)
        heads.append((pred, index))
    data = np.frombuffer(block, np.uint8, offset=4 * n_ch)
    lo = data & 0x0F
    hi = data >> 4
    nib = np.empty(len(data) * 2, dtype=np.uint8)
    nib[0::2] = lo                                  # low nibble first
    nib[1::2] = hi
    # channels interleave in 8-nibble (4-byte) groups
    per_ch = len(nib) // (8 * n_ch) * 8
    cols = []
    groups = nib[:per_ch * n_ch].reshape(-1, n_ch, 8)
    for c in range(n_ch):
        ch_nib = groups[:, c, :].reshape(-1)
        pred, index = heads[c]
        dec = _ima_decode_nibbles(ch_nib, pred, index)
        cols.append(np.concatenate(
            [np.array([pred], dtype=np.int16), dec]))
    return np.stack(cols, axis=1)


def ima_adpcm_encode(pcm: np.ndarray, block_align: int = 256) -> bytes:
    """Mono int16 -> WAVE IMA ADPCM block stream (test/synth counterpart;
    sequential by nature, used only to build fixtures)."""
    pcm = np.asarray(pcm, dtype=np.int32)
    samples_per_block = (block_align - 4) * 2 + 1
    out = bytearray()
    index = 0
    pos = 0
    n = len(pcm)
    while pos < n:
        chunk = pcm[pos:pos + samples_per_block]
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(IMA_STEP_TABLE[index])
            diff = int(s) - pred
            nb = 0
            if diff < 0:
                nb = 8
                diff = -diff
            d = step >> 3
            if diff >= step:
                nb |= 4
                diff -= step
                d += step
            if diff >= step >> 1:
                nb |= 2
                diff -= step >> 1
                d += step >> 1
            if diff >= step >> 2:
                nb |= 1
                d += step >> 2
            pred = pred - d if nb & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(IMA_INDEX_TABLE[nb & 7])))
            nibbles.append(nb)
        if len(nibbles) % 2:
            nibbles.append(0)
        arr = np.asarray(nibbles, dtype=np.uint8)
        packed = (arr[0::2] | (arr[1::2] << 4)).astype(np.uint8)
        body = packed.tobytes().ljust(block_align - 4, b"\x00")
        out += body
        pos += samples_per_block
    return bytes(out)


def encode_wav_compressed(samples: np.ndarray, sample_rate: int = 8000,
                          codec: str = "mulaw",
                          block_align: int = 256) -> bytes:
    """1-D float [-1, 1] -> compressed mono WAV bytes: 'mulaw' (tag 7),
    'alaw' (tag 6) or 'ima_adpcm' (tag 0x11). Test/synth counterpart of the
    decode_wav compressed branches."""
    pcm16 = np.round(np.clip(np.asarray(samples, np.float64), -1, 1)
                     * 32767.0).astype(np.int16)
    if codec == "mulaw":
        tag, bits, ba = 7, 8, 1
        data = mulaw_encode(pcm16).tobytes()
    elif codec == "alaw":
        tag, bits, ba = 6, 8, 1
        data = alaw_encode(pcm16).tobytes()
    elif codec == "ima_adpcm":
        tag, bits, ba = 0x11, 4, block_align
        data = ima_adpcm_encode(pcm16, block_align)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    spb = (block_align - 4) * 2 + 1 if tag == 0x11 else 1
    extra = struct.pack("<HH", 2, spb) if tag == 0x11 else b""
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate,
                      sample_rate * ba // max(spb, 1) if tag == 0x11
                      else sample_rate * ba, ba, bits) + extra
    # fact chunk (true sample-frame count) is mandatory for compressed WAV
    # and is what lets the decoder drop final-block padding samples
    fact = struct.pack("<I", len(pcm16))
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"fact" + struct.pack("<I", len(fact)) + fact \
        + b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


# --------------------------------------------------------------------------
# MJPEG in AVI
# --------------------------------------------------------------------------

def _riff_chunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", buf, pos)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi_mjpeg(payload: bytes) -> Dict[str, np.ndarray]:
    """MJPEG-in-AVI decoder: walks RIFF 'AVI ' -> LIST 'movi', decodes every
    '..dc'/'..db' chunk that carries a JPEG SOI with the pure-numpy baseline
    JPEG codec (rayschema/jpeg.py). Frames resize (nearest) to the first
    frame's geometry if a stream mixes sizes. fps read from the first
    'strh' (dwRate/dwScale) when present. Output matches decode_y4m:
    {'tensor' (n, h, w) float32 luma, 'n_frames', 'fps_num', 'fps_den'}."""
    from rayschema.jpeg import decode_jpeg
    from rayschema.multimodal import resize_nearest

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fps_num, fps_den = 0, 1
    frames: List[np.ndarray] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal fps_num, fps_den
        for cid, body, size in _riff_chunks(payload, pos, stop):
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"strh" and size >= 32:
                fcc = payload[body:body + 4]
                if fcc == b"vids" and fps_num == 0:
                    scale, rate = struct.unpack_from("<II", payload,
                                                     body + 20)
                    if scale:
                        fps_num, fps_den = rate, scale
            elif cid[2:4] in (b"dc", b"db") \
                    and payload[body:body + 2] == b"\xff\xd8":
                t = decode_jpeg(payload[body:body + size])["tensor"]
                if frames and t.shape != frames[0].shape:
                    t = resize_nearest(t, *frames[0].shape)
                frames.append(t)

    walk(12, end)
    if not frames:
        raise ValueError("AVI has no MJPEG frames")
    return {"tensor": np.stack(frames).astype(np.float32),
            "n_frames": np.int32(len(frames)),
            "fps_num": np.int32(fps_num), "fps_den": np.int32(fps_den)}


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 25,
                     quality: int = 85) -> bytes:
    """(n, h, w, 3) uint8 RGB -> minimal MJPEG AVI (test/synth counterpart
    of decode_avi_mjpeg; header carries real geometry + rate so other
    readers parse it too)."""
    from rayschema.jpeg import encode_jpeg

    n, h, w = frames.shape[:3]
    jpegs = [encode_jpeg(frames[i], quality=quality, subsample=True)
             for i in range(n)]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", 1000000 // fps, 0, 0, 0x10, n, 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIIhhhh",
                                           0, 0, 0, 0, 1, fps, 0, n,
                                           0, 0, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# PNG (RFC 2083 / W3C PNG spec; DEFLATE via the stdlib zlib)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 pass layout: (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Undo per-scanline filtering (types 0-4) for one (sub)image of
    ``h`` rows x ``w`` pixels x ``ch`` bytes/pixel. none/up rows decode as
    one vector op; sub/average/paeth carry a per-pixel recurrence by
    definition, so those rows run a bounded loop of length w*ch (decode is
    per-payload inside an actor pool — never a corpus-wide loop)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride,
                                                               np.int32)
        if ft == 0:
            out[y] = line.astype(np.uint8)
        elif ft == 2:                                   # up
            out[y] = ((line + prior) & 0xFF).astype(np.uint8)
        elif ft == 1:                                   # sub
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif ft == 3:                                   # average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prior[i]) >> 1)) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif ft == 4:                                   # paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prior[i]
                c = int(out[y - 1, i - ch]) if (y and i >= ch) else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                cur[i] = (cur[i] + pred) & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return out.reshape(h, w, ch)


def decode_png(payload: bytes) -> Dict[str, np.ndarray]:
    """Pure-numpy+zlib PNG decoder: 8-bit gray / gray+alpha / RGB / RGBA /
    palette, all five scanline filters, Adam7 interlace. Alpha is dropped
    (feature extraction is luminance-based); tRNS ignored. Returns the
    image contract: {'tensor' (h, w) float32 luma, 'rgb' (h, w, 3) uint8,
    'n_frames': 1}."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        ln, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln                                  # +4 CRC (unchecked)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, comp={comp})")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    img = np.zeros((h, w, ch), dtype=np.uint8)
    if interlace == 0:
        img = _png_unfilter(raw, h, w, ch)
    elif interlace == 1:                                # Adam7
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            npix = ph * (pw * ch + 1)
            sub = _png_unfilter(raw[off:off + npix], ph, pw, ch)
            img[y0::dy, x0::dx] = sub
            off += npix
    else:
        raise ValueError(f"bad PNG interlace {interlace}")
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        rgb = plte[np.minimum(img[:, :, 0], len(plte) - 1)]
    elif color == 0:
        rgb = np.repeat(img, 3, axis=2)
    elif color == 4:
        rgb = np.repeat(img[:, :, :1], 3, axis=2)
    elif color == 2:
        rgb = img
    else:                                               # RGBA
        rgb = img[:, :, :3]
    tensor = rgb.astype(np.float32).mean(axis=2) / 255.0
    return {"tensor": tensor, "rgb": np.ascontiguousarray(rgb),
            "n_frames": np.int32(1)}


def encode_png(rgb: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 -> non-interlaced RGB8 PNG, 'up' filter on every
    row after the first (vectorized both ways; real DEFLATE via zlib).
    Test/synth counterpart of decode_png."""
    import zlib

    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(h, w * 3).astype(np.int16)
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    raw[0, 0] = 0
    raw[0, 1:] = flat[0].astype(np.uint8)
    if h > 1:
        raw[1:, 0] = 2                                  # up filter
        raw[1:, 1:] = ((flat[1:] - flat[:-1]) & 0xFF).astype(np.uint8)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + ctype + body \
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
            + chunk(b"IEND", b""))


# --------------------------------------------------------------------------
# AU (Sun audio) and AIFF — the remaining common PCM audio containers
# --------------------------------------------------------------------------

def decode_au(payload: bytes) -> Dict[str, np.ndarray]:
    """Sun/NeXT .au/.snd: big-endian header (magic '.snd', data offset,
    size, encoding, rate, channels); encodings 1 (G.711 mu-law), 2 (int8),
    3 (int16 BE), 6 (float32 BE). Output contract = decode_wav."""
    if payload[:4] != b".snd":
        raise ValueError("not an AU payload")
    _m, off, size, enc, rate, nch = struct.unpack_from(">4sIIIII", payload)
    end = len(payload) if size == 0xFFFFFFFF else min(len(payload),
                                                      off + size)
    data = payload[off:end]
    if enc == 1:
        x = mulaw_decode(np.frombuffer(data, np.uint8)) \
            .astype(np.float32) / 32768.0
    elif enc == 2:
        x = np.frombuffer(data, np.int8).astype(np.float32) / 128.0
    elif enc == 3:
        x = np.frombuffer(data, ">i2").astype(np.float32) / 32768.0
    elif enc == 6:
        x = np.frombuffer(data, ">f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported AU encoding {enc}")
    if nch > 1:
        x = x[:len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return {"tensor": x.astype(np.float32), "sample_rate": np.int32(rate),
            "n_frames": np.int32(len(x))}


def encode_au(samples: np.ndarray, sample_rate: int = 8000,
              encoding: int = 3) -> bytes:
    """1-D float [-1, 1] -> .au (int16 BE by default, or mu-law)."""
    pcm16 = np.round(np.clip(np.asarray(samples, np.float64), -1, 1)
                     * 32767.0).astype(np.int16)
    if encoding == 3:
        data = pcm16.astype(">i2").tobytes()
    elif encoding == 1:
        data = mulaw_encode(pcm16).tobytes()
    else:
        raise ValueError("encode_au supports encodings 1 and 3")
    return struct.pack(">4sIIIII", b".snd", 24, len(data), encoding,
                       sample_rate, 1) + data


def _f80_to_int(b: bytes) -> int:
    """IEEE 754 80-bit extended float -> int (AIFF sample rates are small
    positive integers; that's all this needs to handle)."""
    exp = struct.unpack(">H", b[:2])[0] & 0x7FFF
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0
    return int(round(mant * 2.0 ** (exp - 16383 - 63)))


def _int_to_f80(n: int) -> bytes:
    if n == 0:
        return b"\x00" * 10
    e = n.bit_length() - 1
    mant = n << (63 - e)
    return struct.pack(">H", 16383 + e) + mant.to_bytes(8, "big")


def decode_aiff(payload: bytes) -> Dict[str, np.ndarray]:
    """AIFF (big-endian PCM in an IFF container): COMM (channels, frames,
    bits, 80-bit-float rate) + SSND (offset/blocksize prefix). 8/16/32-bit
    PCM. Output contract = decode_wav."""
    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload")
    end = min(len(payload), 8 + struct.unpack_from(">I", payload, 4)[0])
    comm = None
    data = None
    for cid, body, size in _riff_chunks_be(payload, 12, end):
        if cid == b"COMM":
            nch, nframes, bits = struct.unpack_from(">hIh", payload, body)
            rate = _f80_to_int(payload[body + 8:body + 18])
            comm = (nch, nframes, bits, rate)
        elif cid == b"SSND":
            off = struct.unpack_from(">I", payload, body)[0]
            data = payload[body + 8 + off:body + size]
    if comm is None or data is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    nch, nframes, bits, rate = comm
    if bits == 16:
        x = np.frombuffer(data, ">i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = np.frombuffer(data, np.int8).astype(np.float32) / 128.0
    elif bits == 32:
        x = np.frombuffer(data, ">i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported AIFF bit depth {bits}")
    if nch > 1:
        x = x[:len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    x = x[:nframes] if nframes else x
    return {"tensor": x.astype(np.float32), "sample_rate": np.int32(rate),
            "n_frames": np.int32(len(x))}


def _riff_chunks_be(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid, size = struct.unpack_from(">4sI", buf, pos)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def encode_aiff(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D float [-1, 1] -> 16-bit mono AIFF."""
    pcm = np.round(np.clip(np.asarray(samples, np.float64), -1, 1)
                   * 32767.0).astype(">i2").tobytes()
    comm = struct.pack(">hIh", 1, len(pcm) // 2, 16) \
        + _int_to_f80(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + pcm

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack(">I", len(body)) + body + pad

    inner = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(inner)) + inner


# --------------------------------------------------------------------------
# TIFF (baseline: uncompressed, PackBits, TIFF-LZW)
# --------------------------------------------------------------------------

def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:                                  # literal run
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                                # replicate run
            out += data[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Minimal valid PackBits (replicate runs >= 3, literals otherwise)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 8-bit symbols (clear=256,
    EOI=257), 'early change' width bump at table size 2^k - 1."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    data = data + b"\x00\x00\x00"     # MSB reads use a fixed 4-byte window
    prev = None
    while bitpos + width <= nbits:
        i = bitpos >> 3
        chunk = int.from_bytes(data[i:i + 4], "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:  # early change
            width += 1
        if len(out) >= expected:
            break
    return bytes(out[:expected])


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    cur = 0
    curbits = 0
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int) -> None:
        nonlocal cur, curbits
        cur = (cur << width) | code
        curbits += width
        while curbits >= 8:
            curbits -= 8
            out.append((cur >> curbits) & 0xFF)
        cur &= (1 << curbits) - 1

    emit(CLEAR)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4094:
            table[wk] = next_code
            next_code += 1
            # early change mirrored one add later than the decoder's
            # 2^k - 1 boundary (same offset reasoning as the GIF pair)
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w])
    emit(EOI)
    if curbits:
        out.append((cur << (8 - curbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> Dict[str, np.ndarray]:
    """Baseline TIFF decoder: little/big-endian, first IFD, 8-bit gray or
    RGB(A), strip layout, compression none (1) / TIFF-LZW (5) / PackBits
    (32773). Output contract = decode_png."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")

    def u16(off):
        return struct.unpack_from(e + "H", payload, off)[0]

    def u32(off):
        return struct.unpack_from(e + "I", payload, off)[0]

    ifd = u32(4)
    nent = u16(ifd)
    tags = {}
    for i in range(nent):
        base = ifd + 2 + 12 * i
        tag, typ, cnt = u16(base), u16(base + 2), u32(base + 4)
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        voff = base + 8 if size * cnt <= 4 else u32(base + 8)
        vals = [u16(voff + 2 * k) if typ == 3
                else (u32(voff + 4 * k) if typ == 4
                      else payload[voff + k]) for k in range(cnt)]
        tags[tag] = vals
    w = tags[256][0]
    h = tags[257][0]
    bps = tags.get(258, [8])
    if any(b != 8 for b in bps):
        raise ValueError(f"unsupported TIFF bit depth {bps}")
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [len(bps)])[0]
    rows_per_strip = tags.get(278, [h])[0]
    offs = tags[273]
    counts = tags.get(279, [len(payload) - offs[0]])
    chunks = []
    for s, (o, c) in enumerate(zip(offs, counts)):
        nrows = min(rows_per_strip, h - s * rows_per_strip)
        expected = nrows * w * spp
        raw = payload[o:o + c]
        if comp == 1:
            chunks.append(raw[:expected])
        elif comp == 5:
            chunks.append(_lzw_decode_tiff(raw, expected))
        elif comp == 32773:
            chunks.append(_packbits_decode(raw, expected))
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
    img = np.frombuffer(b"".join(chunks), np.uint8,
                        count=h * w * spp).reshape(h, w, spp)
    if spp == 1:
        rgb = np.repeat(img, 3, axis=2)
    elif spp == 2:                                    # gray + alpha
        rgb = np.repeat(img[:, :, :1], 3, axis=2)
    else:
        rgb = img[:, :, :3]
    tensor = rgb.astype(np.float32).mean(axis=2) / 255.0
    return {"tensor": tensor, "rgb": np.ascontiguousarray(rgb),
            "n_frames": np.int32(1)}


def encode_tiff(rgb: np.ndarray, compression: int = 5,
                rows_per_strip: int = 8) -> bytes:
    """(h, w, 3) uint8 -> little-endian striped TIFF (compression 1, 5 or
    32773). Test/synth counterpart of decode_tiff."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = rgb[y0:y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")
    nstrips = len(strips)
    # layout: header(8) | IFD | values | strip data
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append((tag, typ, cnt, val))

    nent = 10
    ifd_size = 2 + 12 * nent + 4
    voff = 8 + ifd_size
    extra = bytearray()

    def arr_val(vals, typ):
        nonlocal extra
        size = 2 if typ == 3 else 4
        if size * len(vals) <= 4:
            packed = 0
            for i, v in enumerate(vals):
                packed |= v << (8 * size * i)
            return packed
        off = voff + len(extra)
        for v in vals:
            extra += struct.pack("<H" if typ == 3 else "<I", v)
        return off

    bps_val = arr_val([8, 8, 8], 3)
    strip_lens = [len(s) for s in strips]
    data_start_marker = object()
    strip_offs_placeholder = [0] * nstrips
    # reserve space for offsets/counts arrays first
    offs_pos = arr_val(strip_offs_placeholder, 4) if nstrips > 1 else None
    cnts_pos = arr_val(strip_lens, 4) if nstrips > 1 else None
    data_start = voff + len(extra)
    cur = data_start
    strip_offs = []
    for s in strips:
        strip_offs.append(cur)
        cur += len(s)
    if nstrips > 1:
        for i, o in enumerate(strip_offs):
            struct.pack_into("<I", extra, offs_pos - voff + 4 * i, o)
    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entry(258, 3, 3, bps_val)
    entry(259, 3, 1, compression)
    entry(262, 3, 1, 2)                              # RGB photometric
    entry(273, 4, nstrips,
          strip_offs[0] if nstrips == 1 else offs_pos)
    entry(277, 3, 1, 3)
    entry(278, 4, 1, rows_per_strip)
    entry(279, 4, nstrips,
          strip_lens[0] if nstrips == 1 else cnts_pos)
    entry(284, 3, 1, 1)                              # chunky planar
    assert len(entries) == nent
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", nent)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)                      # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
