"""Multimodal (binary) column plumbing.

Images / audio / video are opaque ``binary`` columns with typed metadata
columns beside them. The Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested, and every kind has REAL
pure-numpy decoders for both uncompressed and compressed containers:
PPM/PGM/BMP + baseline JPEG (rayschema/jpeg.py) + GIF/LZW + PNG
(codecs.py) images; RIFF/WAVE PCM/float + G.711 mu-law/A-law + IMA ADPCM + FLAC
(rayschema/flac.py — Rice/fixed/LPC, the LibriSpeech container) audio;
YUV4MPEG2 + MJPEG-in-AVI video. The remaining entropy-coded formats
(MP3/AAC, H.264/HEVC) would need external codec libraries absent from this
container; for those, ``decode_fn=None`` raises ``NotImplementedError`` at
the decode site and a deterministic fake decoder is provided for plumbing
tests — the documented stub boundary.

Scale notes baked into the stage defaults: binary payloads are large, so
``suggest_batch_size`` keeps batch bytes under a budget (payload x concurrency
must fit worker heap; ray_guide "Memory-aware"), and stages run as actor
pools so any model/codec state loads once per worker.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("mime", pa.string()),
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("width", pa.int32()),            # -1 when unknown / n.a.
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def suggest_batch_size(avg_payload_bytes: int, budget_bytes: int = 256 << 20,
                       concurrency: int = 8) -> int:
    """Batch size so payload x pool concurrency stays inside the budget."""
    per_actor = max(1, budget_bytes // max(1, concurrency))
    return max(1, min(4096, per_actor // max(1, avg_payload_bytes)))


def _pnm_tokens(buf: bytes, n: int):
    """First ``n`` whitespace-separated ASCII tokens of a PNM header
    (skipping ``#`` comments); returns (tokens, offset past the single
    whitespace byte that terminates the header)."""
    toks, i, L = [], 2, len(buf)          # skip the 2-byte magic
    while len(toks) < n:
        while i < L and buf[i:i + 1].isspace():
            i += 1
        if i < L and buf[i] == 0x23:      # '#' comment to end of line
            while i < L and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < L and not buf[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(int(buf[i:j]))
        i = j
    return toks, i + 1                    # single whitespace ends the header


def decode_ppm(payload: bytes) -> Dict[str, np.ndarray]:
    """Pure-numpy binary PPM (P6, RGB) / PGM (P5, gray) decoder — a REAL
    image codec with no external library. Returns the pipeline contract:
    ``tensor`` (h, w) float32 luminance in [0, 1] (channel mean for RGB),
    plus ``rgb`` (h, w, 3) uint8 for P6. maxval up to 255 supported."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {magic!r}")
    (w, h, maxval), off = _pnm_tokens(payload, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if ch == 3:
        rgb = data.reshape(h, w, 3)
        tensor = (rgb.astype(np.float32).mean(axis=2) / maxval)
        return {"tensor": tensor, "rgb": rgb, "n_frames": np.int32(1)}
    gray = data.reshape(h, w)
    return {"tensor": gray.astype(np.float32) / maxval,
            "n_frames": np.int32(1)}


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes (test/synth counterpart of
    decode_ppm)."""
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(rgb, dtype=np.uint8).tobytes()


def decode_bmp(payload: bytes) -> Dict[str, np.ndarray]:
    """Pure-numpy uncompressed 24-bit BMP decoder (BITMAPINFOHEADER,
    bottom-up or top-down rows, 4-byte row padding). Same output contract as
    decode_ppm."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if h_raw > 0:
        bgr = bgr[::-1]                   # bottom-up storage
    rgb = bgr[:, :, ::-1]
    tensor = rgb.astype(np.float32).mean(axis=2) / 255.0
    return {"tensor": tensor, "rgb": rgb, "n_frames": np.int32(1)}


def decode_image(payload: bytes, kind: str = "image") -> Dict[str, np.ndarray]:
    """Magic-sniffing image decode: PPM/PGM, BMP, baseline JPEG
    (rayschema/jpeg.py), GIF or PNG (rayschema/codecs.py) — the engine's
    REAL image path (no codec library needed)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from rayschema.jpeg import decode_jpeg
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from rayschema.codecs import decode_gif
        return decode_gif(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from rayschema.codecs import decode_png
        return decode_png(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from rayschema.codecs import decode_tiff
        return decode_tiff(payload)
    raise ValueError(f"unrecognized image payload magic {payload[:2]!r}")


def decode_wav(payload: bytes) -> Dict[str, np.ndarray]:
    """Pure-numpy RIFF/WAVE decoder: PCM (format 1; 8/16/32-bit) and IEEE
    float (format 3; 32/64-bit), any channel count. Walks the chunk list
    (fmt / data may be preceded by LIST etc.), normalizes to float32 in
    [-1, 1], and downmixes channels by mean. Returns ``tensor`` (1-D mono
    samples), ``sample_rate`` and ``n_frames`` (= sample frames)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt = None
    data = None
    fact_frames = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            fact_frames = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)      # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, sample_rate, _, block_align, bits = fmt
    if audio_format == 0xFFFE:            # WAVE_FORMAT_EXTENSIBLE: subformat
        audio_format = 1                  # tag lives in the extension; PCM assumed
    if audio_format in (6, 7):            # G.711 A-law / mu-law (codecs.py)
        from rayschema.codecs import alaw_decode, mulaw_decode
        codes = np.frombuffer(data, dtype=np.uint8)
        dec = mulaw_decode if audio_format == 7 else alaw_decode
        x = dec(codes).astype(np.float32) / 32768.0
    elif audio_format == 0x11:            # IMA ADPCM (codecs.py)
        from rayschema.codecs import ima_adpcm_decode_block
        ba = block_align if block_align else 256
        blocks = [ima_adpcm_decode_block(data[i:i + ba], n_ch)
                  for i in range(0, len(data) - (4 * n_ch - 1), ba)]
        pcm = np.concatenate(blocks, axis=0)
        if fact_frames is not None:       # drop final-block padding samples
            pcm = pcm[:fact_frames]
        x = pcm.astype(np.float32).mean(axis=1) / 32768.0
        return {"tensor": x.astype(np.float32),
                "sample_rate": np.int32(sample_rate),
                "n_frames": np.int32(len(x))}
    elif audio_format == 1:
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:                   # 8-bit WAV is unsigned
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dt).astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format tag {audio_format}")
    if n_ch > 1:
        x = x[:len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return {"tensor": x.astype(np.float32), "sample_rate": np.int32(sample_rate),
            "n_frames": np.int32(len(x))}


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D float [-1, 1] -> 16-bit PCM mono WAV bytes (test/synth counterpart
    of decode_wav)."""
    import struct

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE",
                      b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
                      b"data", len(pcm))
    return hdr + pcm


def decode_y4m(payload: bytes) -> Dict[str, np.ndarray]:
    """Pure-numpy YUV4MPEG2 decoder (C420/C420jpeg/C420mpeg2 planar and
    C444/mono). Parses the stream header (W/H/C tags), then each FRAME's
    luma plane; chroma planes are skipped (features are luminance-based).
    Returns ``tensor`` (n_frames, h, w) float32 luma in [0, 1], ``n_frames``,
    and ``fps_num``/``fps_den`` when the F tag is present."""
    nl = payload.find(b"\x0a")
    if nl < 0 or not payload[:9] == b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    fps_num, fps_den = 0, 1
    colorspace = b"420"
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C":
            colorspace = val
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith(b"420"):
        chroma = 2 * ((w // 2) * (h // 2))
    elif colorspace.startswith(b"444"):
        chroma = 2 * w * h
    elif colorspace.startswith(b"mono"):
        chroma = 0
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")
    luma = w * h
    frames = []
    pos = nl + 1
    L = len(payload)
    while pos < L:
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: FRAME marker expected")
        fe = payload.find(b"\x0a", pos)
        if fe < 0 or fe + 1 + luma + chroma > L:
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(payload, dtype=np.uint8, count=luma,
                                    offset=fe + 1).reshape(h, w))
        pos = fe + 1 + luma + chroma
    if not frames:
        raise ValueError("Y4M stream has no frames")
    tensor = np.stack(frames).astype(np.float32) / 255.0
    return {"tensor": tensor, "n_frames": np.int32(len(frames)),
            "fps_num": np.int32(fps_num), "fps_den": np.int32(fps_den)}


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w) uint8 luma -> C420 Y4M bytes with mid-gray chroma planes
    (test/synth counterpart of decode_y4m)."""
    n, h, w = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\x0a" % (w, h, fps)]
    chroma = np.full(((h // 2) * (w // 2)), 128, dtype=np.uint8).tobytes()
    for i in range(n):
        out.append(b"FRAME\x0a")
        out.append(np.ascontiguousarray(frames[i], dtype=np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def default_decode(payload: bytes, kind: str) -> Dict[str, np.ndarray]:
    """The engine's default codec table — every kind now has REAL
    pure-numpy decoders: images PPM/PGM/BMP/baseline-JPEG/GIF(LZW), audio
    RIFF/WAVE PCM + float + G.711 mu-law/A-law + IMA ADPCM, video YUV4MPEG2
    + MJPEG-in-AVI, plus MPEG-1 Layer II (mp2.py). Payloads whose magic
    none of the real codecs recognize fall back to the deterministic fake
    (the documented boundary for the formats that genuinely need external
    codec libraries — MP3 Layer III/AAC, H.264/HEVC).  For those boundary
    formats the engine still does real METADATA probing — duration,
    bitrate, resolution, keyframe counts via full header walks — in
    rayschema/mediaprobe.py (MediaProbeStage); only entropy decode of the
    payload itself is stubbed."""
    if kind == "image" and (payload[:2] in (b"P6", b"P5", b"BM")
                            or payload[:2] == b"\xff\xd8"
                            or payload[:6] in (b"GIF87a", b"GIF89a")
                            or payload[:8] == b"\x89PNG\r\n\x1a\n"
                            or payload[:4] in (b"II*\x00", b"MM\x00*")):
        return decode_image(payload, kind)
    if kind == "audio" and payload[:4] == b"RIFF":
        return decode_wav(payload)
    if kind == "audio" and payload[:4] == b"fLaC":
        from rayschema.flac import decode_flac
        return decode_flac(payload)
    if kind == "audio" and len(payload) >= 2 and payload[0] == 0xFF \
            and (payload[1] & 0xFE) == 0xFC:
        from rayschema.mp2 import decode_mp2
        return decode_mp2(payload)
    if kind == "audio" and len(payload) >= 2 and payload[0] == 0xFF \
            and (payload[1] & 0xFE) == 0xFE:
        from rayschema.mp2 import decode_mp1
        return decode_mp1(payload)
    if kind == "audio" and payload[:4] == b".snd":
        from rayschema.codecs import decode_au
        return decode_au(payload)
    if kind == "audio" and payload[:4] == b"FORM" \
            and payload[8:12] == b"AIFF":
        from rayschema.codecs import decode_aiff
        return decode_aiff(payload)
    if kind == "video" and payload[:9] == b"YUV4MPEG2":
        return decode_y4m(payload)
    if kind == "video" and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from rayschema.codecs import decode_avi_mjpeg
        return decode_avi_mjpeg(payload)
    return fake_decode(payload, kind)


def fake_decode(payload: bytes, kind: str) -> Dict[str, np.ndarray]:
    """Deterministic fake decoder: derives a tiny 'pixel'/'sample' tensor from
    the payload digest — stands in for PIL/libav so plumbing is testable."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
    if kind == "image":
        return {"tensor": arr.reshape(4, 8), "n_frames": np.int32(1)}
    return {"tensor": arr, "n_frames": np.int32(len(payload) % 7 + 1)}


class MediaFeatureStage:
    """Actor-pool stage: decode -> feature-extract binary media batches.

    ``decode_fn(payload: bytes, kind: str) -> {'tensor': np.ndarray, ...}``
    is the pluggable codec; None = stub (raises NotImplementedError, making
    the missing-codec dependency explicit). Emits per-row feature columns:
    payload_sha256, payload_bytes, feat_mean, feat_std, feat_dim.
    """

    def __init__(self, decode_fn: Optional[Callable] = None,
                 payload_col: str = "payload", kind_col: str = "kind"):
        self.decode = decode_fn
        self.payload_col = payload_col
        self.kind_col = kind_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode is None:
            raise NotImplementedError(
                "media decode kernel not available in this environment: "
                "pass decode_fn (e.g. PIL/libav-backed) or use "
                "rayschema.multimodal.fake_decode for plumbing tests")
        pcol = batch.column(self.payload_col)
        if isinstance(pcol, pa.ChunkedArray):
            pcol = pcol.combine_chunks()
        import pyarrow.compute as _pc

        # byte lengths vectorized up front (Arrow kernel); only the decode —
        # inherently one codec call per payload — loops
        nbytes = _pc.fill_null(_pc.binary_length(pcol), 0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        payloads = pcol.to_pylist()
        kinds = batch.column(self.kind_col).to_pylist()
        n = len(payloads)
        sha = np.empty(n, dtype=object)
        mean = np.zeros(n, dtype=np.float64)
        std = np.zeros(n, dtype=np.float64)
        dim = np.zeros(n, dtype=np.int32)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if p is None:
                sha[i] = None
                continue
            sha[i] = hashlib.sha256(p).hexdigest()
            feat = self.decode(p, k)
            t = feat["tensor"]
            mean[i] = float(t.mean())
            std[i] = float(t.std())
            dim[i] = t.size
        return (batch
                .drop_columns([self.payload_col])   # features out, payload stays in stage 1
                .append_column("payload_sha256", pa.array(sha, type=pa.string()))
                .append_column("payload_bytes", pa.array(nbytes))
                .append_column("feat_mean", pa.array(mean))
                .append_column("feat_std", pa.array(std))
                .append_column("feat_dim", pa.array(dim)))


def resize_nearest(t: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize of a 2-D tensor (codec-agnostic —
    operates on whatever the decode stage produced)."""
    h, w = t.shape
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return t[yi][:, xi]


class ImageResizeStage:
    """Actor-pool stage: decode -> nearest-neighbor resize -> flat pixel
    column. Emits ``pixels`` (fixed-size list<float> of out_h*out_w) plus
    ``out_h``/``out_w`` — the layout a downstream embedding model consumes.
    Non-image rows pass through with null pixels."""

    def __init__(self, decode_fn: Optional[Callable] = None,
                 out_h: int = 4, out_w: int = 4,
                 payload_col: str = "payload", kind_col: str = "kind"):
        self.decode = decode_fn
        self.out_h = out_h
        self.out_w = out_w
        self.payload_col = payload_col
        self.kind_col = kind_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode is None:
            raise NotImplementedError(
                "image decode kernel not available: pass decode_fn")
        payloads = batch.column(self.payload_col).to_pylist()
        kinds = batch.column(self.kind_col).to_pylist()
        pix = []
        for p, k in zip(payloads, kinds):
            if p is None or k != "image":
                pix.append(None)
                continue
            t = self.decode(p, k)["tensor"]
            if t.ndim == 1:
                t = t.reshape(1, -1)
            pix.append(resize_nearest(t, self.out_h, self.out_w)
                       .astype(np.float32).ravel())
        return (batch.drop_columns([self.payload_col])
                .append_column("pixels", pa.array(
                    [None if x is None else x.tolist() for x in pix],
                    type=pa.list_(pa.float32(), self.out_h * self.out_w)))
                .append_column("out_h", pa.array(
                    np.full(len(pix), self.out_h, dtype=np.int32)))
                .append_column("out_w", pa.array(
                    np.full(len(pix), self.out_w, dtype=np.int32))))


class AudioFrameStage:
    """Actor-pool stage: decode -> fixed-hop framing -> per-frame RMS energy
    (list<float>) + frame count. Non-audio rows pass through with nulls."""

    def __init__(self, decode_fn: Optional[Callable] = None,
                 frame_len: int = 8, hop: int = 4,
                 payload_col: str = "payload", kind_col: str = "kind"):
        self.decode = decode_fn
        self.frame_len = frame_len
        self.hop = hop
        self.payload_col = payload_col
        self.kind_col = kind_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode is None:
            raise NotImplementedError(
                "audio decode kernel not available: pass decode_fn")
        payloads = batch.column(self.payload_col).to_pylist()
        kinds = batch.column(self.kind_col).to_pylist()
        energies, counts = [], np.zeros(len(payloads), dtype=np.int32)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if p is None or k != "audio":
                energies.append(None)
                continue
            x = self.decode(p, k)["tensor"].ravel().astype(np.float64)
            if len(x) < self.frame_len:
                x = np.pad(x, (0, self.frame_len - len(x)))
            frames = np.lib.stride_tricks.sliding_window_view(
                x, self.frame_len)[::self.hop]
            rms = np.sqrt((frames ** 2).mean(axis=1))
            energies.append(rms.astype(np.float32).tolist())
            counts[i] = len(rms)
        return (batch.drop_columns([self.payload_col])
                .append_column("frame_rms", pa.array(
                    energies, type=pa.list_(pa.float32())))
                .append_column("n_audio_frames", pa.array(counts)))


class VideoFrameSampleStage:
    """Actor-pool stage: decode -> every-``stride``-th frame sample ->
    per-sampled-frame mean feature. The decoded tensor is treated as
    ``n_frames`` equal chunks (the fake codec's contract; a real libav
    decoder yields frames directly). Non-video rows pass through."""

    def __init__(self, decode_fn: Optional[Callable] = None, stride: int = 2,
                 payload_col: str = "payload", kind_col: str = "kind"):
        self.decode = decode_fn
        self.stride = stride
        self.payload_col = payload_col
        self.kind_col = kind_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode is None:
            raise NotImplementedError(
                "video decode kernel not available: pass decode_fn")
        payloads = batch.column(self.payload_col).to_pylist()
        kinds = batch.column(self.kind_col).to_pylist()
        feats, idxs = [], []
        for p, k in zip(payloads, kinds):
            if p is None or k != "video":
                feats.append(None)
                idxs.append(None)
                continue
            d = self.decode(p, k)
            t = d["tensor"].ravel()
            nf = max(1, int(d.get("n_frames", 1)))
            chunks = np.array_split(t, nf)
            sel = np.arange(0, nf, self.stride)
            feats.append([float(chunks[j].mean()) for j in sel])
            idxs.append(sel.astype(np.int32).tolist())
        return (batch.drop_columns([self.payload_col])
                .append_column("frame_idx", pa.array(idxs, type=pa.list_(pa.int32())))
                .append_column("frame_mean", pa.array(feats, type=pa.list_(pa.float64()))))


def media_feature_pipeline(ds, decode_fn: Optional[Callable] = None,
                           batch_size: Optional[int] = None,
                           concurrency=(1, 4)):
    """Kind-routed media pipeline: images -> resize, audio -> framing,
    video -> frame sampling, each an actor-pool stage over small batches
    (binary payloads are large), results unioned. Returns a Dataset whose
    rows carry the per-kind feature columns."""
    bs = batch_size or suggest_batch_size(4096, concurrency=concurrency[1])
    common = dict(batch_format="pyarrow", batch_size=bs, concurrency=concurrency)
    img = (ds.filter(expr="kind == 'image'")
           .map_batches(ImageResizeStage,
                        fn_constructor_kwargs=dict(decode_fn=decode_fn), **common)
           .select_columns(["media_id", "kind", "pixels"]))
    aud = (ds.filter(expr="kind == 'audio'")
           .map_batches(AudioFrameStage,
                        fn_constructor_kwargs=dict(decode_fn=decode_fn), **common)
           .select_columns(["media_id", "kind", "n_audio_frames"]))
    vid = (ds.filter(expr="kind == 'video'")
           .map_batches(VideoFrameSampleStage,
                        fn_constructor_kwargs=dict(decode_fn=decode_fn), **common)
           .select_columns(["media_id", "kind", "frame_idx"]))

    def label(name):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "media_id": b.column("media_id"),
                "kind": b.column("kind"),
                "n_features": pa.array(
                    [0 if v is None else (len(v) if hasattr(v, "__len__") else int(v))
                     for v in b.column(b.schema.names[2]).to_pylist()],
                    type=pa.int32()),
            })
        return f

    return (img.map_batches(label("pixels"), batch_format="pyarrow")
            .union(aud.map_batches(label("n_audio_frames"), batch_format="pyarrow"))
            .union(vid.map_batches(label("frame_idx"), batch_format="pyarrow")))


def write_media_features(ds, out_dir: str):
    """Partitioned, idempotent feature sink: one directory per media kind
    (failed runs skip finished partitions by re-running per kind)."""
    ds.write_parquet(out_dir, partition_cols=["kind"], mode="overwrite")
    return out_dir


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table matching MEDIA_SCHEMA (tests/bench).
    Every row carries a REAL payload decoded end-to-end by the pure-numpy
    codecs: images rotate binary PPM, baseline JPEG (4:2:0, the dominant
    real-corpus format — rayschema/jpeg.py), GIF, PNG and TIFF-LZW
    (codecs.py);
    audio rotates 16-bit PCM WAV, G.711 mu-law, IMA ADPCM, FLAC, AU and
    AIFF; video
    alternates C420 Y4M and MJPEG-in-AVI — the fake codec is not on any
    synth path."""
    from rayschema.codecs import encode_avi_mjpeg, encode_gif, \
        encode_wav_compressed
    from rayschema.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[rng.integers(0, 3, n)]
    payloads, mimes, durations, widths, heights = [], [], [], [], []
    for k in kinds:
        if k == "image":
            variant = int(rng.integers(0, 6))
            if variant == 5:
                # progressive (SOF2) JPEG — the dominant real-web JPEG
                # flavor; multi-scan Annex-G decode (rayschema/jpeg.py)
                from rayschema.jpeg import encode_jpeg_progressive
                yy, xx = np.mgrid[0:16, 0:16]
                ph = rng.uniform(0, 6.28, 2)
                img = np.stack([
                    xx * 255 // 15, yy * 255 // 15,
                    127 + 100 * np.sin(xx / 3.0 + ph[0])
                    * np.cos(yy / 2.0 + ph[1])], axis=2) \
                    .clip(0, 255).astype(np.uint8)
                payloads.append(encode_jpeg_progressive(
                    img, quality=85, subsample=True))
                mimes.append("image/jpeg;progressive")
                widths.append(16)
                heights.append(16)
                durations.append(-1)
                continue
            if variant == 4:
                from rayschema.codecs import encode_tiff
                payloads.append(encode_tiff(
                    rng.integers(0, 256, (9, 11, 3), dtype=np.uint8),
                    compression=5, rows_per_strip=4))
                mimes.append("image/tiff")
                widths.append(11)
                heights.append(9)
                durations.append(-1)
                continue
            if variant == 3:
                from rayschema.codecs import encode_png
                payloads.append(encode_png(
                    rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)))
                mimes.append("image/png")
                widths.append(10)
                heights.append(12)
                durations.append(-1)
                continue
            if variant == 0:
                yy, xx = np.mgrid[0:16, 0:16]
                ph = rng.uniform(0, 6.28, 2)
                img = np.stack([
                    xx * 255 // 15, yy * 255 // 15,
                    127 + 100 * np.sin(xx / 3.0 + ph[0])
                    * np.cos(yy / 2.0 + ph[1])], axis=2) \
                    .clip(0, 255).astype(np.uint8)
                payloads.append(encode_jpeg(img, quality=85,
                                            subsample=True))
                mimes.append("image/jpeg")
                widths.append(16)
                heights.append(16)
            elif variant == 1:
                payloads.append(encode_ppm(
                    rng.integers(0, 256, (4, 8, 3), dtype=np.uint8)))
                mimes.append("image/x-portable-pixmap")
                widths.append(8)
                heights.append(4)
            else:
                pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
                payloads.append(encode_gif(
                    pal[rng.integers(0, 7, (6, 9))]))
                mimes.append("image/gif")
                widths.append(9)
                heights.append(6)
            durations.append(-1)
        elif k == "audio":
            n_samp = int(rng.integers(64, 512))
            wave = rng.uniform(-1.0, 1.0, n_samp)
            variant = int(rng.integers(0, 7))
            if variant == 4:
                from rayschema.codecs import encode_au
                payloads.append(encode_au(wave, 8000, encoding=1))
                mimes.append("audio/basic;au")
                widths.append(-1)
                heights.append(-1)
                durations.append(n_samp * 1000 // 8000)
                continue
            if variant == 5:
                from rayschema.codecs import encode_aiff
                payloads.append(encode_aiff(wave, 8000))
                mimes.append("audio/aiff")
                widths.append(-1)
                heights.append(-1)
                durations.append(n_samp * 1000 // 8000)
                continue
            if variant == 3:
                from rayschema.flac import encode_flac
                pcm16 = np.round(np.clip(wave, -1, 1)
                                 * 32767.0).astype(np.int16)
                payloads.append(encode_flac(pcm16, sample_rate=8000,
                                            blocksize=128))
                mimes.append("audio/flac")
                widths.append(-1)
                heights.append(-1)
                durations.append(n_samp * 1000 // 8000)
                continue
            if variant == 6:
                # MPEG-1 Layer II (rayschema/mp2.py): real subband
                # codec — frame sync/alloc tables/scale factors exact
                # ISO bitstream, PR window pair (see _mp2_window.py)
                from rayschema.mp2 import encode_mp2
                n48 = 1152          # one Layer II frame at 48 kHz
                w48 = np.interp(np.linspace(0, 1, n48),
                                np.linspace(0, 1, n_samp), wave)
                payloads.append(encode_mp2(w48 * 0.8, sample_rate=48000,
                                           kbps=192))
                mimes.append("audio/mpeg;layer=2")
                widths.append(-1)
                heights.append(-1)
                durations.append(n48 * 1000 // 48000)
                continue
            if variant == 0:
                payloads.append(encode_wav(wave, sample_rate=8000))
                mimes.append("audio/wav")
            elif variant == 1:
                payloads.append(encode_wav_compressed(
                    wave, sample_rate=8000, codec="mulaw"))
                mimes.append("audio/basic")
            else:
                payloads.append(encode_wav_compressed(
                    wave, sample_rate=8000, codec="ima_adpcm",
                    block_align=64))
                mimes.append("audio/vnd.wave;codec=11")
            widths.append(-1)
            heights.append(-1)
            durations.append(n_samp * 1000 // 8000)
        else:
            nf = int(rng.integers(2, 9))
            if rng.integers(0, 2):
                payloads.append(encode_y4m(
                    rng.integers(0, 256, (nf, 4, 8), dtype=np.uint8),
                    fps=25))
                mimes.append("video/x-yuv4mpeg")
            else:
                payloads.append(encode_avi_mjpeg(
                    rng.integers(0, 256, (nf, 16, 16, 3), dtype=np.uint8),
                    fps=25))
                mimes.append("video/x-msvideo")
            widths.append(-1)
            heights.append(-1)
            durations.append(nf * 1000 // 25)
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds, type=pa.string()),
        "mime": pa.array(mimes, type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "width": pa.array(np.asarray(widths, dtype=np.int32)),
        "height": pa.array(np.asarray(heights, dtype=np.int32)),
        "duration_ms": pa.array(durations, type=pa.int32()),
    })
