"""Container/bitstream metadata probing for the entropy-coded codec boundary.

The engine decodes PPM/BMP/GIF/PNG/TIFF/JPEG images, PCM/G.711/ADPCM/FLAC/
MPEG-1 Layer I+II audio and Y4M/MJPEG video with real pure-numpy codecs
(multimodal.py, codecs.py, jpeg.py, flac.py, mp2.py).  The formats that
genuinely need external entropy decoders — MP3 (MPEG Layer III), AAC and
H.264/HEVC — stay behind the documented ``NotImplementedError`` stub for
*decode*.  This module closes the half of that boundary a 100-TB curation
pipeline actually needs first: **metadata probing**.  Filtering by duration,
resolution, bitrate or keyframe density, sizing decode batches, and sampling
frame offsets all require walking container headers — not decoding payloads —
and every header walked here is fixed-layout public bitstream syntax:

- MPEG audio (MP3/MP2/MP1, MPEG-1/2/2.5): 4-byte frame headers chained by
  computed frame sizes; Xing/Info VBR tag detection in the first frame.
- AAC ADTS: 7/9-byte frame headers chained by the 13-bit frame_length field.
- H.264 Annex-B: start-code split, NAL headers, RBSP un-escaping and a full
  SPS parse (Exp-Golomb) for width/height/profile/level — enough to count
  keyframes and access units without touching slice data.
- H.265/HEVC Annex-B: 2-byte NAL headers, IRAP keyframes, SPS resolution
  (single-layer fixed-PTL form).
- MP4/ISO-BMFF: box walk for ftyp brand, mvhd duration, tkhd dimensions,
  stsd codec fourcc, stsz sample count.
- Matroska/WebM: EBML walk for DocType, TimestampScale x Duration,
  per-track CodecID, video dimensions, audio rate/channels.
- Ogg (Opus/Vorbis): page walk chained by segment tables, codec id from
  the BOS packet, duration from the final granule position.

Probing is exact and total (bad sync / truncated tails are reported, not
guessed), verified by writer<->parser round-trips in tests/test_mediaprobe.py.
Decode of these formats remains stubbed; see multimodal.py:301 for the real
codec table.  Reference scope note: swaggest/jsonschema-go has no media
surface at all — this is §2.F engine territory (SURVEY.md).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

__all__ = [
    "probe_mpeg_audio", "probe_adts", "probe_h264_annexb",
    "probe_hevc_annexb", "probe_mp4", "probe_matroska", "probe_ogg",
    "probe_media", "synth_matroska", "synth_ogg",
    "synth_mpeg_audio_stream", "synth_adts_stream", "synth_h264_stream",
    "synth_hevc_stream", "synth_mp4", "MediaProbeStage",
    "media_probe_pipeline", "write_media_probes",
]


# ---------------------------------------------------------------------------
# strict MSB-first bit reader + Exp-Golomb (H.264 RBSP syntax)

class _Bits:
    """MSB-first reader that RAISES on overrun (header parsing must not
    silently zero-extend the way the audio-payload readers do)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("bitstream truncated")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Unsigned Exp-Golomb: countLeadingZeros zeros, 1, then that many
        info bits; value = 2^zeros - 1 + info."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("invalid Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, value: int, length: int) -> "_BitsW":
        for b in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc, self.n = 0, 0
        return self

    def ue(self, v: int) -> "_BitsW":
        code = v + 1
        nbits = code.bit_length()
        return self.u(0, nbits - 1).u(code, nbits)

    def se(self, v: int) -> "_BitsW":
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> "_BitsW":
        self.u(1, 1)
        while self.n:
            self.u(0, 1)
        return self

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc << (8 - self.n))
            self.acc, self.n = 0, 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# MPEG audio (MP3 / MP2 / MP1) frame walk

# bitrate kbps by [table][bitrate_index 1..14]; table selected by
# (version, layer) per ISO 11172-3 / 13818-3
_BR_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_BR_V1_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
_BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BR_V2_L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256]
_BR_V2_L23 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

_SR_V1 = [44100, 48000, 32000]
_SR_V2 = [22050, 24000, 16000]
_SR_V25 = [11025, 12000, 8000]


def _mpeg_header(b0: int, b1: int, b2: int, b3: int) -> Optional[dict]:
    """Parse one 4-byte MPEG audio frame header; None if not a valid sync."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_id = (b1 >> 3) & 0x3        # 0=2.5, 1=reserved, 2=2, 3=1
    layer_id = (b1 >> 1) & 0x3          # 0=reserved, 1=III, 2=II, 3=I
    if version_id == 1 or layer_id == 0:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None                     # free-format/bad not walked
    layer = {1: 3, 2: 2, 3: 1}[layer_id]
    version = {0: 2.5, 2: 2.0, 3: 1.0}[version_id]
    if version == 1.0:
        sr = _SR_V1[sr_idx]
        kbps = (_BR_V1_L1, _BR_V1_L2, _BR_V1_L3)[layer - 1][br_idx]
    else:
        sr = (_SR_V2 if version == 2.0 else _SR_V25)[sr_idx]
        kbps = (_BR_V2_L1, _BR_V2_L23, _BR_V2_L23)[layer - 1][br_idx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 0x3              # 3 = mono
    channels = 1 if mode == 3 else 2
    if layer == 1:
        frame_bytes = (12 * kbps * 1000 // sr + padding) * 4
        samples = 384
    else:
        if layer == 3 and version != 1.0:
            frame_bytes = 72 * kbps * 1000 // sr + padding
            samples = 576
        else:
            frame_bytes = 144 * kbps * 1000 // sr + padding
            samples = 1152
    return {"version": version, "layer": layer, "kbps": kbps,
            "sample_rate": sr, "channels": channels, "padding": padding,
            "frame_bytes": frame_bytes, "samples": samples, "mode": mode}


def _xing_offset(version: float, channels: int) -> int:
    """Xing/Info tag sits after the Layer-III side info: MPEG-1 17/32 bytes
    (mono/stereo), MPEG-2/2.5 9/17 — plus the 4-byte header."""
    if version == 1.0:
        return 4 + (17 if channels == 1 else 32)
    return 4 + (9 if channels == 1 else 17)


def probe_mpeg_audio(payload: bytes, max_frames: int = 1 << 20) -> dict:
    """Walk MPEG audio frames (any layer/version). Returns frame count,
    duration, average bitrate, CBR/VBR flag, Xing tag info, and the byte
    offset/size of every frame head (frame_offsets capped at 4096 entries —
    enough to seek-sample; the walk itself is full).  Trailing garbage or a
    truncated final frame is reported via ``clean_eof``/``trailing_bytes``,
    never guessed at."""
    n = len(payload)
    pos = 0
    # tolerate a leading ID3v2 tag: 'ID3' + ver(2) + flags + syncsafe size
    if payload[:3] == b"ID3" and n >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    frames = 0
    total_samples = 0
    kbps_sum = 0
    kbps_set = set()
    first = None
    offsets: List[int] = []
    xing = None
    while pos + 4 <= n and frames < max_frames:
        h = _mpeg_header(payload[pos], payload[pos + 1],
                         payload[pos + 2], payload[pos + 3])
        if h is None:
            break
        if pos + h["frame_bytes"] > n:
            # truncated final frame: stop, report dirty EOF
            break
        if first is None:
            first = h
            if h["layer"] == 3:
                xo = pos + _xing_offset(h["version"], h["channels"])
                tag = payload[xo:xo + 4]
                if tag in (b"Xing", b"Info"):
                    flags = int.from_bytes(payload[xo + 4:xo + 8], "big")
                    xp = xo + 8
                    xing = {"tag": tag.decode(), "frames": None, "bytes": None}
                    if flags & 1:
                        xing["frames"] = int.from_bytes(
                            payload[xp:xp + 4], "big")
                        xp += 4
                    if flags & 2:
                        xing["bytes"] = int.from_bytes(
                            payload[xp:xp + 4], "big")
        if len(offsets) < 4096:
            offsets.append(pos)
        frames += 1
        total_samples += h["samples"]
        kbps_sum += h["kbps"]
        kbps_set.add(h["kbps"])
        pos += h["frame_bytes"]
    if first is None:
        raise ValueError("no MPEG audio sync found")
    dur = total_samples / first["sample_rate"]
    return {
        "container": "mpeg-audio",
        "codec": {1: "mp1", 2: "mp2", 3: "mp3"}[first["layer"]],
        "mpeg_version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": frames,
        "duration_s": dur,
        "avg_kbps": kbps_sum / frames,
        "vbr": len(kbps_set) > 1,
        "xing": xing,
        "frame_offsets": offsets,
        "clean_eof": pos == n,
        "trailing_bytes": n - pos,
    }


def synth_mpeg_audio_stream(n_frames: int, layer: int = 3,
                            sample_rate: int = 44100, kbps=128,
                            channels: int = 2, xing: bool = False,
                            seed: int = 7) -> bytes:
    """Header-valid MPEG-1 audio stream with pseudorandom payload bytes (the
    probe never reads payload).  ``kbps`` may be a list cycled per frame for
    a VBR stream; ``xing=True`` plants a Xing tag in frame 0 (Layer III)."""
    sr_idx = _SR_V1.index(sample_rate)
    br_table = (_BR_V1_L1, _BR_V1_L2, _BR_V1_L3)[layer - 1]
    layer_id = {1: 3, 2: 2, 3: 1}[layer]
    rng = np.random.default_rng(seed)
    kbps_seq = kbps if isinstance(kbps, (list, tuple)) else [kbps]
    out = bytearray()
    for i in range(n_frames):
        k = kbps_seq[i % len(kbps_seq)]
        br_idx = br_table.index(k)
        pad = 0
        b1 = 0xE0 | (3 << 3) | (layer_id << 1) | 1    # MPEG-1, no CRC
        b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
        b3 = ((3 if channels == 1 else 0) << 6)
        if layer == 1:
            size = (12 * k * 1000 // sample_rate + pad) * 4
        else:
            size = 144 * k * 1000 // sample_rate + pad
        body = bytearray(rng.integers(0, 256, size - 4, dtype=np.uint8)
                         .tobytes())
        # keep payload free of byte pairs that could fake a sync word
        for j in range(len(body) - 1):
            if body[j] == 0xFF:
                body[j] = 0xFE
        if i == 0 and xing and layer == 3:
            off = _xing_offset(1.0, channels) - 4
            body[off:off + 4] = b"Xing"
            body[off + 4:off + 8] = (3).to_bytes(4, "big")      # frames+bytes
            body[off + 8:off + 12] = n_frames.to_bytes(4, "big")
            body[off + 12:off + 16] = (0).to_bytes(4, "big")    # patched below
        out += bytes([0xFF, b1, b2, b3]) + body
    if xing and layer == 3:
        off = _xing_offset(1.0, channels) + 8 + 4
        out[off:off + 4] = len(out).to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# AAC ADTS frame walk

_ADTS_SR = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
            16000, 12000, 11025, 8000, 7350]


def probe_adts(payload: bytes, max_frames: int = 1 << 20) -> dict:
    """Walk AAC ADTS frames: 0xFFF sync, fixed+variable headers, chained by
    the 13-bit aac_frame_length.  1024 output samples per raw data block."""
    n = len(payload)
    pos = 0
    frames = 0
    raw_blocks = 0
    first = None
    offsets: List[int] = []
    byte_sum = 0
    while pos + 7 <= n and frames < max_frames:
        b = payload
        if b[pos] != 0xFF or (b[pos + 1] & 0xF0) != 0xF0:
            break
        mpeg4 = (b[pos + 1] >> 3) & 1 == 0
        protection_absent = b[pos + 1] & 1
        profile = (b[pos + 2] >> 6) & 0x3
        sf_idx = (b[pos + 2] >> 2) & 0xF
        if sf_idx >= len(_ADTS_SR):
            break
        chan_cfg = ((b[pos + 2] & 1) << 2) | ((b[pos + 3] >> 6) & 0x3)
        frame_len = ((b[pos + 3] & 0x3) << 11) | (b[pos + 4] << 3) \
            | ((b[pos + 5] >> 5) & 0x7)
        n_blocks = (b[pos + 6] & 0x3) + 1
        if frame_len < (7 if protection_absent else 9) \
                or pos + frame_len > n:
            break
        if first is None:
            # channel_configuration: 1-6 map 1:1, 7 means 7.1 (8
            # channels), 0 defers to an in-band PCE (unknown here)
            chans = 8 if chan_cfg == 7 else (chan_cfg or None)
            first = {"sample_rate": _ADTS_SR[sf_idx], "profile": profile,
                     "channels": chans, "mpeg4": mpeg4}
        if len(offsets) < 4096:
            offsets.append(pos)
        frames += 1
        raw_blocks += n_blocks
        byte_sum += frame_len
        pos += frame_len
    if first is None:
        raise ValueError("no ADTS sync found")
    dur = raw_blocks * 1024 / first["sample_rate"]
    return {
        "container": "adts",
        "codec": "aac",
        "profile": ("Main", "LC", "SSR", "LTP")[first["profile"]],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": frames,
        "duration_s": dur,
        "avg_kbps": (byte_sum * 8 / dur / 1000) if dur else 0.0,
        "frame_offsets": offsets,
        "clean_eof": pos == n,
        "trailing_bytes": n - pos,
    }


def synth_adts_stream(n_frames: int, sample_rate: int = 44100,
                      channels: int = 2, body_bytes: int = 200,
                      seed: int = 11) -> bytes:
    sf_idx = _ADTS_SR.index(sample_rate)
    rng = np.random.default_rng(seed)
    out = bytearray()
    for _ in range(n_frames):
        frame_len = 7 + body_bytes
        hdr = _BitsW()
        hdr.u(0xFFF, 12)        # sync
        hdr.u(0, 1)             # MPEG-4
        hdr.u(0, 2)             # layer
        hdr.u(1, 1)             # protection absent
        hdr.u(1, 2)             # profile: LC
        hdr.u(sf_idx, 4)
        hdr.u(0, 1)             # private
        hdr.u(channels, 3)
        hdr.u(0, 1).u(0, 1).u(0, 1).u(0, 1)   # orig/home/cib/cis
        hdr.u(frame_len, 13)
        hdr.u(0x7FF, 11)        # buffer fullness: VBR marker
        hdr.u(0, 2)             # 1 raw data block
        body = bytearray(rng.integers(0, 256, body_bytes, dtype=np.uint8)
                         .tobytes())
        for j in range(len(body)):
            if body[j] == 0xFF:
                body[j] = 0xFE
        out += hdr.bytes() + body
    return bytes(out)


# ---------------------------------------------------------------------------
# H.264 Annex-B NAL walk + SPS parse

def _split_annexb(payload: bytes) -> List[bytes]:
    """Split an Annex-B byte stream into NAL units (start codes stripped)."""
    nals = []
    i = 0
    n = len(payload)
    start = -1
    # a valid NAL never ends in 0x00 (rbsp_stop_one_bit), so zeros before a
    # start code are trailing_zero_8bits and are stripped with the code
    while i + 3 <= n:
        if payload[i] == 0 and payload[i + 1] == 0:
            if payload[i + 2] == 1:
                if start >= 0:
                    nals.append(payload[start:i].rstrip(b"\x00"))
                start = i + 3
                i += 3
                continue
            if i + 4 <= n and payload[i + 2] == 0 and payload[i + 3] == 1:
                if start >= 0:
                    nals.append(payload[start:i].rstrip(b"\x00"))
                start = i + 4
                i += 4
                continue
        i += 1
    if start >= 0 and start < n:
        nals.append(payload[start:])
    return [x for x in nals if x]


def _unescape_rbsp(nal: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    i = 0
    n = len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += nal[i:i + 2]
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134}


def parse_sps(rbsp: bytes) -> dict:
    """Parse a seq_parameter_set RBSP (H.264 7.3.2.1.1) far enough for
    profile/level/resolution; stops before VUI."""
    r = _Bits(rbsp)
    profile_idc = r.u(8)
    r.u(8)                                  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()                                  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)                          # separate_colour_plane_flag
        r.ue()                              # bit_depth_luma_minus8
        r.ue()                              # bit_depth_chroma_minus8
        r.u(1)                              # qpprime_y_zero_transform_bypass
        if r.u(1):                          # seq_scaling_matrix_present
            raise ValueError("scaling matrices not supported in probe")
    r.ue()                                  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()                              # log2_max_pic_order_cnt_lsb
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()                                  # max_num_ref_frames
    r.u(1)                                  # gaps_in_frame_num_allowed
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                              # mb_adaptive_frame_field
    r.u(1)                                  # direct_8x8_inference
    crop = [0, 0, 0, 0]
    if r.u(1):                              # frame_cropping_flag
        crop = [r.ue(), r.ue(), r.ue(), r.ue()]
    # crop units (4:2:0 frame coding): x2 horizontally, x2 vertically
    sub_w = 2 if chroma_format_idc in (1, 2) else 1
    sub_h = 2 if chroma_format_idc == 1 else 1
    height_mult = 2 - frame_mbs_only
    width = pic_width_in_mbs * 16 - sub_w * (crop[0] + crop[1])
    height = height_mult * pic_height_in_map_units * 16 \
        - sub_h * height_mult * (crop[2] + crop[3])
    return {"profile_idc": profile_idc, "level_idc": level_idc,
            "width": width, "height": height,
            "frame_mbs_only": bool(frame_mbs_only)}


_NAL_NAMES = {1: "slice", 5: "idr", 6: "sei", 7: "sps", 8: "pps",
              9: "aud", 12: "filler"}


def probe_h264_annexb(payload: bytes) -> dict:
    """Walk an H.264 Annex-B stream: NAL inventory, SPS-derived resolution,
    keyframe (IDR) count and access-unit estimate.  Slice payloads are never
    entropy-decoded — only NAL + SPS headers are parsed."""
    nals = _split_annexb(payload)
    if not nals:
        raise ValueError("no Annex-B start codes found")
    counts: Dict[str, int] = {}
    sps_info = None
    first_mb_zero = 0
    for nal in nals:
        hdr = nal[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        ntype = hdr & 0x1F
        name = _NAL_NAMES.get(ntype, f"nal{ntype}")
        counts[name] = counts.get(name, 0) + 1
        if ntype == 7 and sps_info is None:
            sps_info = parse_sps(_unescape_rbsp(nal[1:]))
        elif ntype in (1, 5):
            # first_mb_in_slice == 0 marks the start of a new picture
            try:
                r = _Bits(_unescape_rbsp(nal[1:9]))
                if r.ue() == 0:
                    first_mb_zero += 1
            except ValueError:
                pass                        # truncated slice header: not a
                                            # picture start we can credit
    return {
        "container": "h264-annexb",
        "codec": "h264",
        "n_nals": len(nals),
        "nal_counts": counts,
        "n_keyframes": counts.get("idr", 0),
        "n_pictures": first_mb_zero,
        **({"width": sps_info["width"], "height": sps_info["height"],
            "profile_idc": sps_info["profile_idc"],
            "level_idc": sps_info["level_idc"]} if sps_info else
           {"width": None, "height": None,
            "profile_idc": None, "level_idc": None}),
    }


def _escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (00 00 {00,01,02,03} -> 00 00 03 x)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def synth_h264_stream(n_gops: int = 2, gop: int = 4, width: int = 320,
                      height: int = 240, seed: int = 13) -> bytes:
    """Syntactically-valid Annex-B stream: SPS + PPS, then per GOP one IDR
    and ``gop-1`` non-IDR slices.  Slice bodies are filler after the
    first_mb_in_slice/header bits (the probe reads only those)."""
    assert width % 16 == 0 and height % 16 == 0
    sps = _BitsW()
    sps.u(66, 8)            # profile_idc: baseline
    sps.u(0, 8)             # constraint flags
    sps.u(30, 8)            # level 3.0
    sps.ue(0)               # sps id
    sps.ue(0)               # log2_max_frame_num_minus4
    sps.ue(2)               # pic_order_cnt_type = 2
    sps.ue(1)               # max_num_ref_frames
    sps.u(0, 1)             # gaps allowed
    sps.ue(width // 16 - 1)
    sps.ue(height // 16 - 1)
    sps.u(1, 1)             # frame_mbs_only
    sps.u(1, 1)             # direct_8x8_inference
    sps.u(0, 1)             # no cropping
    sps.u(0, 1)             # no VUI
    sps_nal = bytes([0x67]) + _escape_rbsp(sps.rbsp_trailing().bytes())
    pps = _BitsW()
    pps.ue(0).ue(0)         # pps id, sps id
    pps.u(0, 1)             # entropy_coding_mode: CAVLC
    pps.u(0, 1)             # bottom_field_pic_order
    pps.ue(0)               # num_slice_groups_minus1
    pps.ue(0).ue(0)         # num_ref_idx defaults
    pps.u(0, 1).u(0, 2)     # weighted pred/bipred
    pps.se(0).se(0).se(0)   # qp deltas
    pps.u(0, 1).u(0, 1).u(0, 1)
    pps_nal = bytes([0x68]) + _escape_rbsp(pps.rbsp_trailing().bytes())
    rng = np.random.default_rng(seed)
    out = bytearray()
    sc4, sc3 = b"\x00\x00\x00\x01", b"\x00\x00\x01"
    out += sc4 + sps_nal + sc3 + pps_nal
    for g in range(n_gops):
        for s in range(gop):
            idr = s == 0
            sl = _BitsW()
            sl.ue(0)                    # first_mb_in_slice
            sl.ue(7 if idr else 5)      # slice_type: I / P (all-picture)
            sl.ue(0)                    # pps id
            sl.u(g % 16, 4)             # frame_num (log2=4)
            body = rng.integers(0, 255, 24, dtype=np.uint8).tobytes()
            nal = bytes([0x65 if idr else 0x41]) \
                + _escape_rbsp(sl.bytes() + body)
            out += (sc4 if idr else sc3) + nal
    return bytes(out)


# ---------------------------------------------------------------------------
# H.265/HEVC Annex-B NAL inventory (2-byte NAL header; SPS needs the full
# profile-tier-level parse, so resolution stays out of scope — the keyframe /
# access-unit inventory is what sampling pipelines key on)

_HEVC_IRAP = {16, 17, 18, 19, 20, 21}     # BLA/IDR/CRA picture types
_HEVC_NAMES = {19: "idr_w_radl", 20: "idr_n_lp", 21: "cra",
               32: "vps", 33: "sps", 34: "pps", 35: "aud", 39: "sei"}


def parse_hevc_sps(rbsp: bytes) -> dict:
    """Parse a seq_parameter_set RBSP (H.265 7.3.2.2.1) far enough for
    profile/level/resolution.  The profile_tier_level block is the fixed
    96-bit general-layer form (2+1+5 profile space/tier/idc, 32 compat
    flags, 4 source flags, 44 reserved, 8 level) — sub-layer PTL entries
    (sps_max_sub_layers_minus1 > 0) are not walked."""
    r = _Bits(rbsp)
    r.u(4)                                  # sps_video_parameter_set_id
    max_sub_layers_minus1 = r.u(3)
    r.u(1)                                  # temporal_id_nesting
    r.u(2)                                  # general_profile_space
    tier = r.u(1)
    profile_idc = r.u(5)
    r.u(32)                                 # profile compatibility flags
    r.u(4)                                  # progressive/interlaced/...
    r.u(44)                                 # reserved zero bits
    level_idc = r.u(8)
    if max_sub_layers_minus1 != 0:
        raise ValueError("sub-layer PTL not supported in probe")
    r.ue()                                  # sps_seq_parameter_set_id
    chroma_format_idc = r.ue()
    if chroma_format_idc == 3:
        r.u(1)                              # separate_colour_plane_flag
    width = r.ue()                          # pic_width_in_luma_samples
    height = r.ue()                         # pic_height_in_luma_samples
    if r.u(1):                              # conformance_window_flag
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        width -= sub_w * (left + right)
        height -= sub_h * (top + bottom)
    return {"profile_idc": profile_idc, "tier": tier,
            "level_idc": level_idc, "width": width, "height": height}


def probe_hevc_annexb(payload: bytes) -> dict:
    """Walk an H.265 Annex-B stream: NAL inventory by type, SPS-derived
    resolution (single-layer streams), IRAP (keyframe) count, VCL
    access-unit estimate via first_slice_segment_in_pic_flag (the first
    bit after the 2-byte NAL header).  Slice payloads are never
    entropy-decoded."""
    nals = _split_annexb(payload)
    if not nals:
        raise ValueError("no Annex-B start codes found")
    counts: Dict[str, int] = {}
    keyframes = 0
    pictures = 0
    sps_info = None
    for nal in nals:
        if len(nal) < 2:
            raise ValueError("truncated HEVC NAL header")
        hdr = nal[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        ntype = (hdr >> 1) & 0x3F
        name = _HEVC_NAMES.get(ntype,
                               "vcl%d" % ntype if ntype < 32
                               else "nal%d" % ntype)
        counts[name] = counts.get(name, 0) + 1
        if ntype == 33 and sps_info is None:
            try:
                sps_info = parse_hevc_sps(_unescape_rbsp(nal[2:]))
            except ValueError:
                pass                       # synthetic/partial SPS: probe
                                           # still reports the inventory
        if ntype < 32:                     # VCL NAL
            if ntype in _HEVC_IRAP:
                keyframes += 1
            if len(nal) >= 3 and (nal[2] & 0x80):
                pictures += 1              # first_slice_segment_in_pic
    return {"container": "hevc-annexb", "codec": "hevc",
            "n_nals": len(nals), "nal_counts": counts,
            "n_keyframes": keyframes, "n_pictures": pictures,
            **({"width": sps_info["width"], "height": sps_info["height"],
                "profile_idc": sps_info["profile_idc"],
                "level_idc": sps_info["level_idc"]} if sps_info else
               {"width": None, "height": None,
                "profile_idc": None, "level_idc": None})}


def synth_hevc_stream(n_gops: int = 2, gop: int = 4, width: int = 640,
                      height: int = 360, crop_bottom: int = 0,
                      seed: int = 17) -> bytes:
    """Syntactically-valid HEVC Annex-B stream: VPS + a real SPS (fixed
    96-bit PTL, Main profile, 4:2:0, optional bottom conformance crop in
    chroma units) + PPS, then one IDR_W_RADL + ``gop-1`` TRAIL_R slices
    per GOP, each with first_slice_segment_in_pic_flag = 1."""
    rng = np.random.default_rng(seed)
    sc4, sc3 = b"\x00\x00\x00\x01", b"\x00\x00\x01"

    def nal(ntype: int, body: bytes) -> bytes:
        # nal_unit_header: f(1)=0, type(6), layer_id(6)=0, tid+1(3)=1
        return bytes([(ntype << 1) & 0x7E, 0x01]) + _escape_rbsp(body)

    sps = _BitsW()
    sps.u(0, 4)             # sps_video_parameter_set_id
    sps.u(0, 3)             # sps_max_sub_layers_minus1
    sps.u(1, 1)             # temporal_id_nesting
    sps.u(0, 2).u(0, 1).u(1, 5)     # profile space / tier / Main
    sps.u(0, 32).u(0, 4).u(0, 44)   # compat + source flags + reserved
    sps.u(120, 8)           # general_level_idc: 4.0
    sps.ue(0)               # sps_seq_parameter_set_id
    sps.ue(1)               # chroma_format_idc 4:2:0
    sps.ue(width)
    sps.ue(height + 2 * crop_bottom)
    if crop_bottom:
        sps.u(1, 1)
        sps.ue(0).ue(0).ue(0).ue(crop_bottom)
    else:
        sps.u(0, 1)         # no conformance window
    out = bytearray()
    out += sc4 + nal(32, b"\x81\x02\x03")          # VPS
    out += sc3 + nal(33, sps.rbsp_trailing().bytes())
    out += sc3 + nal(34, b"\x83\x07")              # PPS
    for _ in range(n_gops):
        for s in range(gop):
            body = bytes([0x80]) \
                + rng.integers(1, 255, 16, dtype=np.uint8).tobytes()
            out += (sc4 if s == 0 else sc3) + nal(19 if s == 0 else 1, body)
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF box walk (the container most real media ships in)

def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the box sequence in
    [start, end); raises on malformed sizes rather than guessing."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        four = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                       # 64-bit largesize
            if body + 8 > end:
                raise ValueError("truncated largesize box")
            size = int.from_bytes(buf[body:body + 8], "big")
            body += 8
            if size < 16:
                raise ValueError("bad largesize")
        elif size == 0:                     # to end of enclosing box
            size = end - pos
        elif size < 8:
            raise ValueError("bad box size")
        if pos + size > end:
            raise ValueError("box overruns container")
        yield four.decode("latin1"), body, pos + size
        pos += size


_MP4_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl"}


def probe_mp4(payload: bytes) -> dict:
    """ISO-BMFF metadata walk: ftyp brand, mvhd timescale/duration,
    per-track tkhd dimensions + stsd sample-entry fourcc (the codec id),
    and stsz sample count.  mdat payloads are never decoded."""
    brand = None
    duration_s = None
    tracks: List[dict] = []

    def need(b0: int, b1: int, nbytes: int, four: str) -> None:
        # a leaf shorter than its fixed fields must error, never read
        # into sibling-box bytes or return int.from_bytes(empty) == 0
        if b1 - b0 < nbytes:
            raise ValueError(f"truncated {four} box")

    def walk(start: int, end: int, track: Optional[dict],
             depth: int = 0):
        nonlocal brand, duration_s
        if depth > 16:      # moov/trak/mdia/minf/stbl nests 5 deep; a
            raise ValueError("box nesting too deep")  # bomb would blow
            # the recursion limit as RecursionError past the stage catch
        for four, b0, b1 in _walk_boxes(payload, start, end):
            if four == "ftyp" and brand is None:
                need(b0, b1, 4, four)
                brand = payload[b0:b0 + 4].decode("latin1")
            elif four == "mvhd":
                need(b0, b1, 20, four)
                ver = payload[b0]
                if ver == 1:
                    need(b0, b1, 32, four)
                    tscale = int.from_bytes(payload[b0 + 20:b0 + 24], "big")
                    dur = int.from_bytes(payload[b0 + 24:b0 + 32], "big")
                else:
                    tscale = int.from_bytes(payload[b0 + 12:b0 + 16], "big")
                    dur = int.from_bytes(payload[b0 + 16:b0 + 20], "big")
                if tscale:
                    duration_s = dur / tscale
            elif four == "tkhd" and track is not None:
                need(b0, b1, 8, four)
                off = b1 - 8                # width/height: last 8 bytes
                track["width"] = int.from_bytes(
                    payload[off:off + 4], "big") >> 16      # 16.16 fixed
                track["height"] = int.from_bytes(
                    payload[off + 4:off + 8], "big") >> 16
            elif four == "stsd" and track is not None:
                need(b0, b1, 8, four)
                n = int.from_bytes(payload[b0 + 4:b0 + 8], "big")
                if n >= 1 and b0 + 16 <= b1:
                    track["codec"] = payload[b0 + 12:b0 + 16] \
                        .decode("latin1")
            elif four == "stsz" and track is not None:
                need(b0, b1, 12, four)
                track["n_samples"] = int.from_bytes(
                    payload[b0 + 8:b0 + 12], "big")
            elif four == "hdlr" and track is not None:
                need(b0, b1, 12, four)
                track["handler"] = payload[b0 + 8:b0 + 12].decode("latin1")
            elif four == "trak":
                t: dict = {}
                tracks.append(t)
                walk(b0, b1, t, depth + 1)
            elif four in _MP4_CONTAINERS:
                walk(b0, b1, track, depth + 1)

    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (no leading ftyp)")
    try:
        walk(0, len(payload), None)
    except IndexError:
        # a structurally-valid box tree whose leaf body is shorter than
        # its fixed fields (e.g. an empty mvhd) — malformed, not fatal
        raise ValueError("truncated ISO-BMFF leaf box") from None
    vid = next((t for t in tracks if t.get("handler") == "vide"
                or "width" in t and t.get("width")), None)
    return {
        "container": "mp4", "codec": (vid or {}).get("codec") or
        (tracks[0].get("codec") if tracks else None),
        "brand": brand, "duration_s": duration_s,
        "n_tracks": len(tracks),
        "width": (vid or {}).get("width"),
        "height": (vid or {}).get("height"),
        "n_frames": (vid or {}).get("n_samples"),
        "tracks": tracks,
    }


def _box(four: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + four + body


def synth_mp4(width: int = 640, height: int = 360, n_samples: int = 48,
              timescale: int = 600, duration: int = 1200,
              codec: bytes = b"avc1") -> bytes:
    """Minimal valid ISO-BMFF: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr,
    minf(stbl(stsd, stsz))))) + empty mdat."""
    mvhd = bytes(4) + bytes(8) + timescale.to_bytes(4, "big") \
        + duration.to_bytes(4, "big") + bytes(80)
    tkhd = bytes(4) + bytes(72) \
        + (width << 16).to_bytes(4, "big") \
        + (height << 16).to_bytes(4, "big")
    hdlr = bytes(8) + b"vide" + bytes(12) + b"vh\x00"
    stsd = bytes(4) + (1).to_bytes(4, "big") \
        + _box(codec, bytes(70))
    stsz = bytes(4) + (0).to_bytes(4, "big") \
        + n_samples.to_bytes(4, "big")
    stbl = _box(b"stbl", _box(b"stsd", stsd) + _box(b"stsz", stsz))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _box(b"hdlr", hdlr) + minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomavc1") + moov \
        + _box(b"mdat", b"")


# ---------------------------------------------------------------------------
# Matroska / WebM EBML walk

def _ebml_vint(buf: bytes, pos: int, keep_marker: bool):
    """Read one EBML variable-length integer at ``pos``; returns
    (value, next_pos).  IDs keep the length-marker bit (``keep_marker``),
    sizes strip it.  An all-ones size payload means 'unknown size'
    (returned as None for sizes)."""
    if pos >= len(buf):
        raise ValueError("EBML vint truncated")
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 9 - first.bit_length()       # leading-zero count + 1
    if pos + length > len(buf):
        raise ValueError("EBML vint truncated")
    if keep_marker:
        v = int.from_bytes(buf[pos:pos + length], "big")
    else:
        v = first & (0xFF >> length)
        for b in buf[pos + 1:pos + length]:
            v = (v << 8) | b
        if v == (1 << (7 * length)) - 1:
            return None, pos + length     # unknown size
    return v, pos + length


_EBML_MASTERS = {0x1A45DFA3,              # EBML header (DocType inside)
                 0x18538067,              # Segment
                 0x1549A966,              # Info
                 0x1654AE6B,              # Tracks
                 0xAE,                    # TrackEntry
                 0xE0, 0xE1}              # Video / Audio


def probe_matroska(payload: bytes) -> dict:
    """Matroska/WebM metadata walk: EBML DocType, Segment>Info
    TimestampScale + Duration, per-track type/CodecID and Video
    PixelWidth/PixelHeight or Audio SamplingFrequency/Channels.
    Cluster payloads are never parsed."""
    if payload[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML stream")
    doctype = None
    tscale = 1_000_000                    # ns per tick, Matroska default
    duration_ticks = None
    tracks: List[dict] = []

    def walk(pos: int, end: int, track: Optional[dict],
             depth: int = 0):
        nonlocal doctype, tscale, duration_ticks
        if depth > 16:
            raise ValueError("EBML nesting too deep")
        while pos < end:
            eid, pos = _ebml_vint(payload, pos, keep_marker=True)
            size, pos = _ebml_vint(payload, pos, keep_marker=False)
            body_end = end if size is None else pos + size
            if body_end > end:
                raise ValueError("EBML element overruns parent")
            body = payload[pos:body_end]
            if eid == 0x4282:                             # DocType
                doctype = body.decode("latin1").rstrip("\x00")
            elif eid == 0x2AD7B1 and body:                # TimestampScale
                tscale = int.from_bytes(body, "big")
            elif eid == 0x4489 and len(body) in (4, 8):   # Duration
                duration_ticks = float(np.frombuffer(
                    body, dtype=(">f4" if len(body) == 4 else ">f8"))[0])
            elif eid == 0xAE:                             # TrackEntry
                t: dict = {}
                tracks.append(t)
                walk(pos, body_end, t, depth + 1)
            elif eid == 0x83 and track is not None and body:
                track["type"] = {1: "video", 2: "audio", 17: "subtitle"} \
                    .get(body[0], "type%d" % body[0])
            elif eid == 0x86 and track is not None:       # CodecID
                track["codec"] = body.decode("latin1").rstrip("\x00")
            elif eid == 0xB0 and track is not None:       # PixelWidth
                track["width"] = int.from_bytes(body, "big")
            elif eid == 0xBA and track is not None:       # PixelHeight
                track["height"] = int.from_bytes(body, "big")
            elif eid == 0xB5 and track is not None and len(body) in (4, 8):
                track["sample_rate"] = float(np.frombuffer(
                    body, dtype=(">f4" if len(body) == 4 else ">f8"))[0])
            elif eid == 0x9F and track is not None and body:  # Channels
                track["channels"] = int.from_bytes(body, "big")
            elif eid in _EBML_MASTERS:
                walk(pos, body_end, track, depth + 1)
            if size is None:              # unknown-size master: children
                return                    # were consumed by the walk above
            pos = body_end

    try:
        walk(0, len(payload), None)
    except IndexError:
        raise ValueError("truncated EBML stream") from None
    vid = next((t for t in tracks if t.get("type") == "video"), None)
    aud = next((t for t in tracks if t.get("type") == "audio"), None)
    dur = duration_ticks * tscale / 1e9 \
        if duration_ticks is not None else None
    return {
        "container": doctype or "matroska",
        "codec": (vid or aud or {}).get("codec"),
        "duration_s": dur,
        "n_tracks": len(tracks),
        "width": (vid or {}).get("width"),
        "height": (vid or {}).get("height"),
        "sample_rate": (aud or {}).get("sample_rate"),
        "channels": (aud or {}).get("channels"),
        "tracks": tracks,
    }


def _ebml_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_size(n: int) -> bytes:
    # smallest vint length whose payload can hold n below the all-ones
    # (unknown-size) pattern
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("size too large")


def _ebml_el(eid: int, body: bytes) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(body)) + body


def synth_matroska(width: int = 1280, height: int = 720,
                   duration_s: float = 12.5, codec: str = "V_VP9",
                   webm: bool = True) -> bytes:
    """Minimal valid Matroska/WebM: EBML header (DocType) + Segment
    (Info: TimestampScale in ns + Duration in ticks; Tracks: one video
    TrackEntry with codec + dimensions)."""
    header = _ebml_el(0x1A45DFA3,
                      _ebml_el(0x4282,
                               b"webm" if webm else b"matroska"))
    dur = np.array([duration_s * 1000], dtype=">f8").tobytes()
    info = _ebml_el(0x1549A966,
                    _ebml_el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
                    + _ebml_el(0x4489, dur))
    video = _ebml_el(0xE0, _ebml_el(0xB0, width.to_bytes(2, "big"))
                     + _ebml_el(0xBA, height.to_bytes(2, "big")))
    entry = _ebml_el(0xAE, _ebml_el(0x83, b"\x01")
                     + _ebml_el(0x86, codec.encode()) + video)
    tracks = _ebml_el(0x1654AE6B, entry)
    return header + _ebml_el(0x18538067, info + tracks)


# ---------------------------------------------------------------------------
# Ogg page walk (Opus / Vorbis)

def probe_ogg(payload: bytes) -> dict:
    """Ogg container walk: page headers chained by their segment tables,
    codec identified from the BOS packet (OpusHead / Vorbis id header),
    duration from the last page's granule position (48 kHz ticks minus
    pre-skip for Opus, sample-rate ticks for Vorbis).  Page CRCs are not
    verified — this is a probe, not a demuxer."""
    n = len(payload)
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    pos = 0
    pages = 0
    codec = None
    sample_rate = None
    channels = None
    pre_skip = 0
    last_granule = None
    while pos + 27 <= n:
        if payload[pos:pos + 4] != b"OggS":
            break
        if payload[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        header_type = payload[pos + 5]
        granule = int.from_bytes(payload[pos + 6:pos + 14], "little",
                                 signed=True)
        nsegs = payload[pos + 26]
        seg_end = pos + 27 + nsegs
        if seg_end > n:
            break
        body_len = sum(payload[pos + 27:seg_end])
        if seg_end + body_len > n:
            break
        body = payload[seg_end:seg_end + body_len]
        if header_type & 0x02:                    # BOS: codec id packet
            if body[:8] == b"OpusHead":
                codec = "opus"
                if len(body) >= 12:
                    channels = body[9]
                    pre_skip = int.from_bytes(body[10:12], "little")
                sample_rate = 48000               # granule timescale
            elif body[:7] == b"\x01vorbis":
                codec = "vorbis"
                if len(body) >= 16:
                    channels = body[11]
                    sample_rate = int.from_bytes(body[12:16], "little")
        if granule >= 0:
            last_granule = granule
        pages += 1
        pos = seg_end + body_len
    if pages == 0:
        raise ValueError("no complete Ogg page")
    dur = None
    if last_granule is not None and sample_rate:
        ticks = last_granule - (pre_skip if codec == "opus" else 0)
        dur = max(ticks, 0) / sample_rate
    return {"container": "ogg", "codec": codec, "n_frames": pages,
            "duration_s": dur, "sample_rate": sample_rate,
            "channels": channels, "clean_eof": pos == n,
            "trailing_bytes": n - pos}


def synth_ogg(codec: str = "opus", duration_s: float = 2.5,
              n_pages: int = 4, channels: int = 2, seed: int = 23) -> bytes:
    """Minimal valid Ogg stream: BOS page with the codec id header, then
    data pages whose final granule encodes ``duration_s``."""
    rng = np.random.default_rng(seed)

    def page(header_type: int, granule: int, seq: int,
             body: bytes) -> bytes:
        assert len(body) < 255 * 255
        segs = []
        rest = len(body)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        return (b"OggS\x00" + bytes([header_type])
                + granule.to_bytes(8, "little", signed=True)
                + (7).to_bytes(4, "little")       # serial
                + seq.to_bytes(4, "little")
                + b"\x00\x00\x00\x00"             # crc unverified
                + bytes([len(segs)]) + bytes(segs) + body)

    if codec == "opus":
        rate, pre_skip = 48000, 312
        head = (b"OpusHead" + b"\x01" + bytes([channels])
                + pre_skip.to_bytes(2, "little")
                + (48000).to_bytes(4, "little") + b"\x00\x00" + b"\x00")
        total = int(duration_s * rate) + pre_skip
    else:
        rate, pre_skip = 44100, 0
        head = (b"\x01vorbis" + (0).to_bytes(4, "little")
                + bytes([channels]) + rate.to_bytes(4, "little")
                + bytes(12))
        total = int(duration_s * rate)
    out = bytearray(page(0x02, 0, 0, head))
    for i in range(1, n_pages + 1):
        g = total if i == n_pages else (total * i) // n_pages
        body = rng.integers(0, 256, 60, dtype=np.uint8).tobytes() \
            .replace(b"OggS", b"Oggs")
        out += page(0x04 if i == n_pages else 0x00, g, i, body)
    return bytes(out)


def probe_media(payload: bytes) -> dict:
    """Magic-sniffed metadata probe.  For the stubbed-decode formats
    (MP3/AAC/H.264/HEVC/MP4) this is a full header walk; for formats the
    engine decodes for real it defers to the decoders' own parsing
    elsewhere and just labels the container here.  Dispatch is purely
    magic-based — a kind hint would add nothing the sync bytes don't."""
    # 0xFFF sync with layer bits 00 is ADTS (MPEG audio reserves layer 00);
    # any other 0xFFE sync is an MPEG audio frame
    if len(payload) >= 2 and payload[0] == 0xFF \
            and (payload[1] & 0xF0) == 0xF0 and (payload[1] & 0x06) == 0:
        return probe_adts(payload)
    if payload[:3] == b"ID3" or (len(payload) >= 2 and payload[0] == 0xFF
                                 and (payload[1] & 0xE0) == 0xE0):
        return probe_mpeg_audio(payload)
    if payload[:4] == b"\x00\x00\x00\x01" or payload[:3] == b"\x00\x00\x01":
        # HEVC vs AVC: HEVC's 2-byte NAL header has bit 0 of byte 0 clear
        # and layer/tid bytes 0x01; its leading NAL is a VPS/SPS (>= 32)
        first = payload[4:] if payload[2] == 0 else payload[3:]
        if len(first) >= 2 and first[1] == 0x01 \
                and ((first[0] >> 1) & 0x3F) >= 32 and not (first[0] & 0x81):
            return probe_hevc_annexb(payload)
        return probe_h264_annexb(payload)
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        return probe_mp4(payload)
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return probe_matroska(payload)
    if payload[:4] == b"OggS":
        return probe_ogg(payload)
    magic = {b"RIFF": "riff", b"fLaC": "flac", b"\x89PNG": "png",
             b"GIF8": "gif", b".snd": "au", b"FORM": "aiff",
             b"II*\x00": "tiff", b"MM\x00*": "tiff", b"YUV4": "y4m"}
    for m, name in magic.items():
        if payload[:4] == m:
            return {"container": name, "codec": name, "decodable": True}
    if payload[:2] == b"\xff\xd8":
        return {"container": "jpeg", "codec": "jpeg", "decodable": True}
    if payload[:2] in (b"P5", b"P6", b"BM"):
        return {"container": "image", "codec": payload[:2].decode("latin1"),
                "decodable": True}
    raise ValueError("unrecognized media payload")


_PROBE_COLS = [
    ("container", pa.string()), ("codec", pa.string()),
    ("duration_s", pa.float64()), ("n_frames", pa.int64()),
    ("sample_rate", pa.int64()), ("channels", pa.int64()),
    ("avg_kbps", pa.float64()), ("width", pa.int64()),
    ("height", pa.int64()), ("n_keyframes", pa.int64()),
    ("probe_err", pa.string()),
]


class MediaProbeStage:
    """Actor-pool ``map_batches`` stage: per-payload metadata probe.

    Mirrors MediaFeatureStage's shape (multimodal.py:353): construct once
    per actor, loop only over the inherently-per-payload probe calls, emit
    typed columns.  Unprobeable payloads get ``probe_err`` set instead of
    failing the batch — at corpus scale a bad file must not kill a block.
    """

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pcol = batch.column(self.payload_col)
        if isinstance(pcol, pa.ChunkedArray):
            pcol = pcol.combine_chunks()
        payloads = pcol.to_pylist()
        rows = {name: [] for name, _ in _PROBE_COLS}
        for p in payloads:
            try:
                if p is None:
                    raise ValueError("null payload")
                info = probe_media(p)
                err = None
            except ValueError as e:
                info, err = {}, str(e)
            rows["container"].append(info.get("container"))
            rows["codec"].append(info.get("codec"))
            rows["duration_s"].append(info.get("duration_s"))
            rows["n_frames"].append(info.get("n_frames",
                                             info.get("n_pictures")))
            rows["sample_rate"].append(info.get("sample_rate"))
            rows["channels"].append(info.get("channels"))
            rows["avg_kbps"].append(info.get("avg_kbps"))
            rows["width"].append(info.get("width"))
            rows["height"].append(info.get("height"))
            rows["n_keyframes"].append(info.get("n_keyframes"))
            rows["probe_err"].append(err)
        out = batch.drop_columns([self.payload_col])
        for name, typ in _PROBE_COLS:
            out = out.append_column(name, pa.array(rows[name], type=typ))
        return out


def media_probe_pipeline(ds, batch_size: int = 256, concurrency=(1, 4)):
    """Probe-before-decode pipeline: one actor-pool pass attaches the
    metadata columns (container/codec/duration/dimensions/bitrate/
    keyframes + probe_err) so downstream decode stages can filter,
    route per-codec and size their batches WITHOUT touching payload
    bytes — the step a 100-TB media corpus runs first.  Mirrors
    multimodal.media_feature_pipeline's actor-pool shape."""
    return ds.map_batches(MediaProbeStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def write_media_probes(ds, out_dir: str):
    """Partitioned, idempotent probe sink — one directory per container
    (failed runs skip finished partitions by re-running per container)."""
    import pyarrow.compute as _pc

    def fill(b: pa.Table) -> pa.Table:
        col = _pc.fill_null(b.column("container"), "unknown")
        i = b.column_names.index("container")
        return b.set_column(i, "container", col)

    ds.map_batches(fill, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["container"], mode="overwrite")
    return out_dir
