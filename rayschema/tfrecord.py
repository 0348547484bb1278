"""Pure-Python TFRecord container codec — the TensorFlow training-data
file format (length-delimited records, each guarded by two masked
CRC-32C checksums). Format per record:

    uint64 LE  length
    uint32 LE  masked_crc32c(length bytes)
    byte[length] payload
    uint32 LE  masked_crc32c(payload)

masked_crc = rotr15(crc) + 0xa282ead8 (mod 2^32) — the TF convention.

The payload here is the row's canonical JSON (sorted keys, compact
separators, UTF-8) — the framing is the format; an Example-proto
encoder is a drop-in ``payload_fn``. CRC-32C (Castagnoli, reflected
poly 0x82F63B78) is computed VECTORIZED ACROSS RECORDS: one masked
table-lookup pass per byte position over the still-active record set
(the poly_token_hash discipline), so a batch of N records costs
max_len numpy ops, never a per-byte Python loop.

No TensorFlow anywhere — files produced here are readable by
tf.data.TFRecordDataset and vice versa (format per the public spec).
"""
from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

_POLY = np.uint32(0x82F63B78)


def _make_table() -> np.ndarray:
    tab = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        tab[i] = c
    return tab


_TABLE = _make_table()


def crc32c_many(payloads) -> np.ndarray:
    """CRC-32C of each bytes payload, vectorized by byte position."""
    n = len(payloads)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                       count=n)
    joined = b"".join(payloads)
    buf = np.frombuffer(joined, dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    if n > 1:
        offs[1:] = np.cumsum(lens)[:-1]
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    maxl = int(lens.max())
    for p in range(maxl):
        m = lens > p
        byte = buf[offs[m] + p].astype(np.uint32)
        c = crc[m]
        crc[m] = _TABLE[(c ^ byte) & np.uint32(0xFF)] \
            ^ (c >> np.uint32(8))
    return crc ^ np.uint32(0xFFFFFFFF)


def masked_crc(crc: np.ndarray) -> np.ndarray:
    c = crc.astype(np.uint64)
    rot = ((c >> np.uint64(15)) | (c << np.uint64(17))) \
        & np.uint64(0xFFFFFFFF)
    return ((rot + np.uint64(0xA282EAD8))
            & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def _row_payloads(table: pa.Table):
    cols = {name: table.column(name).to_pylist()
            for name in table.column_names}
    names = list(table.column_names)
    out = []
    for i in range(table.num_rows):
        row = {k: cols[k][i] for k in names}
        out.append(json.dumps(row, sort_keys=True,
                              separators=(",", ":"),
                              ensure_ascii=False).encode("utf-8"))
    return out


def write_tfrecord(table: pa.Table, path: str) -> None:
    payloads = _row_payloads(table)
    data_crc = masked_crc(crc32c_many(payloads))
    len_bufs = [struct.pack("<Q", len(p)) for p in payloads]
    len_crc = masked_crc(crc32c_many(len_bufs))
    parts = []
    for i, p in enumerate(payloads):
        parts.append(len_bufs[i])
        parts.append(struct.pack("<I", int(len_crc[i])))
        parts.append(p)
        parts.append(struct.pack("<I", int(data_crc[i])))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def read_tfrecord_file(path_or_bytes) -> pa.Table:
    """Parse one TFRecord file, VERIFYING both checksums per record
    (a corrupt byte raises instead of shipping bad training rows)."""
    if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    pos, total = 0, len(raw)
    payloads, len_bufs, want_len, want_dat = [], [], [], []
    while pos < total:
        if pos + 12 > total:
            raise ValueError("truncated TFRecord header")
        ln = struct.unpack_from("<Q", raw, pos)[0]
        lc = struct.unpack_from("<I", raw, pos + 8)[0]
        if pos + 12 + ln + 4 > total:
            raise ValueError("truncated TFRecord payload")
        payloads.append(raw[pos + 12:pos + 12 + ln])
        len_bufs.append(raw[pos:pos + 8])
        want_len.append(lc)
        want_dat.append(struct.unpack_from("<I", raw,
                                           pos + 12 + ln)[0])
        pos += 12 + ln + 4
    got_len = masked_crc(crc32c_many(len_bufs))
    got_dat = masked_crc(crc32c_many(payloads))
    if (got_len != np.asarray(want_len, dtype=np.uint32)).any() \
            or (got_dat != np.asarray(want_dat, dtype=np.uint32)).any():
        raise ValueError("TFRecord CRC mismatch (corrupt file)")
    rows = [json.loads(p.decode("utf-8")) for p in payloads]
    if not rows:
        return pa.table({})
    names = sorted(rows[0].keys())
    return pa.table({k: pa.array([r.get(k) for r in rows])
                     for k in names})
