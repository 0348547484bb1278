"""Avro OCF codec tests: binary-encoding hand goldens, container
round-trips over every supported type (incl. unicode / nulls / negative
zigzag edges), determinism, and the sources.py integration."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from rayschema.avro import (_encode_records, read_avro_file,
                            schema_json_for, write_avro)


def test_binary_encoding_hand_goldens():
    # union branch 1 = zigzag(1) = 0x02; long 3 -> zigzag 6 = 0x06
    assert _encode_records(pa.table(
        {"x": pa.array([3], type=pa.int64())})) == bytes([0x02, 0x06])
    # null -> union branch 0 = zigzag(0) = 0x00, nothing else
    assert _encode_records(pa.table(
        {"x": pa.array([None], type=pa.int64())})) == bytes([0x00])
    # string "hi" -> branch, len 2 (zigzag 4), bytes
    assert _encode_records(pa.table(
        {"s": pa.array(["hi"])})) == bytes([0x02, 0x04]) + b"hi"
    # negative long -1 -> zigzag 1 = 0x01
    assert _encode_records(pa.table(
        {"x": pa.array([-1], type=pa.int64())})) == bytes([0x02, 0x01])
    # varint spill: 64 -> zigzag 128 -> 0x80 0x01
    assert _encode_records(pa.table(
        {"x": pa.array([64], type=pa.int64())})) == bytes(
        [0x02, 0x80, 0x01])


def test_ocf_roundtrip_all_types_and_determinism(tmp_path):
    t = pa.table({
        "doc_id": pa.array([1, 2, None, -(1 << 62)], type=pa.int64()),
        "text": pa.array(["a", "straße", "世界 你好", None]),
        "score": pa.array([1.5, None, -0.0, float("inf")],
                          type=pa.float64()),
        "ok": pa.array([True, False, None, True]),
        "blob": pa.array([b"\x00\xff", None, b"", b"xyz"],
                         type=pa.binary())})
    for codec in ("null", "deflate"):
        p = os.path.join(tmp_path, f"t_{codec}.avro")
        write_avro(t, p, codec=codec)
        assert read_avro_file(p).equals(t)
        p2 = os.path.join(tmp_path, f"t2_{codec}.avro")
        write_avro(t, p2, codec=codec)
        assert open(p, "rb").read() == open(p2, "rb").read()


def test_ocf_multi_block(tmp_path):
    n = 10_000
    t = pa.table({"x": pa.array(np.arange(n), type=pa.int64()),
                  "s": pa.array([f"r{i}" for i in range(n)])})
    p = os.path.join(tmp_path, "m.avro")
    write_avro(t, p, block_rows=777)
    assert read_avro_file(p).equals(t)


def test_schema_json_shape():
    t = pa.table({"a": pa.array([1], type=pa.int64()),
                  "b": pa.array(["x"])})
    import json
    sch = json.loads(schema_json_for(t))
    assert sch["type"] == "record"
    assert sch["fields"][0] == {"name": "a", "type": ["null", "long"]}


def test_sources_avro_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from rayschema.sources import detect_format, read_corpus, write_corpus

    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                       "text": ["a", "b", None, "straße", "世界", ""]})
    out = os.path.join(tmp_path, "avro")
    write_corpus(rd.from_pandas(df), out, fmt="avro")
    assert detect_format(out) == "avro"
    back = read_corpus(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert back["text"].tolist()[:2] == ["a", "b"]
    assert back["text"].tolist()[3:] == ["straße", "世界", ""]
    assert pd.isna(back["text"][2])
