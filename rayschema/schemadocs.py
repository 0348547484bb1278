"""Schema documents AS data: parse/analyze a column of JSON Schema documents
with map_batches (SURVEY.md §2.A "corpus-side: ds.map_batches(parse_schema_docs)
when schema docs are themselves rows").

Per row: two-pass decode (serde), canonical re-serialization stability,
IsTrivial analysis, keyword census — i.e. the reference's serialization +
analysis operators run distributed over a corpus of schemas.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np
import pyarrow as pa

from rayschema.serde import (
    KNOWN_KEYS,
    drop_zero_mins,
    json_equal,
    schema_from_json,
    schema_to_json,
)
from rayschema.trivial import definitions_resolver, is_trivial, sob_is_trivial


def synth_schema_docs(n: int, seed: int = 42) -> pa.Table:
    """Deterministic corpus of draft-07 documents exercising the keyword
    grammar (analog of the reference's generated round-trip corpus,
    entities_test.go:13-107)."""
    rng = np.random.default_rng(seed)
    docs: List[str] = []
    types = ["string", "integer", "number", "boolean", "object", "array",
             ["string", "null"], ["integer", "null"]]
    for i in range(n):
        d = {}
        r = rng.random()
        if r < 0.05:
            docs.append("true" if rng.random() < 0.5 else "false")
            continue
        if rng.random() < 0.7:
            d["type"] = types[int(rng.integers(0, len(types)))]
        if rng.random() < 0.3:
            d["minimum"] = int(rng.integers(-10, 10))
        if rng.random() < 0.3:
            d["minLength"] = int(rng.integers(0, 5))
        if rng.random() < 0.3:
            d["pattern"] = ["^a", "[abc]", "x$"][int(rng.integers(0, 3))]
        if rng.random() < 0.3:
            d["enum"] = ["foo", "bar", int(rng.integers(0, 5))]
        if rng.random() < 0.2:
            d["items"] = {"type": "integer", "minimum": 0}
        if rng.random() < 0.2:
            d["properties"] = {"a": {"type": "string"}, "b": {"minLength": 1}}
        if rng.random() < 0.2:
            d["required"] = ["a"]
        if rng.random() < 0.2:
            d["x-vendor"] = {"note": int(i)}
        if rng.random() < 0.1:
            d["default"] = None
        if rng.random() < 0.15:
            d["anyOf"] = [{"type": "string"}, {"minimum": 0}]
        if rng.random() < 0.1:
            d["definitions"] = {"t": {"type": "string"}}
            d["$ref"] = "#/definitions/t"
        docs.append(json.dumps(d))
    return pa.table({"schema_id": pa.array(np.arange(n, dtype=np.int64)),
                     "schema_json": pa.array(docs, type=pa.string())})


def analyze_schema_docs_batch(batch: pa.Table,
                              json_col: str = "schema_json") -> pa.Table:
    """Per-document: parse_ok, is_bool_schema, trivial, n_keywords,
    n_extra_keys, roundtrip_stable."""
    texts = batch.column(json_col).to_pylist()
    n = len(texts)
    parse_ok = np.zeros(n, dtype=bool)
    is_bool = np.zeros(n, dtype=bool)
    trivial = np.zeros(n, dtype=bool)
    n_kw = np.zeros(n, dtype=np.int32)
    n_extra = np.zeros(n, dtype=np.int32)
    stable = np.zeros(n, dtype=bool)
    known = set(KNOWN_KEYS)
    for i, t in enumerate(texts):
        if t is None:
            continue
        try:
            s = schema_from_json(t)
        except ValueError:
            continue
        parse_ok[i] = True
        if isinstance(s, bool):
            is_bool[i] = True
            trivial[i] = s
            stable[i] = True
            continue
        resolver = definitions_resolver(s)
        trivial[i] = is_trivial(s, resolver)
        raw = json.loads(t)
        n_kw[i] = sum(1 for k in raw if k in known)
        n_extra[i] = len(s.extra_properties)
        out = schema_to_json(s)
        stable[i] = json_equal(json.dumps(drop_zero_mins(raw)), out) and \
            schema_to_json(schema_from_json(out)) == out
    cols = {name: batch.column(name) for name in batch.schema.names if name != json_col}
    cols.update({
        "parse_ok": pa.array(parse_ok),
        "is_bool_schema": pa.array(is_bool),
        "trivial": pa.array(trivial),
        "n_keywords": pa.array(n_kw),
        "n_extra_keys": pa.array(n_extra),
        "roundtrip_stable": pa.array(stable),
    })
    return pa.table(cols)


def analyze_schema_docs(ds, json_col: str = "schema_json", concurrency=(1, 8)):
    return ds.map_batches(analyze_schema_docs_batch,
                          fn_kwargs={"json_col": json_col},
                          batch_format="pyarrow")
