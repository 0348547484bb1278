"""Validation of dynamic JSON string columns (SURVEY.md §2.D "for dynamic
JSON columns: per-row type tag compare").

A column like ``events.props`` holds one JSON document per row. The stage
parses the batch's documents once (the only per-row Python in the engine —
inherent to JSON decoding), converts them to an Arrow array (struct/map/list
inference), and then reuses the SAME compiled vectorized validator as every
other column — so all keyword semantics stay in one implementation.

Runs as an actor pool: the validator is compiled once per worker.
"""

from __future__ import annotations

import json
from typing import Any, List, Optional

import numpy as np
import pyarrow as pa

from rayschema.compile import compile_validator
from rayschema.serde import schema_from_json


def _shape_sig(x: Any):
    """Recursive type-shape signature of a parsed JSON document. Rows with
    equal signatures always convert into ONE Arrow array together, so a
    heterogeneous batch is validated per shape GROUP (a handful of
    vectorized calls), not per row."""
    if isinstance(x, dict):
        return ("o", tuple(sorted((k, _shape_sig(v)) for k, v in x.items())))
    if isinstance(x, (list, tuple)):
        return ("a", tuple(sorted({repr(_shape_sig(v)) for v in x})))
    if isinstance(x, bool):
        return "b"
    if isinstance(x, int):
        return "i"
    if isinstance(x, float):
        return "f"
    if isinstance(x, str):
        return "s"
    return "n"


class JsonColumnValidator:
    """map_batches stage: validate a JSON-text column against a schema.

    Emits ``json_ok`` (parse success), ``valid`` (parse + schema pass) and
    ``n_violations``. Pass ``keep_cols`` to project the output."""

    def __init__(self, schema_json: str, json_col: str = "props",
                 keep_cols: Optional[List[str]] = None):
        self.v = compile_validator(schema_from_json(schema_json))
        self.json_col = json_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.json_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.to_pylist()
        parsed: List[Any] = []
        ok = np.ones(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            if t is None:
                parsed.append(None)
                continue
            try:
                parsed.append(json.loads(t))
            except ValueError:
                parsed.append(None)
                ok[i] = False
        mask = np.zeros(len(texts), dtype=bool)
        n_viol = np.zeros(len(texts), dtype=np.int32)
        try:
            arr = pa.array(parsed)
            m, viols = self.v.validate(arr)
            mask = m & ok
            for v in viols:
                n_viol += v.fail_mask.astype(np.int32)
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            # OverflowError: a VALID json document can hold an integer
            # > 2^63-1 that pa.array() cannot represent — treat it like any
            # other unconvertible shape, never crash the task
            # heterogeneous document shapes in one batch: group rows by
            # type-shape signature and validate each group as ONE vectorized
            # array — one odd document cannot poison the others, and the
            # fallback stays O(shapes), not O(rows)
            groups: dict = {}
            for i, p in enumerate(parsed):
                if ok[i]:
                    groups.setdefault(_shape_sig(p), []).append(i)
            for idxs in groups.values():
                ii = np.asarray(idxs)
                try:
                    arr = pa.array([parsed[i] for i in idxs])
                except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                    # irregular even within one signature (e.g. a
                    # mixed-element list) or an out-of-int64-range integer:
                    # unrepresentable -> parse-fail
                    ok[ii] = False
                    continue
                m, viols = self.v.validate(arr)
                mask[ii] = m
                nv = np.zeros(len(ii), dtype=np.int32)
                for v in viols:
                    nv += v.fail_mask.astype(np.int32)
                n_viol[ii] += nv
            mask &= ok
        n_viol += (~ok).astype(np.int32)
        out_cols = {}
        names = self.keep_cols or [n for n in batch.schema.names if n != self.json_col]
        for n in names:
            if n in batch.schema.names:
                out_cols[n] = batch.column(n)
        out_cols["json_ok"] = pa.array(ok)
        out_cols["valid"] = pa.array(mask)
        out_cols["n_violations"] = pa.array(n_viol)
        return pa.table(out_cols)


def validate_json_column(ds, schema_json: str, json_col: str = "props",
                         keep_cols: Optional[List[str]] = None,
                         concurrency=(1, 8)):
    return ds.map_batches(
        JsonColumnValidator,
        fn_constructor_kwargs=dict(schema_json=schema_json, json_col=json_col,
                                   keep_cols=keep_cols),
        batch_format="pyarrow", concurrency=concurrency)


def extract_int_field(col: pa.Array, key: str):
    """Vectorized JSON integer-field extraction: one C++ regex pass
    (pc.extract_regex) handles the flat ``{"key": int}`` shape — the
    dominant layout of machine-written event properties — and only the
    rows that DON'T match that strict shape fall back to an exact
    ``json.loads`` (so nesting, floats, strings, or junk never produce a
    wrong value, just the slow path for those rows). Returns
    ``(values int64, valid bool)`` numpy arrays; a missing key, non-int
    value, or null document is invalid. Mirrors DuckDB
    ``CAST(json_extract(props, '$.key') AS BIGINT)`` for integer
    values."""
    import re

    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    vals = np.zeros(n, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    if n == 0:
        return vals, valid
    pat = (r'^\s*\{\s*"' + re.escape(key)
           + r'"\s*:\s*(?P<v>-?\d+)\s*\}\s*$')
    ext = pc.extract_regex(col, pattern=pat)
    hit = pc.is_valid(ext).to_numpy(zero_copy_only=False)
    if hit.any():
        got = pc.struct_field(ext, "v").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vals[hit] = got[hit]
        valid |= hit
    # exact fallback for non-flat rows only (null rows stay invalid)
    miss = ~hit & pc.is_valid(col).to_numpy(zero_copy_only=False)
    if miss.any():
        raw = col.to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(miss):
            try:
                v = json.loads(raw[i]).get(key)
            except (ValueError, AttributeError):
                continue
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            vals[i] = v
            valid[i] = True
    return vals, valid
