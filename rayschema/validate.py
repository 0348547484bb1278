"""Vectorized keyword kernels over Arrow arrays + batch-level helpers.

These are the runtime operators of the engine (SURVEY.md §2.D): each keyword
compiles (compile.py) to a closure built from the kernels here, producing a
per-row boolean *pass mask* (numpy) over a ``pyarrow`` array. Violations are
``batch.filter(~mask)`` annotated with (json_path, keyword, message).

Null convention for flat/struct tables (documented engine semantics, mirrored
by the DuckDB oracles in __ray_entry__.py): a null value means "property
absent" — it fails ``required`` and vacuously PASSES every other keyword.
This resolves the Arrow inability to distinguish JSON null from missing key;
SQL mirrors it naturally (``col IS NULL OR predicate``).

Draft-07 semantics faithfully kept (reference cited per kernel):
* ``pattern`` is an UNANCHORED search (Go regexp.MatchString semantics;
  resources/schema/draft-07.json pattern keyword) — "xxbxx" matches "[abc]".
* ``minLength``/``maxLength`` count Unicode code points, not bytes.
* ``type: integer`` accepts whole-valued floats (JSON has one number type).
* ``multipleOf`` uses float64 arithmetic with relative tolerance (the
  reference stores it as *float64, entities.go:28).
"""

from __future__ import annotations

import json
import math
import re
from typing import Callable, Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------- masks


def ensure_array(arr) -> pa.Array:
    """Combine a ChunkedArray into one contiguous Array (zero-copy slices)."""
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def bool_mask(arr: Optional[pa.Array], n: int, null_fill: bool = True) -> np.ndarray:
    """pa boolean array -> numpy bool, nulls -> null_fill."""
    if arr is None:
        return np.full(n, null_fill, dtype=bool)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null(null_fill)
    return arr.to_numpy(zero_copy_only=False).astype(bool, copy=False)


def valid_mask(arr: pa.Array) -> np.ndarray:
    """Per-row is-not-null (presence) mask."""
    return bool_mask(pc.is_valid(arr), len(arr), null_fill=False)


def all_true(n: int) -> np.ndarray:
    return np.ones(n, dtype=bool)


def all_false(n: int) -> np.ndarray:
    return np.zeros(n, dtype=bool)


# --------------------------------------------------------------------------- list segments


def list_offsets(arr: pa.Array) -> np.ndarray:
    """Logical offsets (len n+1) of a list-like array, honoring the array's
    own offset/validity; fixed_size_list synthesized."""
    if isinstance(arr, pa.FixedSizeListArray):
        size = arr.type.list_size
        return np.arange(len(arr) + 1, dtype=np.int64) * size
    # ListArray / LargeListArray / MapArray expose .offsets relative to values
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return off


def list_flatten(arr: pa.Array) -> pa.Array:
    """Child values aligned with list_offsets (NOT dropping null-row gaps)."""
    if isinstance(arr, pa.FixedSizeListArray):
        # .values keeps slots for null rows (len n*size), matching the
        # synthesized offsets; .flatten() would DROP null-row slots and
        # misalign every following segment
        size = arr.type.list_size
        return ensure_array(arr.values.slice(arr.offset * size, len(arr) * size))
    # .values honors offsets window alignment for List/LargeList/Map
    values = arr.values
    off = arr.offsets
    lo = off[0].as_py()
    hi = off[len(arr)].as_py()
    return ensure_array(values.slice(lo, hi - lo))


def segment_ids(offsets: np.ndarray) -> np.ndarray:
    """Element -> row id, from offsets (normalized so offsets[0] == 0)."""
    lengths = np.diff(offsets)
    return np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)


def segment_all(elem_mask: np.ndarray, offsets: np.ndarray, empty: bool = True) -> np.ndarray:
    """Per-row AND-reduce of an element-level mask."""
    n = len(offsets) - 1
    if len(elem_mask) == 0:
        return np.full(n, empty, dtype=bool)
    fails = np.zeros(n, dtype=np.int64)
    seg = segment_ids(offsets)
    np.add.at(fails, seg, (~elem_mask).astype(np.int64))
    return fails == 0


def segment_any(elem_mask: np.ndarray, offsets: np.ndarray, empty: bool = False) -> np.ndarray:
    """Per-row OR-reduce of an element-level mask."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.int64)
    if len(elem_mask):
        np.add.at(out, segment_ids(offsets), elem_mask.astype(np.int64))
    res = out > 0
    if empty:
        res |= np.diff(offsets) == 0
    return res


# --------------------------------------------------------------------------- type tags

_STRINGY = "string"


def arrow_simple_type(t: pa.DataType) -> Optional[str]:
    """Arrow type -> draft-07 SimpleType (SURVEY.md §1.3 mapping; the engine
    analog of kindSwitch reflect.go:839-973 and well-knowns reflect.go:742-776).
    Temporal and binary types serialize as strings with a format."""
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "number"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _STRINGY
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return _STRINGY  # format: base64 / uuid (reflect.go:754-758)
    if pa.types.is_temporal(t):
        return _STRINGY  # format: date / date-time (reflect.go:761-773)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "array"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "object"
    if pa.types.is_null(t):
        return "null"
    if pa.types.is_dictionary(t):
        return arrow_simple_type(t.value_type)
    return None


def is_stringish(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def is_listish(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)


def is_numberish(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)


def type_check_mask(arr: pa.Array, allowed: list) -> np.ndarray:
    """``type`` keyword (entities.go:53): static Arrow-type tag compare, plus
    the per-row whole-valued-float check when ``integer`` is required of a
    float column. Nulls pass (absent convention)."""
    n = len(arr)
    tag = arrow_simple_type(arr.type)
    if tag is None:
        return all_false(n) | ~valid_mask(arr)
    if tag in allowed:
        return all_true(n)
    # JSON has ONE number type: "number" accepts integer values
    # (draft-07 §6.1.1; caught by the meta-schema self-conformance gate)
    if tag == "integer" and "number" in allowed:
        return all_true(n)
    if tag == "number" and "integer" in allowed and (
        pa.types.is_floating(arr.type) or pa.types.is_decimal(arr.type)
    ):
        f = arr.cast(pa.float64())
        whole = pc.equal(pc.floor(f), f)
        return bool_mask(whole, n, null_fill=True)
    # static mismatch: every present value violates
    return ~valid_mask(arr)


# --------------------------------------------------------------------------- scalar kernels


def utf8_length(arr: pa.Array) -> pa.Array:
    return pc.utf8_length(arr)


def min_length_mask(arr: pa.Array, bound: int) -> np.ndarray:
    if not is_stringish(arr.type):
        return all_true(len(arr))
    return bool_mask(pc.greater_equal(pc.utf8_length(arr), bound), len(arr))


def max_length_mask(arr: pa.Array, bound: int) -> np.ndarray:
    if not is_stringish(arr.type):
        return all_true(len(arr))
    return bool_mask(pc.less_equal(pc.utf8_length(arr), bound), len(arr))


def pattern_mask(arr: pa.Array, pat: str) -> np.ndarray:
    """Unanchored regex search (draft-07 / Go regexp semantics)."""
    if not is_stringish(arr.type):
        return all_true(len(arr))
    return bool_mask(pc.match_substring_regex(arr, pat), len(arr))


def numeric_cmp_mask(arr: pa.Array, op: str, bound: float) -> np.ndarray:
    if not is_numberish(arr.type):
        return all_true(len(arr))
    f = arr.cast(pa.float64()) if not pa.types.is_floating(arr.type) else arr
    fn = {"ge": pc.greater_equal, "le": pc.less_equal, "gt": pc.greater, "lt": pc.less}[op]
    return bool_mask(fn(f, bound), len(arr))


def multiple_of_mask(arr: pa.Array, m: float) -> np.ndarray:
    """x % m == 0 with float64 tolerance (reference stores multipleOf as
    float64, entities.go:28)."""
    if not is_numberish(arr.type):
        return all_true(len(arr))
    x = ensure_array(arr).cast(pa.float64()).to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = x / m
        ok = np.abs(q - np.round(q)) <= 1e-9 * np.maximum(1.0, np.abs(q))
    ok = np.where(np.isnan(x), True, ok)
    return ok.astype(bool)


def _canonical_json(v) -> str:
    return json.dumps(v, sort_keys=True, separators=(",", ":"))


def _py_value_key(v) -> str:
    # JSON-number equality: 1 == 1.0
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, (int, float)):
        f = float(v)
        return "n:" + repr(int(f) if f == int(f) and math.isfinite(f) else f)
    if isinstance(v, str):
        return "s:" + v
    if v is None:
        return "z"
    return "j:" + _canonical_json(v)


def enum_mask(arr: pa.Array, values: list) -> np.ndarray:
    """``enum`` via pc.is_in for scalar columns; canonical-JSON compare for
    composite members (rare, falls back to a per-row loop)."""
    n = len(arr)
    t = arr.type
    scalars = [v for v in values if isinstance(v, (str, int, float, bool)) or v is None]
    if len(scalars) == len(values):
        try:
            if is_stringish(t):
                vs = pa.array([v for v in values if isinstance(v, str)], type=t)
                return bool_mask(pc.is_in(arr, value_set=vs), n)
            if is_numberish(t):
                # +0.0 normalizes IEEE -0.0 so the hash-based is_in matches
                # JSON numeric equality (-0 == 0); pc.equal would already
                # agree but is_in hashes bit patterns.
                nums = [float(v) + 0.0 for v in values if isinstance(v, (int, float)) and not isinstance(v, bool)]
                vs = pa.array(nums, type=pa.float64())
                f = pc.add(arr.cast(pa.float64()), 0.0)
                return bool_mask(pc.is_in(f, value_set=vs), n)
            if pa.types.is_boolean(t):
                vs = pa.array([v for v in values if isinstance(v, bool)], type=pa.bool_())
                return bool_mask(pc.is_in(arr, value_set=vs), n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
    # composite / mixed fallback
    keys = {_py_value_key(v) for v in values}
    out = np.empty(n, dtype=bool)
    pylist = arr.to_pylist()
    if _type_contains_map(t):
        # MapArray.to_pylist yields [(k, v), ...] tuples, not dicts —
        # normalize (driven by the Arrow type tree, so a map nested in a
        # list/struct converts and an empty *list* value stays a list) so
        # canonical-JSON keys match dict-valued enum/const members
        # (draft-07 object equality)
        pylist = [_canon_by_type(v, t) for v in pylist]
    for i, v in enumerate(pylist):
        out[i] = True if v is None else _py_value_key(v) in keys
    return out


def _type_contains_map(t: pa.DataType) -> bool:
    if pa.types.is_map(t):
        return True
    if is_listish(t):
        return _type_contains_map(t.value_type)
    if pa.types.is_struct(t):
        return any(_type_contains_map(f.type) for f in t)
    return False


def _canon_by_type(v, t: pa.DataType):
    """Convert MapArray tuple-pairs to dicts wherever the Arrow TYPE is a
    map (not wherever the value merely looks like pairs), recursing through
    list and struct containers."""
    if v is None:
        return None
    if pa.types.is_map(t):
        it = t.item_type
        return {k: _canon_by_type(x, it) for k, x in v}
    if is_listish(t):
        et = t.value_type
        return [_canon_by_type(x, et) for x in v]
    if pa.types.is_struct(t):
        return {f.name: _canon_by_type(v.get(f.name), f.type) for f in t}
    return v


def const_mask(arr: pa.Array, value) -> np.ndarray:
    n = len(arr)
    if isinstance(value, (str, int, float)) and not isinstance(value, bool):
        try:
            if is_numberish(arr.type) and isinstance(value, (int, float)):
                return bool_mask(pc.equal(arr.cast(pa.float64()), float(value)), n)
            if is_stringish(arr.type) and isinstance(value, str):
                return bool_mask(pc.equal(arr, value), n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
    return enum_mask(arr, [value])


def unique_items_mask(arr: pa.Array) -> np.ndarray:
    """``uniqueItems`` (entities.go:40): per-row distinct-count == length.
    Vectorized: dictionary-encode flattened values -> integer codes, lexsort
    (row, code), adjacent-equal scan. Composite elements fall back to
    canonical-JSON codes."""
    n = len(arr)
    if not is_listish(arr.type):
        return all_true(n)
    off = list_offsets(arr)
    off = off - off[0]
    flat = list_flatten(arr)
    if len(flat) == 0:
        return all_true(n)
    try:
        codes_arr = pc.dictionary_encode(flat)
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.where(np.asarray(pc.is_null(flat)), -1, codes)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        uniq: Dict[str, int] = {}
        codes = np.empty(len(flat), dtype=np.int64)
        for i, v in enumerate(flat.to_pylist()):
            k = _py_value_key(v)
            codes[i] = uniq.setdefault(k, len(uniq))
    seg = segment_ids(off)
    order = np.lexsort((codes, seg))
    s, c = seg[order], codes[order]
    has_dup = np.zeros(n, dtype=np.int64)
    if len(flat) > 1:
        dup_pos = (s[1:] == s[:-1]) & (c[1:] == c[:-1])
        np.add.at(has_dup, s[1:][dup_pos], 1)
    mask = has_dup == 0
    # null rows pass
    mask |= ~valid_mask(arr)
    return mask


# --------------------------------------------------------------------------- format checkers

# Anchored RE2-compatible patterns; executed via pc.match_substring_regex with
# explicit ^...$ anchors (vectorized in Arrow's RE2).
_FORMAT_REGEX = {
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{2}:\d{2}:\d{2}(\.\d+)?(Z|z|[+-]\d{2}:\d{2})$",
    "date-time": r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|z|[+-]\d{2}:\d{2})?$",
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "hostname": r"^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$",
    "ipv4": r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "ipv6": r"^[0-9A-Fa-f:.]{2,45}$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "uri": r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$",
    "uri-reference": r"^[^\s]*$",
    "json-pointer": r"^(/([^/~]|~0|~1)*)*$",
    "base64": r"^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})?$",
}


def _date_like_mask(arr: pa.Array, fmt: str, regex: str) -> np.ndarray:
    """Regex shape + real calendar validity. The strict-parse analog of
    Date.UnmarshalText (date.go:23-32): Arrow's strptime ROLLS OVER
    out-of-range calendar days (2023-02-29 parses as 2023-03-01) instead
    of erroring, so validity is established by formatting the parse back
    and requiring it to equal the input — rolled-over dates never
    round-trip."""
    shape = bool_mask(pc.match_substring_regex(arr, regex), len(arr))
    parsed = pc.strptime(arr, format=fmt, unit="s", error_is_null=True)
    back = pc.strftime(parsed, format=fmt)
    ok = bool_mask(pc.and_(pc.is_valid(parsed), pc.equal(back, arr)),
                   len(arr), null_fill=False)
    ok |= ~valid_mask(arr)
    return shape & ok


def _regex_format_mask(arr: pa.Array) -> np.ndarray:
    """format: regex — each value must compile; dictionary-encode first so the
    Python re.compile runs once per distinct value."""
    enc = pc.dictionary_encode(arr)
    ok_dict = []
    for v in enc.dictionary.to_pylist():
        try:
            re.compile(v)
            ok_dict.append(True)
        except re.error:
            ok_dict.append(False)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    out = np.ones(len(arr), dtype=bool)
    pres = valid_mask(arr)
    if ok_dict:
        lookup = np.asarray(ok_dict, dtype=bool)
        out[pres] = lookup[idx[pres].astype(np.int64)]
    return out


def format_mask(arr: pa.Array, fmt: str,
                custom: Optional[Dict[str, Callable[[pa.Array], np.ndarray]]] = None) -> np.ndarray:
    """``format`` keyword. The reference treats format as an annotation tied to
    well-known types (reflect.go:742-776); validation here is the engine's
    opt-in runtime extension (compile with validate_formats=True). Unknown
    formats pass (draft-07 annotation semantics)."""
    n = len(arr)
    if not is_stringish(arr.type):
        return all_true(n)
    if custom and fmt in custom:
        return custom[fmt](arr)
    if fmt == "date":
        return _date_like_mask(arr, "%Y-%m-%d", _FORMAT_REGEX["date"])
    if fmt == "regex":
        return _regex_format_mask(arr)
    pat = _FORMAT_REGEX.get(fmt)
    if pat is None:
        return all_true(n)
    return bool_mask(pc.match_substring_regex(arr, pat), n)
