"""JSON <-> Schema IR serialization with unknown-key round-trip fidelity.

Mirrors the reference's two-pass decode (/root/reference/entities.go:553-606):
a typed pass over the known draft-07 keywords plus a raw pass that captures
every unmatched key into ``extra_properties`` (entities.go:584-601 against the
``knownKeysSchema`` list entities.go:504-550), including the explicit-null
``default``/``const`` disambiguation (entities.go:570-582). Serialization
merges typed keywords with extra properties (entities.go:609-615 MarshalJSON +
entities.go:926-972 marshalUnion).

Divergence noted: the reference's known-key list omits ``writeOnly`` and
``deprecated`` so those land in BOTH the typed field and ExtraProperties; the
marshalled JSON is equal either way (duplicate keys carry identical values), so
we treat them as known keys — round-trip JSON equality is preserved
(entities_test.go:83-107).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Union

from rayschema.ir import (
    ABSENT,
    DependencyType,
    ItemsType,
    Schema,
    SchemaOrBool,
    validate_simple_type,
)

# (json_key, attr, kind) in the reference's declaration order (entities.go:17-63).
# kind drives both parse coercion and serialization.
_KEYWORDS = [
    ("$id", "id", "str"),
    ("$schema", "schema", "str"),
    ("$ref", "ref", "str"),
    ("$comment", "comment", "str"),
    ("title", "title", "str"),
    ("description", "description", "str"),
    ("default", "default", "raw_nullable"),
    ("readOnly", "read_only", "bool"),
    ("writeOnly", "write_only", "bool"),
    ("deprecated", "deprecated", "bool"),
    ("examples", "examples", "raw_list"),
    ("multipleOf", "multiple_of", "num"),
    ("maximum", "maximum", "num"),
    ("exclusiveMaximum", "exclusive_maximum", "num"),
    ("minimum", "minimum", "num"),
    ("exclusiveMinimum", "exclusive_minimum", "num"),
    ("maxLength", "max_length", "int"),
    ("minLength", "min_length", "int0"),
    ("pattern", "pattern", "str"),
    ("additionalItems", "additional_items", "sob"),
    ("items", "items", "items"),
    ("maxItems", "max_items", "int"),
    ("minItems", "min_items", "int0"),
    ("uniqueItems", "unique_items", "bool"),
    ("contains", "contains", "sob"),
    ("maxProperties", "max_properties", "int"),
    ("minProperties", "min_properties", "int0"),
    ("required", "required", "str_list"),
    ("additionalProperties", "additional_properties", "sob"),
    ("definitions", "definitions", "sob_map"),
    ("properties", "properties", "sob_map"),
    ("patternProperties", "pattern_properties", "sob_map"),
    ("dependencies", "dependencies", "dep_map"),
    ("propertyNames", "property_names", "sob"),
    ("const", "const", "raw_nullable"),
    ("enum", "enum", "raw_list"),
    ("type", "type", "type"),
    ("format", "format", "str"),
    ("contentMediaType", "content_media_type", "str"),
    ("contentEncoding", "content_encoding", "str"),
    ("if", "if_", "sob"),
    ("then", "then", "sob"),
    ("else", "else_", "sob"),
    ("allOf", "all_of", "sob_list"),
    ("anyOf", "any_of", "sob_list"),
    ("oneOf", "one_of", "sob_list"),
    ("not", "not_", "sob"),
]

KNOWN_KEYS = [k for k, _, _ in _KEYWORDS]


# --------------------------------------------------------------------------- parse
def schema_or_bool_from(v: Any) -> SchemaOrBool:
    """SchemaOrBool decode: try object then bool (entities.go:647-675)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, dict):
        return schema_from_dict(v)
    raise ValueError(f"SchemaOrBool expects object or bool, got {type(v).__name__}")


def _items_from(v: Any) -> ItemsType:
    """Items decode: SchemaOrBool | [SchemaOrBool] (entities.go:716-736)."""
    if isinstance(v, list):
        return [schema_or_bool_from(x) for x in v]
    return schema_or_bool_from(v)


def _dependency_from(v: Any) -> DependencyType:
    """Dependencies value: SchemaOrBool | [str] (entities.go:778-798)."""
    if isinstance(v, list):
        out = []
        for x in v:
            if not isinstance(x, str):
                raise ValueError("dependencies string-array arm must contain strings")
            out.append(x)
        return out
    return schema_or_bool_from(v)


def _type_from(v: Any) -> Union[str, List[str]]:
    """Type decode: SimpleType | [SimpleType] (entities.go:831-851)."""
    if isinstance(v, list):
        return [validate_simple_type(x) for x in v]
    if isinstance(v, str):
        return validate_simple_type(v)
    raise ValueError(f"type expects string or array of strings, got {type(v).__name__}")


def _int_of(v: Any, key: str) -> int:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ValueError(f"{key} expects integer, got {v!r}")
    if isinstance(v, float):
        if not v.is_integer():
            raise ValueError(f"{key} expects integer, got {v!r}")
        v = int(v)
    return v


def _num_of(v: Any, key: str) -> float:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ValueError(f"{key} expects number, got {v!r}")
    return float(v)


def schema_from_dict(d: Dict[str, Any]) -> Schema:
    """Typed + raw two-pass decode of one schema object (entities.go:553-606)."""
    if not isinstance(d, dict):
        raise ValueError(f"schema object expected, got {type(d).__name__}")
    s = Schema()
    for key, attr, kind in _KEYWORDS:
        if key not in d:
            continue
        v = d[key]
        if kind == "str":
            if not isinstance(v, str):
                raise ValueError(f"{key} expects string, got {type(v).__name__}")
            setattr(s, attr, v)
        elif kind == "bool":
            if not isinstance(v, bool):
                raise ValueError(f"{key} expects boolean, got {type(v).__name__}")
            setattr(s, attr, v)
        elif kind == "num":
            setattr(s, attr, _num_of(v, key))
        elif kind == "int":
            setattr(s, attr, _int_of(v, key))
        elif kind == "int0":
            setattr(s, attr, _int_of(v, key))
        elif kind == "raw_nullable":
            # present (even as null) vs absent distinction (entities.go:570-582)
            setattr(s, attr, v)
        elif kind == "raw_list":
            if not isinstance(v, list):
                raise ValueError(f"{key} expects array")
            setattr(s, attr, list(v))
        elif kind == "str_list":
            if not isinstance(v, list) or not all(isinstance(x, str) for x in v):
                raise ValueError(f"{key} expects array of strings")
            setattr(s, attr, list(v))
        elif kind == "sob":
            setattr(s, attr, schema_or_bool_from(v))
        elif kind == "sob_list":
            if not isinstance(v, list):
                raise ValueError(f"{key} expects array")
            setattr(s, attr, [schema_or_bool_from(x) for x in v])
        elif kind == "sob_map":
            if not isinstance(v, dict):
                raise ValueError(f"{key} expects object")
            setattr(s, attr, {k: schema_or_bool_from(x) for k, x in v.items()})
        elif kind == "dep_map":
            if not isinstance(v, dict):
                raise ValueError(f"{key} expects object")
            setattr(s, attr, {k: _dependency_from(x) for k, x in v.items()})
        elif kind == "items":
            setattr(s, attr, _items_from(v))
        elif kind == "type":
            setattr(s, attr, _type_from(v))
        else:  # pragma: no cover
            raise AssertionError(kind)
    # raw pass: every unmatched key -> extra_properties (entities.go:584-601)
    known = set(KNOWN_KEYS)
    for key, v in d.items():
        if key not in known:
            s.extra_properties[key] = v
    return s


def schema_from_json(text: Union[str, bytes]) -> SchemaOrBool:
    """Decode a schema document (object or boolean schema) from JSON text."""
    return schema_or_bool_from(json.loads(text))


# --------------------------------------------------------------------------- serialize
def _sob_to_jsonable(v: SchemaOrBool) -> Any:
    if isinstance(v, bool):
        return v
    return schema_to_dict(v)


def schema_to_dict(s: Schema) -> Dict[str, Any]:
    """Schema -> plain JSON-able dict, keywords in declaration order then
    extra properties (entities.go:609-615 + marshalUnion entities.go:926-972).
    """
    out: Dict[str, Any] = {}
    for key, attr, kind in _KEYWORDS:
        v = getattr(s, attr)
        if kind == "raw_nullable":
            if v is ABSENT:
                continue
            out[key] = v
            continue
        if kind == "int0":
            if v:  # omitempty: zero not serialized (entities.go:34,39,43)
                out[key] = v
            continue
        if v is None:
            continue
        if kind in ("str", "bool", "num", "int", "raw_list", "str_list", "type"):
            out[key] = v
        elif kind == "sob":
            out[key] = _sob_to_jsonable(v)
        elif kind == "sob_list":
            out[key] = [_sob_to_jsonable(x) for x in v]
        elif kind == "sob_map":
            out[key] = {k: _sob_to_jsonable(x) for k, x in v.items()}
        elif kind == "dep_map":
            out[key] = {
                k: (list(x) if isinstance(x, list) else _sob_to_jsonable(x))
                for k, x in v.items()
            }
        elif kind == "items":
            if isinstance(v, list):
                out[key] = [_sob_to_jsonable(x) for x in v]
            else:
                out[key] = _sob_to_jsonable(v)
        else:  # pragma: no cover
            raise AssertionError(kind)
    for key in sorted(s.extra_properties):
        out[key] = s.extra_properties[key]
    return out


def schema_to_json(s: SchemaOrBool, indent: Any = None) -> str:
    """Canonical JSON text of a schema document (JSONSchemaBytes analog,
    helper.go:313-320)."""
    if isinstance(s, bool):
        return "true" if s else "false"
    return json.dumps(schema_to_dict(s), indent=indent, separators=(",", ":") if indent is None else None)


def drop_zero_mins(v: Any) -> Any:
    """Normalize the zero-default non-pointer semantic (entities.go:34,39,43):
    an explicit ``"minLength": 0`` (minItems/minProperties likewise) is
    identical to absent and is not re-serialized — drop before JSON compare."""
    if isinstance(v, dict):
        return {k: drop_zero_mins(x) for k, x in v.items()
                if not (k in ("minLength", "minItems", "minProperties") and x == 0)}
    if isinstance(v, list):
        return [drop_zero_mins(x) for x in v]
    return v


def json_equal(a: Any, b: Any) -> bool:
    """Order/format-insensitive JSON equality (assertjson.Equal analog)."""
    if isinstance(a, (str, bytes)):
        a = json.loads(a)
    if isinstance(b, (str, bytes)):
        b = json.loads(b)
    return _norm(a) == _norm(b)


def _norm(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        f = float(v)
        return int(f) if f.is_integer() else f
    return v
