"""Serde round-trip tests.

Ports the reference's test strategy (SURVEY.md §5): generated round-trip
documents (entities_test.go:13-107), the draft-07 meta-schema self-check
(entities_extra_test.go:14-28), boolean schemas and union forms, and the
explicit-null default/const distinction (entities.go:570-582).
"""

import json

import pytest

from rayschema.ir import ABSENT, Schema, from_simple_map, to_simple_map
from rayschema.serde import json_equal, schema_from_json, schema_to_dict, schema_to_json

META_SCHEMA_PATH = "/root/reference/resources/schema/draft-07.json"


def roundtrip(text: str) -> None:
    s = schema_from_json(text)
    out = schema_to_json(s)
    assert json_equal(text, out), f"round-trip mismatch:\n{text}\n{out}"
    # second trip is byte-stable (canonical form)
    assert schema_to_json(schema_from_json(out)) == out


def test_meta_schema_roundtrip():
    # entities_extra_test.go:14-28: the draft-07 meta-schema survives the model
    roundtrip(open(META_SCHEMA_PATH).read())


def test_deep_document_with_unknown_keys():
    doc = {
        "$id": "http://x.test/s", "$schema": "http://json-schema.org/draft-07/schema#",
        "$comment": "c", "title": "t", "description": "d",
        "default": {"a": [1, 2]}, "readOnly": True, "writeOnly": False, "deprecated": True,
        "examples": [1, "two", None], "multipleOf": 2.5, "maximum": 10, "exclusiveMaximum": 11,
        "minimum": 1, "exclusiveMinimum": 0, "maxLength": 5, "minLength": 1,
        "pattern": "^a", "additionalItems": {"type": "string"},
        "items": [{"type": "integer"}, True],
        "maxItems": 3, "minItems": 1, "uniqueItems": True, "contains": {"const": "x"},
        "maxProperties": 9, "minProperties": 1, "required": ["a"],
        "additionalProperties": False,
        "definitions": {"d1": {"type": "null"}},
        "properties": {"a": {"type": ["integer", "null"]}},
        "patternProperties": {"^x": {"type": "boolean"}},
        "dependencies": {"a": ["b"], "c": {"required": ["d"]}},
        "propertyNames": {"pattern": "^[a-z]+$"},
        "const": [1, 2], "enum": ["a", 1, None, {"k": "v"}],
        "type": "object", "format": "email",
        "contentMediaType": "text/plain", "contentEncoding": "base64",
        "if": {"minimum": 0}, "then": {"maximum": 5}, "else": {"maximum": 1},
        "allOf": [True], "anyOf": [{"type": "string"}, False], "oneOf": [{}],
        "not": {"type": "null"},
        "x-unknown": {"deep": [1, {"n": None}]}, "customKeyword": 42,
    }
    roundtrip(json.dumps(doc))
    s = schema_from_json(json.dumps(doc))
    assert s.extra_properties == {"x-unknown": {"deep": [1, {"n": None}]}, "customKeyword": 42}
    assert s.dependencies["a"] == ["b"]
    assert isinstance(s.dependencies["c"], Schema)
    assert s.items[1] is True


def test_boolean_schemas():
    assert schema_from_json("true") is True
    assert schema_from_json("false") is False
    assert schema_to_json(True) == "true"
    # ToSimpleMap: false -> {"not": {}} (helper.go:323-347)
    assert to_simple_map(False) == {"not": {}}
    assert to_simple_map(True) == {}
    s = from_simple_map({"type": "string"})
    assert s.type == "string"


def test_null_default_const_vs_absent():
    # entities.go:570-582: explicit null default/const kept on round trip
    s = schema_from_json('{"default":null,"const":null}')
    assert s.default is None and s.const is None
    assert json.loads(schema_to_json(s)) == {"default": None, "const": None}
    s2 = schema_from_json("{}")
    assert s2.default is ABSENT and s2.const is ABSENT
    assert schema_to_json(s2) == "{}"


def test_zero_default_min_fields_omitted():
    # minLength/minItems/minProperties zero-default non-pointers
    # (entities.go:34,39,43): absent ≡ 0 and 0 not serialized
    s = schema_from_json('{"minLength":0,"minItems":0,"minProperties":0}')
    assert schema_to_json(s) == "{}"
    s = schema_from_json('{"minLength":2}')
    assert json.loads(schema_to_json(s)) == {"minLength": 2}


def test_type_union_forms():
    s = schema_from_json('{"type":["integer","null"]}')
    assert s.type == ["integer", "null"]
    roundtrip('{"type":["integer","null"]}')
    roundtrip('{"type":"string"}')
    with pytest.raises(ValueError):
        schema_from_json('{"type":"integerz"}')


def test_writeonly_deprecated_roundtrip():
    # entities_test.go:83-107
    roundtrip('{"writeOnly":true,"title":"x"}')
    roundtrip('{"deprecated":true}')


def test_type_set_ops():
    s = schema_from_json('{"type":"string"}')
    s.add_type("null")
    assert s.type == ["string", "null"]
    assert s.has_type("null")
    s.remove_type("null")
    assert s.type == "string"
    s.remove_type("string")
    assert s.type is None


def test_schema_to_dict_ordering_stable():
    d = schema_to_dict(schema_from_json('{"zzz":1,"aaa":2,"type":"string","title":"t"}'))
    keys = list(d)
    assert keys == ["title", "type", "aaa", "zzz"]


def test_schema_docs_analysis_batch():
    # schema-documents-as-rows operator (rayschema.schemadocs)
    import pyarrow as pa

    from rayschema.schemadocs import analyze_schema_docs_batch, synth_schema_docs

    t = synth_schema_docs(500)
    out = analyze_schema_docs_batch(t)
    assert out.num_rows == 500
    assert all(out["parse_ok"].to_pylist())
    assert all(out["roundtrip_stable"].to_pylist())
    assert any(out["is_bool_schema"].to_pylist())
    assert any(out["trivial"].to_pylist()) and not all(out["trivial"].to_pylist())
    # determinism
    assert out.equals(analyze_schema_docs_batch(synth_schema_docs(500)))
    bad = pa.table({"schema_id": pa.array([0]),
                    "schema_json": pa.array(['{"type":"zzz"}'])})
    assert analyze_schema_docs_batch(bad)["parse_ok"].to_pylist() == [False]
