"""Validator-compiler tests: per-keyword masks over small Arrow tables
(SURVEY.md §2.D), applicators, nested recursion, $ref cycles, map columns,
and the reference's semantic quirks (unanchored pattern, integer-accepts-whole-
floats, code-point lengths, multipleOf tolerance)."""

import numpy as np
import pyarrow as pa
import pytest

from rayschema.compile import compile_validator
from rayschema.serde import schema_from_json


def masks(schema_text: str, table: pa.Table):
    return compile_validator(schema_from_json(schema_text)).validate(table)


def probe_col(schema_text: str, arr) -> list:
    v = compile_validator(schema_from_json(schema_text))
    return v.probe(pa.array(arr) if isinstance(arr, list) else arr).tolist()


def test_numeric_keywords():
    assert probe_col('{"minimum":3}', [2.0, 3.0, 4.0, None]) == [False, True, True, True]
    assert probe_col('{"exclusiveMinimum":3}', [3.0, 3.1]) == [False, True]
    assert probe_col('{"maximum":3}', [3.0, 3.1]) == [True, False]
    assert probe_col('{"exclusiveMaximum":3}', [2.9, 3.0]) == [True, False]
    assert probe_col('{"multipleOf":0.1}', [0.3, 0.35]) == [True, False]
    assert probe_col('{"multipleOf":3}', [9, 10]) == [True, False]


def test_string_keywords():
    # minLength counts code points, not bytes
    assert probe_col('{"minLength":2}', ["éé", "é", "ab", None]) == [True, False, True, True]
    assert probe_col('{"maxLength":2}', ["ééé", "éé"]) == [False, True]
    # unanchored pattern search (draft-07 / Go regexp semantics)
    assert probe_col('{"pattern":"[abc]"}', ["xxbxx", "xyz"]) == [True, False]
    assert probe_col('{"pattern":"^ab$"}', ["ab", "xab"]) == [True, False]


def test_type_keyword():
    assert probe_col('{"type":"integer"}', [1.0, 1.5]) == [True, False]  # whole floats ok
    assert probe_col('{"type":"number"}', [1.5, 2.0]) == [True, True]
    assert probe_col('{"type":"string"}', ["a", None]) == [True, True]
    assert probe_col('{"type":"integer"}', ["a", None]) == [False, True]  # static mismatch
    # temporal / binary columns count as string (format-carrying)
    assert probe_col('{"type":"string"}', pa.array([1], type=pa.date32())) == [True]


def test_enum_const():
    assert probe_col('{"enum":["foo","bar"]}', ["foo", "baz", None]) == [True, False, True]
    assert probe_col('{"enum":[1,2.5]}', [1.0, 2.5, 3.0]) == [True, True, False]
    assert probe_col('{"const":"x"}', ["x", "y"]) == [True, False]
    assert probe_col('{"const":5}', [5.0, 5.1]) == [True, False]
    # composite enum members via canonical-JSON compare
    arr = pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))
    assert probe_col('{"enum":[[1,2]]}', arr) == [True, False]
    # IEEE -0.0 equals 0 under JSON numeric equality (hash-based is_in
    # would otherwise split the bit patterns; caught by Hypothesis)
    assert probe_col('{"enum":[0]}', [-0.0, 0.0]) == [True, True]
    assert probe_col('{"const":0}', [-0.0]) == [True]
    assert probe_col('{"enum":[-0.0]}', [0.0, 1.0]) == [True, False]


def test_array_keywords():
    arr = pa.array([[1, 2], [1, 1], [], None], type=pa.list_(pa.int64()))
    assert probe_col('{"minItems":1}', arr) == [True, True, False, True]
    assert probe_col('{"maxItems":1}', arr) == [False, False, True, True]
    assert probe_col('{"uniqueItems":true}', arr) == [True, False, True, True]
    assert probe_col('{"items":{"minimum":2}}', arr) == [False, False, True, True]
    assert probe_col('{"contains":{"const":1}}', arr) == [True, True, False, True]


def test_tuple_items_additional_items():
    arr = pa.array([[1.5, 2], [1.5, 2, 99], [1.5, 2.5]], type=pa.list_(pa.float64()))
    sch = '{"items":[{"type":"number"},{"type":"integer"}],"additionalItems":false}'
    assert probe_col(sch, arr) == [True, False, False]
    sch2 = '{"items":[{"type":"number"},{"type":"integer"}],"additionalItems":{"maximum":10}}'
    assert probe_col(sch2, arr) == [True, False, False]


def test_nested_list_of_list():
    arr = pa.array([[[1.23, 4.56]], [[9.0]]], type=pa.list_(pa.list_(pa.float64())))
    assert probe_col('{"items":{"items":{"enum":[1.23,4.56]}}}', arr) == [True, False]


def test_object_keywords_on_table():
    t = pa.table({"a": [1, None, 3], "b": ["x", "y", None]})
    m, viol = masks('{"required":["a","b"]}', t)
    assert m.tolist() == [True, False, False]
    m, _ = masks('{"dependencies":{"a":["b"]}}', t)
    assert m.tolist() == [True, True, False]
    m, _ = masks('{"additionalProperties":false,"properties":{"a":{}}}', t)
    assert m.tolist() == [False, False, True]  # b present -> violation
    m, _ = masks('{"minProperties":2}', t)
    assert m.tolist() == [True, False, False]


def test_required_missing_column_fails_all():
    t = pa.table({"a": [1, 2]})
    m, viol = masks('{"required":["zzz"]}', t)
    assert m.tolist() == [False, False]
    assert viol[0].keyword == "required"


def test_struct_recursion():
    typ = pa.struct([("a", pa.struct([("b", pa.int64())]))])
    deep = pa.array([{"a": {"b": 1}}, {"a": None}, None], type=typ)
    sch = ('{"type":"object","properties":{"deep":{"type":"object","required":["a"],'
           '"properties":{"a":{"type":"object","required":["b"]}}}}}')
    m, _ = masks(sch, pa.table({"deep": deep}))
    assert m.tolist() == [True, False, True]  # whole-null struct = absent -> passes


def test_map_column_keywords():
    mp = pa.array([{"ab": "abc"}, {"XY": "zzz"}, {}],
                  type=pa.map_(pa.string(), pa.string()))
    sch = ('{"type":"object","properties":{"m":{"type":"object","minProperties":1,'
           '"propertyNames":{"pattern":"^[a-z]+$"},'
           '"additionalProperties":{"enum":["abc","def"]}}}}')
    m, _ = masks(sch, pa.table({"m": mp}))
    assert m.tolist() == [True, False, False]


def test_map_pattern_properties_and_required():
    mp = pa.array([{"xa": "1"}, {"other": "nope"}],
                  type=pa.map_(pa.string(), pa.string()))
    sch = ('{"type":"object","properties":{"m":{'
           '"patternProperties":{"^x":{"pattern":"^[0-9]+$"}},"required":["xa"]}}}')
    m, _ = masks(sch, pa.table({"m": mp}))
    assert m.tolist() == [True, False]


def test_map_null_value_is_absent():
    """Null-valued map entries follow the engine's null-as-absent convention
    (as on struct/table subjects): an unmatched or bad-name KEY whose value
    is null does not violate additionalProperties / propertyNames."""
    mp = pa.array([{"BAD": None}, {"BAD": "x"}, {"ok": "v", "ZZ": None}],
                  type=pa.map_(pa.string(), pa.string()))
    sch = ('{"type":"object","properties":{"m":{'
           '"propertyNames":{"pattern":"^[a-z]+$"},'
           '"properties":{"ok":{"type":"string"}},'
           '"additionalProperties":false}}}')
    m, _ = masks(sch, pa.table({"m": mp}))
    assert m.tolist() == [True, False, True]


def test_enum_map_canonicalization_by_type():
    """Tuple->dict canonicalization is driven by the Arrow TYPE tree:
    an empty LIST value inside a map must stay a list (not become {}),
    and a map nested inside a list converts to a dict for enum equality."""
    from rayschema.validate import enum_mask

    # map<string, list<int>> — empty-list value must not canonicalize to {}
    mp = pa.array([{"k": []}, {"k": [1]}],
                  type=pa.map_(pa.string(), pa.list_(pa.int64())))
    m = enum_mask(mp, [{"k": {}}])
    assert m.tolist() == [False, False]
    m = enum_mask(mp, [{"k": []}])
    assert m.tolist() == [True, False]

    # list<map<string,string>> — nested map converts to dict
    lm = pa.array([[{"a": "x"}], [{"b": "y"}]],
                  type=pa.list_(pa.map_(pa.string(), pa.string())))
    m = enum_mask(lm, [[{"a": "x"}]])
    assert m.tolist() == [True, False]

    # struct<m: map<string,string>> — map inside struct converts
    st = pa.array([{"m": {"a": "x"}}, {"m": {"b": "y"}}],
                  type=pa.struct([("m", pa.map_(pa.string(), pa.string()))]))
    m = enum_mask(st, [{"m": {"a": "x"}}])
    assert m.tolist() == [True, False]


def test_applicators():
    t = pa.table({"n": [3.0, 5.0, 15.0, 7.0, None]})
    m, _ = masks('{"properties":{"n":{"oneOf":[{"multipleOf":3},{"multipleOf":5}]}}}', t)
    assert m.tolist() == [True, True, False, False, True]
    m, _ = masks('{"properties":{"n":{"anyOf":[{"multipleOf":3},{"multipleOf":5}]}}}', t)
    assert m.tolist() == [True, True, True, False, True]
    m, _ = masks('{"properties":{"n":{"allOf":[{"minimum":4},{"multipleOf":5}]}}}', t)
    assert m.tolist() == [False, True, True, False, True]
    m, _ = masks('{"properties":{"n":{"not":{"minimum":10}}}}', t)
    assert m.tolist() == [True, True, False, True, True]


def test_if_then_else():
    t = pa.table({"v": ["abc", "ab", "x", "xyz", None]})
    sch = '{"properties":{"v":{"if":{"pattern":"^a"},"then":{"minLength":3},"else":{"maxLength":2}}}}'
    m, _ = masks(sch, t)
    assert m.tolist() == [True, False, True, False, True]


def test_boolean_schemas_as_subschemas():
    t = pa.table({"a": [1, None]})
    m, _ = masks('{"properties":{"a":false}}', t)
    assert m.tolist() == [False, True]  # null = absent passes the false schema
    m, _ = masks('{"properties":{"a":true}}', t)
    assert m.tolist() == [True, True]


def test_recursive_ref():
    sch = ('{"definitions":{"node":{"required":["val"],"properties":{'
           '"val":{"type":"integer"},"kids":{"items":{"$ref":"#/definitions/node"}}}}},'
           '"properties":{"tree":{"$ref":"#/definitions/node"}}}')
    typ = pa.struct([("val", pa.int64()),
                     ("kids", pa.list_(pa.struct([("val", pa.int64())])))])
    tree = pa.array([{"val": 1, "kids": [{"val": 2}]},
                     {"val": None, "kids": []},
                     {"val": 3, "kids": [{"val": None}]}], type=typ)
    m, viol = masks(sch, pa.table({"tree": tree}))
    assert m.tolist() == [True, False, False]
    kws = {(v.path, v.keyword) for v in viol}
    assert ("#/definitions/node/required/val", "required") in kws


def test_format_validation():
    assert probe_col('{"format":"date"}', ["2020-01-02", "2020-13-40", "x", None]) == \
        [True, False, False, True]
    assert probe_col('{"format":"date-time"}', ["2020-01-02T10:00:00Z", "2020-01-02"]) == \
        [True, False]
    assert probe_col('{"format":"uuid"}', ["123e4567-e89b-12d3-a456-426614174000", "nope"]) == \
        [True, False]
    assert probe_col('{"format":"email"}', ["a@b.co", "a b"]) == [True, False]
    assert probe_col('{"format":"regex"}', ["^a(b", "^ab$"]) == [False, True]
    assert probe_col('{"format":"no-such-format"}', ["anything"]) == [True]


def test_violation_attribution():
    t = pa.table({"amount": [10.5, 10.4, None], "abc": ["xxbxx", "xyz", None]})
    sch = ('{"type":"object","required":["amount"],"properties":{'
           '"amount":{"type":"number","minimum":10.5},'
           '"abc":{"type":"string","pattern":"[abc]"}}}')
    m, viol = masks(sch, t)
    assert m.tolist() == [True, False, False]
    got = {(v.path, v.keyword): v.fail_mask.tolist() for v in viol}
    assert got[("#/required/amount", "required")] == [False, False, True]
    assert got[("#/properties/amount", "minimum")] == [False, True, False]
    assert got[("#/properties/abc", "pattern")] == [False, True, False]


def test_trivial_pruning_compiles_to_const_true():
    # opt-in pruning: trivial (type-only) subtrees become constant-true
    v = compile_validator(schema_from_json('{"type":"string","items":{}}'),
                          prune_trivial=True)
    arr = pa.array([1, 2])  # wrong type, but decode-enforced-type assumption
    assert v.probe(arr).tolist() == [True, True]
    # without pruning the type keyword is enforced
    v2 = compile_validator(schema_from_json('{"type":"string"}'))
    assert v2.probe(arr).tolist() == [False, False]


def test_integer_value_satisfies_number_type():
    # JSON has one number type: integers ARE numbers (draft-07 §6.1.1)
    t = pa.table({"n": pa.array([1, 2, None], type=pa.int64())})
    m, _ = masks('{"properties":{"n":{"type":"number"}}}', t)
    assert m.tolist() == [True, True, True]


def test_meta_schema_self_conformance():
    """The engine analog of the reference's self-conformance gate
    (/root/reference/entities_extra_test.go:14-28): the draft-07 meta-schema
    validates ITSELF, well-formed schema documents pass, malformed ones fail."""
    from rayschema.jsoncol import JsonColumnValidator

    meta = open("/root/reference/resources/schema/draft-07.json").read()
    v = JsonColumnValidator(meta, json_col="doc")
    docs = [meta,                                  # itself
            '{"type": "string", "minLength": 3}',
            'true',                                # boolean schema form
            '{"type": 123}',                       # type must be (array of) string
            '{"multipleOf": 0}',                   # exclusiveMinimum 0
            '{"maxLength": -1}',                   # nonNegativeInteger
            '{"required": "nope"}']                # must be an array
    t = pa.table({"i": list(range(len(docs))),
                  "doc": pa.array(docs, type=pa.string())})
    out = v(t)
    assert out["valid"].to_pylist() == [True, True, True,
                                        False, False, False, False]
