"""Round-4 additions to the draft-07 conformance suite (official
JSON-Schema-Test-Suite corners: signed zero, NUL in strings, boolean
subschema edges, $ref cycles, recursive item schemas), adapted to columnar
subjects like tests/test_draft7_suite.py."""

import json

import pyarrow as pa

from rayschema.compile import compile_validator
from rayschema.serde import schema_from_json


def check(schema: str, arr, expected):
    v = compile_validator(schema_from_json(schema))
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr)
    assert v.probe(arr).tolist() == expected, (schema, arr)


def test_const_zero_matches_negative_zero():
    # draft-07 numeric equality: -0.0 == 0
    check('{"const":0}', [0.0, -0.0, 1.0], [True, True, False])


def test_minimum_with_signed_zero():
    check('{"minimum":0}', [-0.0, 0.0, -0.1], [True, True, False])


def test_const_string_with_nul_character():
    nul = chr(0)
    check(json.dumps({"const": "hello" + nul + "there"}),
          ["hello" + nul + "there", "hellothere"], [True, False])


def test_contains_false_fails_every_array():
    arr = pa.array([[1, 2], []], type=pa.list_(pa.int64()))
    check('{"contains":false}', arr, [False, False])


def test_property_names_true_passes_all():
    mp = pa.array([{"any": "1"}, {}], type=pa.map_(pa.string(), pa.string()))
    check('{"propertyNames":true}', mp, [True, True])


def test_additional_items_ignored_when_items_is_schema():
    # items as a SCHEMA (non-tuple) means additionalItems has no effect
    arr = pa.array([[1, 2, 3]], type=pa.list_(pa.int64()))
    check('{"items":{"minimum":0},"additionalItems":false}', arr, [True])


def test_dependencies_boolean_subschemas():
    t = pa.table({"foo": [1, None], "bar": [1, 2]})
    v = compile_validator(schema_from_json('{"dependencies":{"foo":false}}'))
    # foo present -> false schema -> fail; foo absent -> pass
    assert v.probe(t).tolist() == [False, True]
    v2 = compile_validator(schema_from_json('{"dependencies":{"foo":true}}'))
    assert v2.probe(t).tolist() == [True, True]


def test_unique_items_booleans_not_numbers():
    # draft-07: booleans are NOT numerically equal to 0/1
    arr = pa.array([[True, False], [True, True]], type=pa.list_(pa.bool_()))
    check('{"uniqueItems":true}', arr, [True, False])


def test_ref_cycle_a_b_a_is_guarded():
    # mutually recursive definitions must compile (cycle-safe) and apply
    # the reachable constraints to a flat column
    sch = ('{"definitions":{'
           '"a":{"allOf":[{"$ref":"#/definitions/b"}]},'
           '"b":{"allOf":[{"$ref":"#/definitions/a"},{"minLength":2}]}},'
           '"$ref":"#/definitions/a"}')
    check(sch, ["ab", "a"], [True, False])


def test_recursive_tree_schema_two_levels():
    # self-referential node schema over a nested list column: recursion
    # terminates at the static Arrow type depth
    inner = pa.list_(pa.int64())
    arr = pa.array([[[1, 2], [3]], [[100]]], type=pa.list_(inner))
    sch = ('{"definitions":{"node":{"items":{"$ref":"#/definitions/node"},'
           '"maximum":50}},"$ref":"#/definitions/node"}')
    check(sch, arr, [True, False])


def test_allof_items_intersection():
    arr = pa.array([[2, 4], [2, 5]], type=pa.list_(pa.int64()))
    sch = ('{"allOf":[{"items":{"multipleOf":2}},'
           '{"items":{"maximum":10}}]}')
    check(sch, arr, [True, False])


def test_pattern_with_backslash_escapes():
    check(json.dumps({"pattern": "^\\d+\\.\\d+$"}),
          ["1.5", "15", "a.b"], [True, False, False])


def test_enum_array_member_on_list_column():
    arr = pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))
    check('{"enum":[[1,2]]}', arr, [True, False])


def test_if_then_else_inside_oneof():
    # "abc": arm1 if(^a) -> then minLength 3 passes; arm2 const fails -> 1
    # "ab":  arm1 then fails; arm2 fails -> 0 arms -> False
    # "z":   arm1 else maxLength 1 passes; arm2 fails -> 1 -> True
    # "zz":  arm1 else fails (len 2); arm2 const "zz" passes -> 1 -> True
    # "yy":  arm1 else fails; arm2 fails -> False
    sch = ('{"oneOf":[{"if":{"pattern":"^a"},"then":{"minLength":3},'
           '"else":{"maxLength":1}},{"const":"zz"}]}')
    check(sch, ["abc", "ab", "z", "zz", "yy"],
          [True, False, True, True, False])


def test_max_properties_zero_rejects_any_key():
    mp = pa.array([{}, {"a": "1"}], type=pa.map_(pa.string(), pa.string()))
    check('{"maxProperties":0}', mp, [True, False])


def test_multiple_of_with_large_magnitude():
    check('{"multipleOf":1e10}', [1e10, 2e10, 1.5e10],
          [True, True, False])


def test_not_inside_items():
    arr = pa.array([["x", "yy"], ["zzz"]], type=pa.list_(pa.string()))
    check('{"items":{"not":{"minLength":3}}}', arr, [True, False])


def test_exclusive_bounds_numeric_form_pair():
    check('{"exclusiveMinimum":2,"exclusiveMaximum":4}',
          [2.0, 3.0, 4.0], [False, True, False])


def test_required_many_keys_all_must_be_present():
    t = pa.table({"a": [1, 1, None], "b": [1, None, 1]})
    v = compile_validator(schema_from_json('{"required":["a","b"]}'))
    assert v.probe(t).tolist() == [True, False, False]


def test_type_array_with_boolean_member():
    arr = pa.array([True, False], type=pa.bool_())
    check('{"type":["boolean","string"]}', arr, [True, True])
