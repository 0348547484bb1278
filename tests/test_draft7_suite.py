"""Draft-07 semantics cases in the style of the public JSON-Schema-Test-Suite
(json-schema-org/JSON-Schema-Test-Suite), adapted to columnar subjects and the
engine's null-as-absent convention. Each case: (schema, column values,
expected pass mask)."""

import json

import pyarrow as pa
import pytest

from rayschema.compile import compile_validator
from rayschema.serde import schema_from_json


def check(schema: str, arr, expected):
    v = compile_validator(schema_from_json(schema))
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr)
    assert v.probe(arr).tolist() == expected, (schema, arr)


# ---- applicator interactions ------------------------------------------------
def test_allof_with_base_schema():
    # base keywords AND allOf branches all apply
    check('{"minLength":2,"allOf":[{"pattern":"^a"},{"maxLength":4}]}',
          ["abc", "a", "axxxx", "zbc"],
          [True, False, False, False])


def test_nested_anyof_oneof():
    check('{"anyOf":[{"oneOf":[{"multipleOf":2},{"multipleOf":3}]},{"minimum":100}]}',
          [2.0, 3.0, 6.0, 7.0, 150.0],
          [True, True, False, False, True])  # 6 matches both oneOf arms -> oneOf fails; 150 via minimum


def test_not_with_applicator():
    check('{"not":{"anyOf":[{"pattern":"^a"},{"pattern":"z$"}]}}',
          ["abc", "xyz", "mid"],
          [False, False, True])


def test_if_without_then_else():
    # lone if has no effect
    check('{"if":{"pattern":"^a"}}', ["abc", "zzz"], [True, True])
    # then without if has no effect
    check('{"then":{"minLength":100}}', ["abc"], [True])


def test_oneof_with_boolean_branches():
    # true matches everything; [true,true] -> everything matches 2 -> all fail
    check('{"oneOf":[true,true]}', ["x"], [False])
    check('{"oneOf":[true,false]}', ["x"], [True])


# ---- object keywords --------------------------------------------------------
def test_additional_properties_schema_and_pattern_interaction():
    mp = pa.array([{"foo": "ok", "xbar": "1"}, {"other": "long-value"}],
                  type=pa.map_(pa.string(), pa.string()))
    sch = ('{"properties":{"foo":{}},"patternProperties":{"^x":{"pattern":"^[0-9]+$"}},'
           '"additionalProperties":{"maxLength":3}}')
    check(sch, mp, [True, False])


def test_property_names_with_maxlength():
    mp = pa.array([{"ab": "1"}, {"toolongkey": "1"}],
                  type=pa.map_(pa.string(), pa.string()))
    check('{"propertyNames":{"maxLength":3}}', mp, [True, False])


def test_required_without_properties():
    t = pa.table({"foo": [1, None]})
    v = compile_validator(schema_from_json('{"required":["foo"]}'))
    assert v.probe(t).tolist() == [True, False]


def test_dependencies_schema_form_on_table():
    t = pa.table({"a": [1, None, 3], "b": [1, 2, None]})
    # presence of a requires b present AND a >= 2
    sch = '{"dependencies":{"a":{"required":["b"],"properties":{"a":{"minimum":2}}}}}'
    v = compile_validator(schema_from_json(sch))
    assert v.probe(t).tolist() == [False, True, False]


# ---- array keywords ---------------------------------------------------------
def test_tuple_items_shorter_rows_pass():
    arr = pa.array([[1.0], [], [1.0, 2.0, 3.0]], type=pa.list_(pa.float64()))
    sch = '{"items":[{"type":"number"},{"maximum":5}],"additionalItems":false}'
    check(sch, arr, [True, True, False])


def test_contains_interaction_with_items():
    arr = pa.array([[2, 4, 5], [2, 4], [5]], type=pa.list_(pa.int64()))
    # every item <= 10 AND at least one item == 5
    check('{"items":{"maximum":10},"contains":{"const":5}}',
          arr, [True, False, True])


def test_unique_items_nested_lists():
    arr = pa.array([[[1], [2]], [[1], [1]]], type=pa.list_(pa.list_(pa.int64())))
    check('{"uniqueItems":true}', arr, [True, False])


def test_min_max_items_with_nulls_inside():
    arr = pa.array([[1, None], [None], []], type=pa.list_(pa.int64()))
    check('{"minItems":1}', arr, [True, True, False])
    # null ELEMENTS vacuously pass item subschemas (engine convention)
    check('{"items":{"minimum":0}}', arr, [True, True, True])


# ---- numeric edge cases -----------------------------------------------------
def test_exclusive_bounds_edges():
    check('{"exclusiveMinimum":0,"exclusiveMaximum":10}',
          [0.0, 0.0001, 9.9999, 10.0],
          [False, True, True, False])


def test_multiple_of_fractional():
    check('{"multipleOf":0.01}', [0.07, 0.075], [True, False])


def test_integer_rejects_fractional_accepts_negative_whole():
    check('{"type":"integer"}', [-2.0, -2.5, 0.0], [True, False, True])


# ---- enum / const edge cases ------------------------------------------------
def test_enum_heterogeneous_members():
    # string column against mixed-type enum: only string members can match
    check('{"enum":[1,"1",true]}', ["1", "2"], [True, False])
    check('{"enum":[1,"1"]}', [1.0, 2.0], [True, False])


def test_const_number_equality_across_int_float():
    check('{"const":1}', [1.0, 1.5], [True, False])


# ---- $ref edge cases --------------------------------------------------------
def test_ref_to_root():
    sch = ('{"type":"object","properties":{"child":{"$ref":"#"}},'
           '"required":["v"],"properties":{"v":{"type":"integer"},'
           '"child":{"$ref":"#"}}}')
    typ = pa.struct([("v", pa.int64()),
                     ("child", pa.struct([("v", pa.int64())]))])
    arr = pa.array([{"v": 1, "child": {"v": 2}},
                    {"v": 1, "child": {"v": None}},
                    {"v": None, "child": None}], type=typ)
    t = pa.table({"v": pa.array([1, 1, None]), "child": arr})
    v = compile_validator(schema_from_json(sch))
    # row0: ok; row1: child.v missing -> child fails required; row2: v missing
    assert v.probe(t).tolist() == [True, False, False]


def test_ref_chain_through_definitions():
    sch = ('{"definitions":{"a":{"$ref":"#/definitions/b"},'
           '"b":{"minimum":5}},'
           '"properties":{"n":{"$ref":"#/definitions/a"}}}')
    t = pa.table({"n": [10.0, 1.0]})
    v = compile_validator(schema_from_json(sch))
    assert v.probe(t).tolist() == [True, False]


# ---- format opt-out ---------------------------------------------------------
def test_format_annotation_only_mode():
    v = compile_validator(schema_from_json('{"format":"date"}'),
                          validate_formats=False)
    assert v.probe(pa.array(["not-a-date"])).tolist() == [True]


def test_custom_format_checker():
    import numpy as np

    def even_len(arr):
        import pyarrow.compute as pc

        return (pc.utf8_length(arr).to_numpy(zero_copy_only=False) % 2 == 0)

    v = compile_validator(schema_from_json('{"format":"even"}'),
                          custom_formats={"even": even_len})
    assert v.probe(pa.array(["ab", "abc"])).tolist() == [True, False]


def test_custom_keyword_handler():
    def handler(schema, arr):
        import numpy as np

        limit = schema.extra_properties["x-max-words"]
        return np.asarray([len(x.split()) <= limit if x else True
                           for x in arr.to_pylist()])

    v = compile_validator(schema_from_json('{"x-max-words":2}'),
                          custom_keywords={"x-max-words": handler})
    assert v.probe(pa.array(["one two", "one two three"])).tolist() == [True, False]


def test_property_names_static_subjects():
    # propertyNames over STATIC property sets (struct/table), not just maps
    t = pa.table({"ok_col": [1, 2], "BAD": ["x", None]})
    v = compile_validator(schema_from_json('{"propertyNames":{"pattern":"^[a-z_]+$"}}'))
    assert v.probe(t).tolist() == [False, True]   # null under a bad name = absent
    typ = pa.struct([("good", pa.int64()), ("Bad", pa.int64())])
    arr = pa.array([{"good": 1, "Bad": 2}, {"good": 1, "Bad": None}, None], type=typ)
    # 'Bad' fails the lowercase pattern only where its value is present
    check('{"propertyNames":{"pattern":"^[a-z]+$"}}', arr, [False, True, True])


# ---- session-5 additions: more official-suite-style edges -------------------
def test_unique_items_nested_arrays():
    arr = pa.array([[[1, 2], [1, 2]], [[1, 2], [2, 1]], [[], []]],
                   type=pa.list_(pa.list_(pa.int64())))
    check('{"uniqueItems":true}', arr, [False, True, False])


def test_contains_with_bounds_schema():
    arr = pa.array([[1, 50, 3], [1, 2], [], [99]],
                   type=pa.list_(pa.int64()))
    check('{"contains":{"minimum":10}}', arr, [True, False, False, True])


def test_dependencies_chain_both_arms():
    arr = pa.array([{"a": "1"}, {"a": "1", "b": "2"},
                    {"a": "1", "b": "2", "c": "3"}, {"b": "2", "c": "3"}],
                   type=pa.map_(pa.string(), pa.string()))
    # a requires b (array arm); b requires schema arm needing c present
    check('{"dependencies":{"a":["b"],"b":{"required":["c"]}}}',
          arr, [False, False, True, True])


def test_ref_chain_through_definitions_pointer():
    check('{"definitions":{"a":{"$ref":"#/definitions/b"},'
          '"b":{"minLength":3}},"$ref":"#/definitions/a"}',
          ["ab", "abc"], [False, True])


def test_exclusive_bounds_equality_edges():
    check('{"exclusiveMinimum":2,"exclusiveMaximum":4}',
          [2.0, 2.5, 4.0, 3.999], [False, True, False, True])
    check('{"minimum":2,"maximum":4}', [2.0, 4.0, 4.001],
          [True, True, False])


def test_property_names_pattern():
    arr = pa.array([{"ok": "1"}, {"bad-key!": "1"}, {}],
                   type=pa.map_(pa.string(), pa.string()))
    check('{"propertyNames":{"pattern":"^[a-z]+$"}}', arr,
          [True, False, True])


def test_required_with_additional_properties_false():
    arr = pa.array([{"a": "1"}, {"a": "1", "b": "2"}, {"b": "2"}],
                   type=pa.map_(pa.string(), pa.string()))
    check('{"required":["a"],"properties":{"a":{}},'
          '"additionalProperties":false}',
          arr, [True, False, False])


def test_if_then_else_full_chain():
    check('{"if":{"pattern":"^a"},"then":{"minLength":3},'
          '"else":{"maxLength":2}}',
          ["abc", "ab", "xy", "xyz"], [True, False, True, False])


def test_enum_mixed_scalar_types_on_float_column():
    # whole floats equal integer enum members (Go/json semantics)
    check('{"enum":[1,"x",2.5]}', [1.0, 2.5, 3.0], [True, True, False])


def test_multiple_of_fractional_tenth():
    check('{"multipleOf":0.5}', [1.0, 1.25, 2.5], [True, False, True])


def test_min_max_items_with_tuple_items():
    arr = pa.array([[1], [1, 2], [1, 2, 3]], type=pa.list_(pa.int64()))
    check('{"items":[{"minimum":0},{"minimum":2}],"minItems":2,'
          '"maxItems":2}',
          arr, [False, True, False])


def test_pattern_is_search_not_fullmatch():
    check('{"pattern":"b+c"}', ["abcx", "ac", "bc"], [True, False, True])


def test_const_object_on_map_column():
    arr = pa.array([{"k": "1"}, {"k": "2"}, {}],
                   type=pa.map_(pa.string(), pa.string()))
    check('{"const":{"k":"1"}}', arr, [True, False, False])


def test_boolean_schema_nested_in_properties():
    arr = pa.array([{"a": "1"}, {"b": "2"}, {}],
                   type=pa.map_(pa.string(), pa.string()))
    # "a": false -> any object WITH key a fails
    check('{"properties":{"a":false}}', arr, [False, True, True])


def test_anyof_all_fail_and_empty_string_edges():
    check('{"anyOf":[{"minLength":5},{"pattern":"^z"}]}',
          ["abc", "zz", "abcdef", ""], [False, True, True, False])


def test_min_length_counts_codepoints_not_utf16_units():
    # U+1D11E (musical G clef) is ONE codepoint (2 UTF-16 units, 4 UTF-8
    # bytes) — draft-07 length is by codepoints
    check('{"minLength":2}', ["\U0001D11Ea", "\U0001D11E", "ab"],
          [True, False, True])


def test_items_false_allows_only_empty_arrays():
    check('{"items":false}',
          pa.array([[], [1]], type=pa.list_(pa.int64())), [True, False])


def test_contains_true_requires_nonempty():
    check('{"contains":true}',
          pa.array([[], [1]], type=pa.list_(pa.int64())), [False, True])


def test_additional_items_false_caps_tuple_length():
    check('{"items":[{}],"additionalItems":false}',
          pa.array([[1], [1, 2], []], type=pa.list_(pa.int64())),
          [True, False, True])


# ---- round-4 additions: deeper official-suite territory ---------------------
def test_type_union_integer_string():
    # dynamic per-row type check needs a JSON-ish column; on a typed float
    # column "integer" accepts whole floats only
    check('{"type":["integer","string"]}', ["a", "b"], [True, True])
    check('{"type":["integer","string"]}', [1.0, 1.5], [True, False])


def test_type_number_accepts_integer_column():
    check('{"type":"number"}', pa.array([1, 2], type=pa.int64()),
          [True, True])


def test_enum_with_null_member():
    # engine convention: null subject = absent -> passes any constraint;
    # non-null members still matched exactly
    check('{"enum":["a",null]}', ["a", "b", None], [True, False, True])


def test_const_null_like_absent():
    check('{"const":"x"}', ["x", None, "y"], [True, True, False])


def test_nested_not_not():
    check('{"not":{"not":{"pattern":"^a"}}}', ["abc", "zzz"],
          [True, False])


def test_allof_anyof_oneof_combined():
    sch = ('{"allOf":[{"anyOf":[{"multipleOf":2},{"multipleOf":3}]},'
           '{"oneOf":[{"minimum":10},{"maximum":5}]}]}')
    # 4: anyOf ok (x2), oneOf: min10 no, max5 yes -> one arm -> pass
    # 12: anyOf ok, oneOf: min10 yes, max5 no -> pass
    # 7: anyOf fails -> fail;  2: oneOf max5 yes min10 no -> pass
    # 30 >= 10 only -> pass;  9: anyOf ok(x3), oneOf: neither (9<10, 9>5)
    check(sch, [4.0, 12.0, 7.0, 2.0, 30.0, 9.0],
          [True, True, False, True, True, False])


def test_if_then_else_with_applicator_condition():
    sch = ('{"if":{"anyOf":[{"pattern":"^a"},{"pattern":"^b"}]},'
           '"then":{"minLength":3},"else":{"maxLength":2}}')
    check(sch, ["ab", "abc", "zz", "zzz"], [False, True, True, False])


def test_ref_with_escaped_pointer_tokens():
    # definition names containing / and ~ use ~1 and ~0 escapes
    sch = ('{"definitions":{"a/b":{"minLength":3},"t~d":{"maxLength":4}},'
           '"allOf":[{"$ref":"#/definitions/a~1b"},'
           '{"$ref":"#/definitions/t~0d"}]}')
    check(sch, ["abc", "ab", "abcde"], [True, False, False])


def test_pattern_properties_multiple_patterns_both_apply():
    mp = pa.array([{"ax": "12"}, {"ax": "1"}, {"bx": "123"}],
                  type=pa.map_(pa.string(), pa.string()))
    # key "ax" matches ^a AND x$ -> both sub-schemas apply
    sch = ('{"patternProperties":{"^a":{"minLength":2},'
           '"x$":{"maxLength":2}}}')
    check(sch, mp, [True, False, False])


def test_dependencies_string_array_form():
    t = pa.table({"a": [1, 1, None], "b": [2, None, None],
                  "c": [3, 3, 3]})
    v = compile_validator(schema_from_json(
        '{"dependencies":{"a":["b","c"]}}'))
    assert v.probe(t).tolist() == [True, False, True]


def test_min_max_properties_on_maps():
    mp = pa.array([{}, {"a": "1"}, {"a": "1", "b": "2", "c": "3"}],
                  type=pa.map_(pa.string(), pa.string()))
    check('{"minProperties":1,"maxProperties":2}', mp,
          [False, True, False])


def test_unique_items_with_duplicate_maps():
    arr = pa.array([[{"k": "1"}, {"k": "1"}], [{"k": "1"}, {"k": "2"}]],
                   type=pa.list_(pa.map_(pa.string(), pa.string())))
    check('{"uniqueItems":true}', arr, [False, True])


def test_contains_multiple_matches_still_one_pass():
    check('{"contains":{"minimum":5}}',
          pa.array([[1, 6, 7], [1, 2], []], type=pa.list_(pa.int64())),
          [True, False, False])


def test_items_recursion_two_levels():
    arr = pa.array([[[1, 2], [3]], [[1], [0]]],
                   type=pa.list_(pa.list_(pa.int64())))
    check('{"items":{"items":{"minimum":1}}}', arr, [True, False])


def test_required_empty_array_is_trivial():
    t = pa.table({"foo": [1, None]})
    v = compile_validator(schema_from_json('{"required":[]}'))
    assert v.probe(t).tolist() == [True, True]


def test_boolean_root_schemas():
    # engine null-as-absent convention: a null subject is "no instance",
    # which no schema (even false) applies to — only PRESENT values fail
    check("true", ["x", None], [True, True])
    check("false", ["x", None], [False, True])


def test_exclusive_maximum_numeric_form():
    # draft-07: exclusiveMaximum is a NUMBER (not the draft-04 bool)
    check('{"exclusiveMaximum":3.0}', [2.9, 3.0, 3.1],
          [True, False, False])
    check('{"exclusiveMinimum":1.1}', [1.1, 1.2], [False, True])


def test_multiple_of_int_on_int_column():
    check('{"multipleOf":3}', pa.array([9, 10], type=pa.int64()),
          [True, False])


def test_min_length_zero_default_go_quirk():
    # absent minLength ≡ 0 (non-pointer zero default in the reference)
    check('{"maxLength":2}', ["", "ab", "abc"], [True, True, False])


def test_pattern_with_char_class_and_quantifier():
    check('{"pattern":"^[A-Z]{2,3}[0-9]+$"}',
          ["AB12", "ABCD12", "a12", "ABC9"],
          [True, False, False, True])


def test_anyof_with_nested_ref():
    sch = ('{"definitions":{"short":{"maxLength":2}},'
           '"anyOf":[{"$ref":"#/definitions/short"},{"pattern":"^ok"}]}')
    check(sch, ["ab", "okay", "nope"], [True, True, False])


def test_oneof_exactly_one_of_three():
    sch = ('{"oneOf":[{"multipleOf":2},{"multipleOf":3},'
           '{"multipleOf":5}]}')
    # 6 matches two arms -> fail; 30 matches three -> fail
    check(sch, [2.0, 3.0, 5.0, 6.0, 30.0, 7.0],
          [True, True, True, False, False, False])


def test_if_else_without_then():
    sch = '{"if":{"pattern":"^a"},"else":{"minLength":5}}'
    check(sch, ["abc", "zz", "zzzzz"], [True, False, True])


def test_property_schema_with_format():
    from rayschema.compile import compile_validator as cv
    t = pa.table({"d": ["2024-02-29", "2023-02-29", None]})
    v = cv(schema_from_json(
        '{"properties":{"d":{"format":"date"}}}'), validate_formats=True)
    assert v.probe(t).tolist() == [True, False, True]


def test_contains_with_const():
    check('{"contains":{"const":3}}',
          pa.array([[1, 3], [1, 2]], type=pa.list_(pa.int64())),
          [True, False])


def test_not_boolean_schemas():
    check('{"not":true}', ["x"], [False])
    check('{"not":false}', ["x"], [True])


def test_nested_additional_properties_on_values():
    mp = pa.array([{"a": "12"}, {"a": "12345"}],
                  type=pa.map_(pa.string(), pa.string()))
    check('{"additionalProperties":{"maxLength":3}}', mp, [True, False])


def test_max_items_zero():
    check('{"maxItems":0}',
          pa.array([[], [1]], type=pa.list_(pa.int64())), [True, False])


def test_enum_single_member_equals_const():
    check('{"enum":["only"]}', ["only", "other"], [True, False])


def test_deep_applicator_ref_chain():
    sch = ('{"definitions":{"pos":{"minimum":0},'
           '"small":{"allOf":[{"$ref":"#/definitions/pos"},'
           '{"maximum":10}]}},"$ref":"#/definitions/small"}')
    check(sch, [5.0, -1.0, 11.0], [True, False, False])


def test_format_uuid_email_uri_ipv4():
    from rayschema.compile import compile_validator as cv
    v = cv(schema_from_json('{"format":"uuid"}'), validate_formats=True)
    assert v.probe(pa.array([
        "123e4567-e89b-12d3-a456-426614174000", "not-a-uuid", None]
    )).tolist() == [True, False, True]
    v = cv(schema_from_json('{"format":"email"}'), validate_formats=True)
    assert v.probe(pa.array(["a@b.co", "nope", "x@y", None])).tolist()[:2] \
        == [True, False]
    v = cv(schema_from_json('{"format":"ipv4"}'), validate_formats=True)
    got = v.probe(pa.array(["1.2.3.4", "999.2.3.4", "a.b.c.d"])).tolist()
    assert got[0] is True and got[2] is False


def test_format_regex_compilability():
    check('{"format":"regex"}', ["^a+$", "([unclosed"], [True, False])


def test_format_unknown_passes_like_annotation():
    check('{"format":"made-up-format"}', ["anything"], [True])


def test_date_format_strict_calendar():
    # round-4 fix: Arrow strptime rollover (2023-02-29 -> 2023-03-01)
    # must NOT validate; leap years and month/day bounds exact
    check('{"format":"date"}',
          ["2024-02-29", "2023-02-29", "2023-04-31", "2023-13-01",
           "0004-02-29", "2023-00-10", "2023-01-00"],
          [True, False, False, False, True, False, False])


def test_keywords_ignore_nonmatching_types():
    # draft-07: each keyword constrains only its own instance type —
    # classic official-suite cases ("ignores non-strings" etc.)
    check('{"minLength":5}', pa.array([1, 2], type=pa.int64()),
          [True, True])
    check('{"pattern":"^a"}', pa.array([1], type=pa.int64()), [True])
    check('{"minimum":5}', ["a"], [True])
    check('{"minItems":1}', pa.array([1], type=pa.int64()), [True])
    check('{"maxProperties":1}',
          pa.array([[1, 2]], type=pa.list_(pa.int64())), [True])
    check('{"multipleOf":2}', ["abc"], [True])
    check('{"uniqueItems":true}', ["aa"], [True])


def test_combined_cross_type_with_type_keyword():
    # but adding "type" makes the wrong type FAIL, not vacuously pass
    check('{"type":"string","minLength":5}',
          pa.array([1], type=pa.int64()), [False])
    check('{"type":["number","string"],"minimum":5}',
          pa.array([3.0]), [False])


def test_const_enum_bool_number_distinction():
    # official suite: const 0 does not match false, const false does not
    # match 0 (JSON booleans and numbers are distinct types)
    check('{"const":0}', pa.array([True, False]), [False, False])
    check('{"const":false}', pa.array([0, 1], type=pa.int64()),
          [False, False])
    check('{"const":false}', pa.array([True, False]), [False, True])
    check('{"enum":[0, 2]}', pa.array([False, True]), [False, False])
    check('{"enum":[false]}', pa.array([0], type=pa.int64()), [False])


def test_multiple_of_non_number_and_zero_edge():
    check('{"multipleOf":2}', pa.array([0.0, -4.0, 4.5]),
          [True, True, False])          # 0 and negatives are multiples


def test_pattern_properties_boolean_subschema():
    mp = pa.array([{"xa": "1"}, {"yb": "1"}],
                  type=pa.map_(pa.string(), pa.string()))
    # patternProperties "^x": false -> any object with an x-key fails
    check('{"patternProperties":{"^x":false}}', mp, [False, True])


def test_dependencies_empty_array_trivial():
    t = pa.table({"a": [1, None]})
    v = compile_validator(schema_from_json('{"dependencies":{"a":[]}}'))
    assert v.probe(t).tolist() == [True, True]


# ---- late round-4 gap cases (official-suite areas not yet mirrored) ---------
def test_if_then_else_boolean_schemas():
    # if:true selects then; if:false selects else — degenerate but legal
    check('{"if":true,"then":{"minLength":3},"else":{"maxLength":1}}',
          ["abc", "ab"], [True, False])
    check('{"if":false,"then":{"minLength":3},"else":{"maxLength":1}}',
          ["abc", "a"], [False, True])


def test_unique_items_false_is_trivial():
    arr = pa.array([[1, 1, 2], [1, 2]], type=pa.list_(pa.int64()))
    check('{"uniqueItems":false}', arr, [True, True])


def test_additional_items_schema_form():
    # beyond the tuple prefix, extra elements must satisfy the SCHEMA form
    arr = pa.array([[1, 50, 2], [1, 50, 99], [1, 50]],
                   type=pa.list_(pa.int64()))
    check('{"items":[{},{}],"additionalItems":{"maximum":10}}',
          arr, [True, False, True])


def test_length_counts_astral_codepoints_once():
    # astral-plane chars are 2 UTF-16 units / 4 UTF-8 bytes but ONE codepoint
    check('{"minLength":2,"maxLength":2}',
          ["\U0001F600\U0001F600", "\U0001F600", "ab", "abc"],
          [True, False, True, False])


def test_pattern_unicode_literal():
    check('{"pattern":"é+z"}', ["xééz", "ez", "éz"], [True, False, True])


def test_contains_skips_null_elements():
    # null elements are not subjects; contains looks for a real match
    arr = pa.array([[None, 7], [None], [1, None, 2]],
                   type=pa.list_(pa.int64()))
    check('{"contains":{"minimum":5}}', arr, [True, False, False])


def test_multiple_of_small_fraction():
    # official-suite "by small number" case: 0.0001 divides 0.0075
    check('{"multipleOf":0.0001}', [0.0075, 0.00751], [True, False])


def test_property_names_boolean_false():
    mp_t = pa.map_(pa.string(), pa.string())
    check('{"propertyNames":false}',
          pa.array([{}, {"a": "1"}], type=mp_t), [True, False])


def test_min_properties_zero_is_trivial():
    mp_t = pa.map_(pa.string(), pa.string())
    check('{"minProperties":0}', pa.array([{}, {"a": "1"}], type=mp_t),
          [True, True])


def test_enum_object_member_with_nested_array():
    mp_t = pa.map_(pa.string(), pa.list_(pa.int64()))
    check('{"enum":[{"a":[1,2]},{"b":[]}]}',
          pa.array([{"a": [1, 2]}, {"b": []}, {"a": [2, 1]}], type=mp_t),
          [True, True, False])


def test_nested_ref_inside_items():
    check('{"definitions":{"pos":{"minimum":0}},'
          '"items":{"$ref":"#/definitions/pos"}}',
          pa.array([[0, 5], [-1, 2], []], type=pa.list_(pa.int64())),
          [True, False, True])


def test_allof_empty_and_singleton():
    check('{"allOf":[{}]}', ["x"], [True])
    check('{"allOf":[{"minLength":2}]}', ["x", "xy"], [False, True])


def test_type_array_rejects_scalars_column():
    # a string column against type:array fails every row
    check('{"type":"array"}', ["x", "y"], [False, False])


def test_exclusive_minimum_with_minimum_both_apply():
    check('{"minimum":3,"exclusiveMinimum":3}', [3.0, 3.5, 2.0],
          [False, True, False])


def test_pattern_anchors_are_honored():
    # unanchored search, but explicit anchors in the pattern still bind
    check('{"pattern":"^ab$"}', ["ab", "xabx", "abc"],
          [True, False, False])


# ---- draft-07 core 8.3: keywords alongside $ref are IGNORED ----------------
def test_ref_siblings_are_ignored():
    check('{"definitions":{"d":{"minLength":5}},'
          '"$ref":"#/definitions/d","maxLength":2}',
          ["abc", "abcdef"], [False, True])


def test_ref_sibling_applicators_ignored():
    check('{"definitions":{"d":{"minimum":0}},'
          '"$ref":"#/definitions/d","not":{"minimum":0}}',
          pa.array([5, -5], type=pa.int64()), [True, False])


def test_ref_alone_still_resolves_definitions_from_root():
    check('{"definitions":{"a":{"$ref":"#/definitions/b","pattern":"zz"},'
          '"b":{"minLength":2}},"$ref":"#/definitions/a"}',
          ["x", "xy"], [False, True])


# ---- JSON number equality in enum/uniqueItems -------------------------------
def test_unique_items_int_float_numeric_equality():
    # [1, 1.0] has JSON-equal members -> uniqueItems fails
    check('{"uniqueItems":true}',
          pa.array([[1.0, 1.00], [1.0, 2.0]],
                   type=pa.list_(pa.float64())),
          [False, True])


def test_enum_numeric_equality_across_storage_types():
    check('{"enum":[1]}', pa.array([1.0, 1.5], type=pa.float64()),
          [True, False])
    check('{"enum":[1.0]}', pa.array([1, 2], type=pa.int64()),
          [True, False])


def test_additional_properties_without_properties_applies_to_all():
    sch = '{"additionalProperties":{"type":"integer"}}'
    arr = pa.array([{"a": 1, "b": 2}, {"a": 1, "b": None}],
                   type=pa.struct([("a", pa.int64()), ("b", pa.int64())]))
    check(sch, arr, [True, True])
    arr2 = pa.array([{"a": "x"}], type=pa.struct([("a", pa.string())]))
    check(sch, arr2, [False])


# ---- session-5 additions: more public-suite-style cases ---------------------
def _mp(*dicts):
    return pa.array(list(dicts), type=pa.map_(pa.string(), pa.string()))


def test_dependencies_property_form():
    # bar present => foo must be present
    sch = '{"dependencies":{"bar":["foo"]}}'
    check(sch, _mp({"bar": "1", "foo": "2"}, {"bar": "1"}, {"foo": "2"},
                   {}),
          [True, False, True, True])


def test_dependencies_schema_form():
    sch = '{"dependencies":{"bar":{"required":["foo"]}}}'
    check(sch, _mp({"bar": "1", "foo": "2"}, {"bar": "1"}, {"baz": "3"}),
          [True, False, True])


def test_dependencies_multiple_targets():
    sch = '{"dependencies":{"a":["b","c"]}}'
    check(sch, _mp({"a": "1", "b": "2", "c": "3"},
                   {"a": "1", "b": "2"}, {"b": "2"}),
          [True, False, True])


def test_const_object_deep_equality():
    sch = '{"const":{"k":"v"}}'
    check(sch, _mp({"k": "v"}, {"k": "w"}, {"k": "v", "x": "y"}),
          [True, False, False])


def test_const_array_on_list_column():
    sch = '{"const":[1,2]}'
    check(sch, pa.array([[1, 2], [2, 1], [1, 2, 3]],
                        type=pa.list_(pa.int64())),
          [True, False, False])


def test_items_tuple_with_additional_items_false():
    sch = '{"items":[{"type":"integer"},{"type":"integer"}],"additionalItems":false}'
    check(sch, pa.array([[1, 2], [1], [1, 2, 3]],
                        type=pa.list_(pa.int64())),
          [True, True, False])


def test_items_tuple_with_additional_items_schema():
    sch = ('{"items":[{"minimum":0}],'
           '"additionalItems":{"maximum":10}}')
    check(sch, pa.array([[1, 2], [1, 11], [-1, 2]],
                        type=pa.list_(pa.int64())),
          [True, False, False])


def test_contains_with_const_int():
    sch = '{"contains":{"const":5}}'
    check(sch, pa.array([[1, 5], [1, 2], []],
                        type=pa.list_(pa.int64())),
          [True, False, False])


def test_property_names_max_length():
    sch = '{"propertyNames":{"maxLength":2}}'
    check(sch, _mp({"ab": "1", "x": "2"}, {"abc": "1"}, {}),
          [True, False, True])


def test_required_without_properties_map():
    sch = '{"required":["foo"]}'
    check(sch, _mp({"foo": "1"}, {"bar": "1"}), [True, False])


def test_if_then_else_full_triple():
    sch = ('{"if":{"pattern":"^a"},"then":{"minLength":3},'
           '"else":{"maxLength":2}}')
    check(sch, ["abc", "ab", "xy", "xyz"],
          [True, False, True, False])


def test_if_inside_allof():
    sch = ('{"allOf":[{"if":{"minimum":10},"then":{"multipleOf":5}}],'
           '"maximum":100}')
    check(sch, [4.0, 15.0, 12.0, 101.0], [True, True, False, False])


def test_enum_mixed_types_numeric_column():
    sch = '{"enum":["x", 1, 2.5]}'
    check(sch, [1.0, 2.5, 3.0], [True, True, False])


def test_exclusive_maximum_boundary():
    sch = '{"exclusiveMaximum":3}'
    check(sch, [2.9, 3.0, 3.1], [True, False, False])


def test_multiple_of_on_integer_column():
    sch = '{"multipleOf":3}'
    check(sch, pa.array([9, 10, 0, -6], type=pa.int64()),
          [True, False, True, True])


def test_pattern_escaped_dot():
    sch = '{"pattern":"^a\\\\.b$"}'
    check(sch, ["a.b", "axb"], [True, False])


def test_ref_to_ref_chain():
    sch = ('{"definitions":{"a":{"$ref":"#/definitions/b"},'
           '"b":{"minLength":2}},"$ref":"#/definitions/a"}')
    check(sch, ["ab", "a"], [True, False])


def test_ref_pointer_escape_slash():
    # definition name "a/b" addressed as a~1b
    sch = ('{"definitions":{"a/b":{"minimum":5}},'
           '"$ref":"#/definitions/a~1b"}')
    check(sch, [6.0, 4.0], [True, False])


def test_ref_pointer_escape_tilde():
    sch = ('{"definitions":{"a~b":{"maximum":5}},'
           '"$ref":"#/definitions/a~0b"}')
    check(sch, [4.0, 6.0], [True, False])


def test_min_max_items_on_list_column():
    sch = '{"minItems":1,"maxItems":2}'
    check(sch, pa.array([[1], [1, 2], [], [1, 2, 3]],
                        type=pa.list_(pa.int64())),
          [True, True, False, False])


def test_not_boolean_schemas_column():
    check('{"not":true}', ["x"], [False])
    check('{"not":false}', ["x"], [True])


def test_allof_conflicting_types_never_passes():
    sch = '{"allOf":[{"type":"string"},{"type":"integer"}]}'
    check(sch, ["x", "y"], [False, False])


def test_oneof_exactly_one_of_three_multiples():
    sch = ('{"oneOf":[{"multipleOf":2},{"multipleOf":3},'
           '{"multipleOf":5}]}')
    check(sch, [4.0, 6.0, 30.0, 7.0, 25.0],
          [True, False, False, False, True])


def test_anyof_with_base_keyword():
    sch = '{"minLength":2,"anyOf":[{"pattern":"^a"},{"pattern":"b$"}]}'
    check(sch, ["ab", "a", "xb", "xc"], [True, False, True, False])


def test_max_properties_on_map_column():
    sch = '{"maxProperties":1}'
    check(sch, _mp({"a": "1"}, {"a": "1", "b": "2"}, {}),
          [True, False, True])


def test_unique_items_on_string_lists():
    sch = '{"uniqueItems":true}'
    check(sch, pa.array([["a", "b"], ["a", "a"], []],
                        type=pa.list_(pa.string())),
          [True, False, True])
