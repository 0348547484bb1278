"""is_trivial: ports the 23 table-driven cases of
/root/reference/helper_test.go:50-103 plus ref-recursion cases
(helper_test.go:105-178)."""

import pyarrow as pa
import pytest

from rayschema.ir import Schema
from rayschema.serde import schema_from_json
from rayschema.trivial import definitions_resolver, is_trivial, sob_is_trivial

# (schema JSON, expected trivial) — helper_test.go:50-103
CASES = [
    ("{}", True),
    ('{"type":"object"}', True),
    ('{"type":["object","null"]}', True),
    ('{"type":["object","string"]}', False),
    ('{"type":"string"}', True),
    ('{"type":"string","minLength":1}', False),
    ('{"type":"string","maxLength":10}', False),
    ('{"type":"string","pattern":"^a"}', False),
    ('{"type":"string","format":"email"}', False),
    ('{"type":"integer"}', True),
    ('{"type":"integer","minimum":3}', False),
    ('{"type":"integer","multipleOf":2}', False),
    ('{"type":"number","maximum":3}', False),
    ('{"type":"number","exclusiveMinimum":3}', False),
    ('{"type":"array"}', True),
    ('{"type":"array","minItems":1}', False),
    ('{"type":"array","maxItems":5}', False),
    ('{"type":"array","uniqueItems":true}', False),
    ('{"type":"array","items":{"type":"string"}}', True),
    ('{"type":"array","items":{"type":"string","minLength":1}}', False),
    ('{"type":"array","items":[{"type":"string"}]}', False),
    ('{"type":"object","properties":{"a":{"type":"string"}}}', True),
    ('{"type":"object","properties":{"a":{"minLength":1}}}', False),
    ('{"type":"object","required":["a"]}', False),
    ('{"type":"object","minProperties":1}', False),
    ('{"type":"object","patternProperties":{"^x":{}}}', False),
    ('{"type":"object","additionalProperties":false}', False),
    ('{"type":"object","additionalProperties":{"type":"string"}}', True),
    ('{"const":1}', False),
    ('{"enum":[1,2]}', False),
    ('{"allOf":[{}]}', False),
    ('{"anyOf":[{}]}', False),
    ('{"oneOf":[{}]}', False),
    ('{"not":{}}', False),
    ('{"if":{}}', False),
    ('{"dependencies":{"a":["b"]}}', False),
    ('{"propertyNames":{"pattern":"^a"}}', False),
    ('{"contains":{"type":"string"}}', False),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_table_cases(text, expected):
    s = schema_from_json(text)
    assert sob_is_trivial(s) is expected, text


def test_boolean_schemas():
    # SchemaOrBool.IsTrivial (helper.go:178-188)
    assert sob_is_trivial(True) is True
    assert sob_is_trivial(False) is False


def test_uint_backed_minimum_zero_is_trivial():
    # helper.go:200-212: minimum:0 backed by an unsigned type stays trivial
    s = schema_from_json('{"type":"integer","minimum":0}')
    assert is_trivial(s) is False
    s.reflect_type = pa.uint32()
    assert is_trivial(s) is True
    s.minimum = 1
    assert is_trivial(s) is False


def test_ref_resolution():
    root = schema_from_json(
        '{"definitions":{"t":{"type":"string"},"nt":{"minLength":1}},'
        '"properties":{"a":{"$ref":"#/definitions/t"}}}')
    r = definitions_resolver(root)
    assert is_trivial(schema_from_json('{"$ref":"#/definitions/t"}'), r) is True
    assert is_trivial(schema_from_json('{"$ref":"#/definitions/nt"}'), r) is False
    # unresolvable ref is non-trivial (helper.go:286-288 resolved flag)
    assert is_trivial(schema_from_json('{"$ref":"#/definitions/missing"}'), r) is False


def test_self_recursive_ref_is_trivial():
    # helper.go:266-272 skipRef: same-ref recursion short-circuits as trivial
    root = schema_from_json(
        '{"definitions":{"node":{"type":"object","properties":'
        '{"next":{"$ref":"#/definitions/node"}}}},'
        '"$ref":"#/definitions/node"}')
    r = definitions_resolver(root)
    assert is_trivial(root, r) is True


def test_recursive_ref_nontrivial():
    root = schema_from_json(
        '{"definitions":{"node":{"type":"object","required":["v"],"properties":'
        '{"next":{"$ref":"#/definitions/node"}}}},'
        '"$ref":"#/definitions/node"}')
    r = definitions_resolver(root)
    assert is_trivial(root, r) is False
