"""Generator part 2: array + object keywords. Same provenance note as
_gen_part1.py (reconstruction of the public json-schema-org draft7 suite)."""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
D = {}

D["items"] = [
 {"description": "a schema given for items",
  "schema": {"items": {"type": "integer"}},
  "tests": [
   {"description": "valid items", "data": [1, 2, 3], "valid": True},
   {"description": "wrong type of items", "data": ["x"], "valid": False},
   {"description": "ignores non-arrays", "data": {"foo": "bar"},
    "valid": True},
   {"description": "empty array is valid", "data": [], "valid": True}]},
 {"description": "an array of schemas for items",
  "schema": {"items": [{"type": "integer"}, {"type": "string"}]},
  "tests": [
   {"description": "correct types", "data": [1, "foo"], "valid": True},
   {"description": "wrong types", "data": ["foo", 1], "valid": False},
   {"description": "incomplete array of items", "data": [1], "valid": True},
   {"description": "array with additional items", "data": [1, "foo", True],
    "valid": True},
   {"description": "empty array", "data": [], "valid": True}]},
 {"description": "items with boolean schema (true)", "schema": {"items": True},
  "tests": [
   {"description": "any array is valid", "data": [1, "foo", True],
    "valid": True},
   {"description": "empty array is valid", "data": [], "valid": True}]},
 {"description": "items with boolean schema (false)",
  "schema": {"items": False},
  "tests": [
   {"description": "any non-empty array is invalid", "data": [1, "foo"],
    "valid": False},
   {"description": "empty array is valid", "data": [], "valid": True}]},
 {"description": "items with boolean schemas",
  "schema": {"items": [True, False]},
  "tests": [
   {"description": "array with one item is valid", "data": [1],
    "valid": True},
   {"description": "array with two items is invalid", "data": [1, "foo"],
    "valid": False},
   {"description": "empty array is valid", "data": [], "valid": True}]},
 {"description": "nested items",
  "schema": {"type": "array",
             "items": {"type": "array",
                       "items": {"type": "array",
                                 "items": {"type": "number"}}}},
  "tests": [
   {"description": "valid nested array", "data": [[[1]], [[2], [3]]],
    "valid": True},
   {"description": "nested array with invalid type",
    "data": [[["1"]], [[2], [3]]], "valid": False},
   {"description": "not deep enough", "data": [[1], [2]], "valid": False}]}]

D["additionalItems"] = [
 {"description": "additionalItems as schema",
  "schema": {"items": [{}], "additionalItems": {"type": "integer"}},
  "tests": [
   {"description": "additional items match schema", "data": [None, 2, 3, 4],
    "valid": True},
   {"description": "additional items do not match schema",
    "data": [1, 2, 3, "foo"], "valid": False}]},
 {"description": "when items is schema, additionalItems does nothing",
  "schema": {"items": {}, "additionalItems": False},
  "tests": [
   {"description": "all items match schema", "data": [1, 2, 3, 4, 5],
    "valid": True}]},
 {"description": "array of items with no additionalItems permitted",
  "schema": {"items": [{}, {}, {}], "additionalItems": False},
  "tests": [
   {"description": "empty array", "data": [], "valid": True},
   {"description": "fewer number of items present (1)", "data": [1],
    "valid": True},
   {"description": "fewer number of items present (2)", "data": [1, 2],
    "valid": True},
   {"description": "equal number of items present", "data": [1, 2, 3],
    "valid": True},
   {"description": "additional items are not permitted",
    "data": [1, 2, 3, 4], "valid": False}]},
 {"description": "additionalItems as false without items",
  "schema": {"additionalItems": False},
  "tests": [
   {"description": "items defaults to empty schema so everything is valid",
    "data": [1, 2, 3, 4, 5], "valid": True},
   {"description": "ignores non-arrays", "data": {"foo": "bar"},
    "valid": True}]},
 {"description": "additionalItems does not look in applicators",
  "schema": {"allOf": [{"items": [{"type": "integer"}]}],
             "additionalItems": {"type": "boolean"}},
  "tests": [
   {"description": "items defined in allOf are not examined",
    "data": [1, None], "valid": True}]}]

D["maxItems"] = [
 {"description": "maxItems validation", "schema": {"maxItems": 2},
  "tests": [
   {"description": "shorter is valid", "data": [1], "valid": True},
   {"description": "exact length is valid", "data": [1, 2], "valid": True},
   {"description": "too long is invalid", "data": [1, 2, 3],
    "valid": False},
   {"description": "ignores non-arrays", "data": "foobar", "valid": True}]},
 {"description": "maxItems validation with a decimal",
  "schema": {"maxItems": 2.0},
  "tests": [
   {"description": "shorter is valid", "data": [1], "valid": True},
   {"description": "too long is invalid", "data": [1, 2, 3],
    "valid": False}]}]

D["minItems"] = [
 {"description": "minItems validation", "schema": {"minItems": 1},
  "tests": [
   {"description": "longer is valid", "data": [1, 2], "valid": True},
   {"description": "exact length is valid", "data": [1], "valid": True},
   {"description": "too short is invalid", "data": [], "valid": False},
   {"description": "ignores non-arrays", "data": "", "valid": True}]},
 {"description": "minItems validation with a decimal",
  "schema": {"minItems": 1.0},
  "tests": [
   {"description": "longer is valid", "data": [1, 2], "valid": True},
   {"description": "too short is invalid", "data": [], "valid": False}]}]

D["uniqueItems"] = [
 {"description": "uniqueItems validation", "schema": {"uniqueItems": True},
  "tests": [
   {"description": "unique array of integers is valid", "data": [1, 2],
    "valid": True},
   {"description": "non-unique array of integers is invalid",
    "data": [1, 1], "valid": False},
   {"description": "non-unique array of more than two integers is invalid",
    "data": [1, 2, 1], "valid": False},
   {"description": "unique array of strings is valid",
    "data": ["foo", "bar", "baz"], "valid": True},
   {"description": "non-unique array of strings is invalid",
    "data": ["foo", "bar", "foo"], "valid": False},
   {"description": "unique array of objects is valid",
    "data": [{"foo": "bar"}, {"foo": "baz"}], "valid": True},
   {"description": "non-unique array of objects is invalid",
    "data": [{"foo": "bar"}, {"foo": "bar"}], "valid": False},
   {"description": "unique array of nested objects is valid",
    "data": [{"foo": {"bar": {"baz": True}}},
             {"foo": {"bar": {"baz": False}}}], "valid": True},
   {"description": "non-unique array of nested objects is invalid",
    "data": [{"foo": {"bar": {"baz": True}}},
             {"foo": {"bar": {"baz": True}}}], "valid": False},
   {"description": "unique array of arrays is valid",
    "data": [["foo"], ["bar"]], "valid": True},
   {"description": "non-unique array of arrays is invalid",
    "data": [["foo"], ["foo"]], "valid": False},
   {"description": "non-unique array of more than two arrays is invalid",
    "data": [["foo"], ["bar"], ["foo"]], "valid": False},
   {"description": "ignores non-arrays", "data": {}, "valid": True}]},
 {"description": "uniqueItems false validation",
  "schema": {"uniqueItems": False},
  "tests": [
   {"description": "unique array of integers is valid", "data": [1, 2],
    "valid": True},
   {"description": "non-unique array of integers is valid", "data": [1, 1],
    "valid": True}]},
 {"description": "uniqueItems with an array of items",
  "schema": {"items": [{"type": "boolean"}, {"type": "boolean"}],
             "uniqueItems": True},
  "tests": [
   {"description": "[false, true] from items array is valid",
    "data": [False, True], "valid": True},
   {"description": "[true, true] from items array is not valid",
    "data": [True, True], "valid": False}]}]

D["contains"] = [
 {"description": "contains keyword validation",
  "schema": {"contains": {"minimum": 5}},
  "tests": [
   {"description": "array with item matching schema (5) is valid",
    "data": [3, 4, 5], "valid": True},
   {"description": "array with item matching schema (6) is valid",
    "data": [3, 4, 6], "valid": True},
   {"description": "array with two items matching schema (5, 6) is valid",
    "data": [3, 4, 5, 6], "valid": True},
   {"description": "array without items matching schema is invalid",
    "data": [2, 3, 4], "valid": False},
   {"description": "empty array is invalid", "data": [], "valid": False},
   {"description": "not array is valid", "data": {}, "valid": True}]},
 {"description": "contains keyword with const keyword",
  "schema": {"contains": {"const": 5}},
  "tests": [
   {"description": "array with item 5 is valid", "data": [3, 4, 5],
    "valid": True},
   {"description": "array with two items 5 is valid", "data": [3, 4, 5, 5],
    "valid": True},
   {"description": "array without item 5 is invalid", "data": [1, 2, 3, 4],
    "valid": False}]},
 {"description": "contains keyword with boolean schema true",
  "schema": {"contains": True},
  "tests": [
   {"description": "any non-empty array is valid", "data": ["foo"],
    "valid": True},
   {"description": "empty array is invalid", "data": [], "valid": False}]},
 {"description": "contains keyword with boolean schema false",
  "schema": {"contains": False},
  "tests": [
   {"description": "any non-empty array is invalid", "data": ["foo"],
    "valid": False},
   {"description": "empty array is invalid", "data": [], "valid": False},
   {"description": "non-arrays are valid", "data": "contains does not apply",
    "valid": True}]}]

D["maxProperties"] = [
 {"description": "maxProperties validation", "schema": {"maxProperties": 2},
  "tests": [
   {"description": "shorter is valid", "data": {"foo": 1}, "valid": True},
   {"description": "exact length is valid", "data": {"foo": 1, "bar": 2},
    "valid": True},
   {"description": "too long is invalid",
    "data": {"foo": 1, "bar": 2, "baz": 3}, "valid": False},
   {"description": "ignores arrays", "data": [1, 2, 3], "valid": True},
   {"description": "ignores strings", "data": "foobar", "valid": True}]},
 {"description": "maxProperties = 0 means the object is empty",
  "schema": {"maxProperties": 0},
  "tests": [
   {"description": "no properties is valid", "data": {}, "valid": True},
   {"description": "one property is invalid", "data": {"foo": 1},
    "valid": False}]}]

D["minProperties"] = [
 {"description": "minProperties validation", "schema": {"minProperties": 1},
  "tests": [
   {"description": "longer is valid", "data": {"foo": 1, "bar": 2},
    "valid": True},
   {"description": "exact length is valid", "data": {"foo": 1},
    "valid": True},
   {"description": "too short is invalid", "data": {}, "valid": False},
   {"description": "ignores arrays", "data": [], "valid": True},
   {"description": "ignores strings", "data": "", "valid": True}]}]

D["required"] = [
 {"description": "required validation",
  "schema": {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]},
  "tests": [
   {"description": "present required property is valid", "data": {"foo": 1},
    "valid": True},
   {"description": "non-present required property is invalid",
    "data": {"bar": 1}, "valid": False},
   {"description": "ignores arrays", "data": [], "valid": True},
   {"description": "ignores strings", "data": "", "valid": True}]},
 {"description": "required default validation",
  "schema": {"properties": {"foo": {}}},
  "tests": [
   {"description": "not required by default", "data": {}, "valid": True}]},
 {"description": "required with empty array",
  "schema": {"properties": {"foo": {}}, "required": []},
  "tests": [
   {"description": "property not required", "data": {}, "valid": True}]},
 {"description": "required properties whose names are Javascript object "
                 "property names",
  "schema": {"required": ["__proto__", "toString", "constructor"]},
  "tests": [
   {"description": "ignores arrays", "data": [], "valid": True},
   {"description": "none of the properties mentioned", "data": {},
    "valid": False},
   {"description": "__proto__ present",
    "data": {"__proto__": "foo"}, "valid": False},
   {"description": "all present",
    "data": {"__proto__": 12, "toString": {"length": "foo"},
             "constructor": 37}, "valid": True}]}]

D["properties"] = [
 {"description": "object properties validation",
  "schema": {"properties": {"foo": {"type": "integer"},
                            "bar": {"type": "string"}}},
  "tests": [
   {"description": "both properties present and valid is valid",
    "data": {"foo": 1, "bar": "baz"}, "valid": True},
   {"description": "one property invalid is invalid",
    "data": {"foo": 1, "bar": {}}, "valid": False},
   {"description": "both properties invalid is invalid",
    "data": {"foo": [], "bar": {}}, "valid": False},
   {"description": "does not invalidate other properties",
    "data": {"quux": []}, "valid": True},
   {"description": "ignores arrays", "data": [], "valid": True},
   {"description": "ignores other non-objects", "data": 12,
    "valid": True}]},
 {"description": "properties, patternProperties, additionalProperties "
                 "interaction",
  "schema": {"properties": {"foo": {"type": "array", "maxItems": 3},
                            "bar": {"type": "array"}},
             "patternProperties": {"f.o": {"minItems": 2}},
             "additionalProperties": {"type": "integer"}},
  "tests": [
   {"description": "property validates property", "data": {"foo": [1, 2]},
    "valid": True},
   {"description": "property invalidates property",
    "data": {"foo": [1, 2, 3, 4]}, "valid": False},
   {"description": "patternProperty invalidates property",
    "data": {"foo": []}, "valid": False},
   {"description": "patternProperty validates nonproperty",
    "data": {"fxo": [1, 2]}, "valid": True},
   {"description": "patternProperty invalidates nonproperty",
    "data": {"fxo": []}, "valid": False},
   {"description": "additionalProperty ignores property",
    "data": {"bar": []}, "valid": True},
   {"description": "additionalProperty validates others",
    "data": {"quux": 3}, "valid": True},
   {"description": "additionalProperty invalidates others",
    "data": {"quux": "foo"}, "valid": False}]},
 {"description": "properties with boolean schema",
  "schema": {"properties": {"foo": True, "bar": False}},
  "tests": [
   {"description": "no property present is valid", "data": {},
    "valid": True},
   {"description": "only 'true' property present is valid",
    "data": {"foo": 1}, "valid": True},
   {"description": "only 'false' property present is invalid",
    "data": {"bar": 2}, "valid": False},
   {"description": "both properties present is invalid",
    "data": {"foo": 1, "bar": 2}, "valid": False}]},
 {"description": "properties with escaped characters",
  "schema": {"properties": {"foo\nbar": {"type": "number"},
                            "foo\tbar": {"type": "number"}}},
  "tests": [
   {"description": "object with all numbers is valid",
    "data": {"foo\nbar": 1, "foo\tbar": 1}, "valid": True},
   {"description": "object with strings is invalid",
    "data": {"foo\nbar": "1", "foo\tbar": "1"}, "valid": False}]}]

D["patternProperties"] = [
 {"description": "patternProperties validates properties matching a regex",
  "schema": {"patternProperties": {"f.*o": {"type": "integer"}}},
  "tests": [
   {"description": "a single valid match is valid", "data": {"foo": 1},
    "valid": True},
   {"description": "multiple valid matches is valid",
    "data": {"foo": 1, "foooooo": 2}, "valid": True},
   {"description": "a single invalid match is invalid",
    "data": {"foo": "bar", "fother": 2}, "valid": False},
   {"description": "multiple invalid matches is invalid",
    "data": {"foo": "bar", "foooooo": "baz"}, "valid": False},
   {"description": "ignores arrays", "data": ["foo"], "valid": True},
   {"description": "ignores strings", "data": "foo", "valid": True},
   {"description": "ignores other non-objects", "data": 12,
    "valid": True}]},
 {"description": "multiple simultaneous patternProperties are validated",
  "schema": {"patternProperties": {"a*": {"type": "integer"},
                                   "aaa*": {"maximum": 20}}},
  "tests": [
   {"description": "a single valid match is valid", "data": {"a": 21},
    "valid": True},
   {"description": "a simultaneous match is valid", "data": {"aaaa": 18},
    "valid": True},
   {"description": "multiple matches is valid", "data": {"a": 21, "aaaa": 18},
    "valid": True},
   {"description": "an invalid due to one is invalid",
    "data": {"a": "bar"}, "valid": False},
   {"description": "an invalid due to the other is invalid",
    "data": {"aaaa": 31}, "valid": False},
   {"description": "an invalid due to both is invalid",
    "data": {"aaa": "foo", "aaaa": 31}, "valid": False}]},
 {"description": "patternProperties with boolean schemas",
  "schema": {"patternProperties": {"f.*": True, "b.*": False}},
  "tests": [
   {"description": "object with property matching schema true is valid",
    "data": {"foo": 1}, "valid": True},
   {"description": "object with property matching schema false is invalid",
    "data": {"bar": 2}, "valid": False},
   {"description": "object with both properties is invalid",
    "data": {"foo": 1, "bar": 2}, "valid": False},
   {"description": "object with a property matching both true and false "
                   "is invalid", "data": {"foobar": 1}, "valid": False},
   {"description": "empty object is valid", "data": {}, "valid": True}]}]

D["additionalProperties"] = [
 {"description": "additionalProperties being false does not allow other "
                 "properties",
  "schema": {"properties": {"foo": {}, "bar": {}},
             "patternProperties": {"^v": {}},
             "additionalProperties": False},
  "tests": [
   {"description": "no additional properties is valid", "data": {"foo": 1},
    "valid": True},
   {"description": "an additional property is invalid",
    "data": {"foo": 1, "bar": 2, "quux": "boom"}, "valid": False},
   {"description": "ignores arrays", "data": [1, 2, 3], "valid": True},
   {"description": "ignores strings", "data": "foobarbaz", "valid": True},
   {"description": "ignores other non-objects", "data": 12, "valid": True},
   {"description": "patternProperties are not additional properties",
    "data": {"foo": 1, "vroom": 2}, "valid": True}]},
 {"description": "non-ASCII pattern with additionalProperties",
  "schema": {"patternProperties": {"^á": {}},
             "additionalProperties": False},
  "tests": [
   {"description": "matching the pattern is valid",
    "data": {"ármányos": 2}, "valid": True},
   {"description": "not matching the pattern is invalid",
    "data": {"élmény": 2}, "valid": False}]},
 {"description": "additionalProperties with schema",
  "schema": {"properties": {"foo": {}, "bar": {}},
             "additionalProperties": {"type": "boolean"}},
  "tests": [
   {"description": "no additional properties is valid", "data": {"foo": 1},
    "valid": True},
   {"description": "an additional valid property is valid",
    "data": {"foo": 1, "bar": 2, "quux": True}, "valid": True},
   {"description": "an additional invalid property is invalid",
    "data": {"foo": 1, "bar": 2, "quux": 12}, "valid": False}]},
 {"description": "additionalProperties can exist by itself",
  "schema": {"additionalProperties": {"type": "boolean"}},
  "tests": [
   {"description": "an additional valid property is valid",
    "data": {"foo": True}, "valid": True},
   {"description": "an additional invalid property is invalid",
    "data": {"foo": 1}, "valid": False}]},
 {"description": "additionalProperties are allowed by default",
  "schema": {"properties": {"foo": {}, "bar": {}}},
  "tests": [
   {"description": "additional properties are allowed",
    "data": {"foo": 1, "bar": 2, "quux": True}, "valid": True}]},
 {"description": "additionalProperties does not look in applicators",
  "schema": {"allOf": [{"properties": {"foo": {}}}],
             "additionalProperties": {"type": "boolean"}},
  "tests": [
   {"description": "properties defined in allOf are not examined",
    "data": {"foo": 1, "bar": True}, "valid": False}]}]

D["dependencies"] = [
 {"description": "dependencies", "schema": {"dependencies": {"bar": ["foo"]}},
  "tests": [
   {"description": "neither", "data": {}, "valid": True},
   {"description": "nondependant", "data": {"foo": 1}, "valid": True},
   {"description": "with dependency", "data": {"foo": 1, "bar": 2},
    "valid": True},
   {"description": "missing dependency", "data": {"bar": 2},
    "valid": False},
   {"description": "ignores arrays", "data": ["bar"], "valid": True},
   {"description": "ignores strings", "data": "foobar", "valid": True},
   {"description": "ignores other non-objects", "data": 12,
    "valid": True}]},
 {"description": "dependencies with empty array",
  "schema": {"dependencies": {"bar": []}},
  "tests": [
   {"description": "empty object", "data": {}, "valid": True},
   {"description": "object with one property", "data": {"bar": 2},
    "valid": True},
   {"description": "non-object is valid", "data": 1, "valid": True}]},
 {"description": "multiple dependencies",
  "schema": {"dependencies": {"quux": ["foo", "bar"]}},
  "tests": [
   {"description": "neither", "data": {}, "valid": True},
   {"description": "nondependants", "data": {"foo": 1, "bar": 2},
    "valid": True},
   {"description": "with dependencies",
    "data": {"foo": 1, "bar": 2, "quux": 3}, "valid": True},
   {"description": "missing dependency", "data": {"foo": 1, "quux": 2},
    "valid": False},
   {"description": "missing other dependency",
    "data": {"bar": 1, "quux": 2}, "valid": False},
   {"description": "missing both dependencies", "data": {"quux": 1},
    "valid": False}]},
 {"description": "multiple dependencies subschema",
  "schema": {"dependencies": {"bar": {
      "properties": {"foo": {"type": "integer"},
                     "bar": {"type": "integer"}}}}},
  "tests": [
   {"description": "valid", "data": {"foo": 1, "bar": 2}, "valid": True},
   {"description": "no dependency", "data": {"foo": "quux"},
    "valid": True},
   {"description": "wrong type", "data": {"foo": "quux", "bar": 2},
    "valid": False},
   {"description": "wrong type other", "data": {"foo": 2, "bar": "quux"},
    "valid": False},
   {"description": "wrong type both", "data": {"foo": "quux",
                                               "bar": "quux"},
    "valid": False}]},
 {"description": "dependencies with boolean subschemas",
  "schema": {"dependencies": {"foo": True, "bar": False}},
  "tests": [
   {"description": "object with property having schema true is valid",
    "data": {"foo": 1}, "valid": True},
   {"description": "object with property having schema false is invalid",
    "data": {"bar": 2}, "valid": False},
   {"description": "object with both properties is invalid",
    "data": {"foo": 1, "bar": 2}, "valid": False},
   {"description": "empty object is valid", "data": {}, "valid": True}]},
 {"description": "dependencies with escaped characters",
  "schema": {"dependencies": {"foo\nbar": ["foo\rbar"],
                              "foo\"bar": {"minProperties": 2}}},
  "tests": [
   {"description": "CRLF", "data": {"foo\nbar": 1, "foo\rbar": 2},
    "valid": True},
   {"description": "quoted quote",
    "data": {"foo\"bar": 2, "a": 1}, "valid": True},
   {"description": "CRLF missing dependent", "data": {"foo\nbar": 3},
    "valid": False},
   {"description": "quoted quote invalid under dependent schema",
    "data": {"foo\"bar": 2}, "valid": False}]}]

D["propertyNames"] = [
 {"description": "propertyNames validation",
  "schema": {"propertyNames": {"maxLength": 3}},
  "tests": [
   {"description": "all property names valid", "data": {"f": {}, "foo": {}},
    "valid": True},
   {"description": "some property names invalid",
    "data": {"foo": {}, "foobar": {}}, "valid": False},
   {"description": "object without properties is valid", "data": {},
    "valid": True},
   {"description": "ignores arrays", "data": [1, 2, 3, 4], "valid": True},
   {"description": "ignores strings", "data": "foobar", "valid": True},
   {"description": "ignores other non-objects", "data": 12,
    "valid": True}]},
 {"description": "propertyNames with boolean schema true",
  "schema": {"propertyNames": True},
  "tests": [
   {"description": "object with any properties is valid",
    "data": {"foo": 1}, "valid": True},
   {"description": "empty object is valid", "data": {}, "valid": True}]},
 {"description": "propertyNames with boolean schema false",
  "schema": {"propertyNames": False},
  "tests": [
   {"description": "object with any properties is invalid",
    "data": {"foo": 1}, "valid": False},
   {"description": "empty object is valid", "data": {}, "valid": True}]},
 {"description": "propertyNames with const",
  "schema": {"propertyNames": {"const": "foo"}},
  "tests": [
   {"description": "object with property foo is valid", "data": {"foo": 1},
    "valid": True},
   {"description": "object with any other property is invalid",
    "data": {"bar": 1}, "valid": False},
   {"description": "empty object is valid", "data": {}, "valid": True}]},
 {"description": "propertyNames with enum",
  "schema": {"propertyNames": {"enum": ["foo", "bar"]}},
  "tests": [
   {"description": "object with property foo is valid", "data": {"foo": 1},
    "valid": True},
   {"description": "object with property foo and bar is valid",
    "data": {"foo": 1, "bar": 1}, "valid": True},
   {"description": "object with any other property is invalid",
    "data": {"baz": 1}, "valid": False}]}]

for name, content in D.items():
    with open(os.path.join(HERE, name + ".json"), "w") as f:
        json.dump(content, f, indent=1, ensure_ascii=False)
print("wrote", sorted(D))
