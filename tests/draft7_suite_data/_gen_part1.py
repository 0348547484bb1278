"""Generator for the vendored-style draft-07 corpus, part 1 (run once;
the JSON files are committed, this script documents their provenance).

Reconstruction of the public JSON-Schema-Test-Suite draft7 corpus
(json-schema-org/JSON-Schema-Test-Suite, MIT) from its published content:
same file-per-keyword layout, same group/test structure. Authored offline
(no network in this environment), so descriptions are paraphrased; the
schema/data/valid triples follow the official suite's cases.
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
D = {}

D["type"] = [
 {"description": "integer type matches integers",
  "schema": {"type": "integer"},
  "tests": [
   {"description": "an integer is an integer", "data": 1, "valid": True},
   {"description": "a float with zero fractional part is an integer",
    "data": 1.0, "valid": True},
   {"description": "a float is not an integer", "data": 1.1, "valid": False},
   {"description": "a string is not an integer", "data": "foo",
    "valid": False},
   {"description": "a string number is not an integer", "data": "1",
    "valid": False},
   {"description": "an object is not an integer", "data": {},
    "valid": False},
   {"description": "an array is not an integer", "data": [], "valid": False},
   {"description": "a boolean is not an integer", "data": True,
    "valid": False}]},
 {"description": "number type matches numbers", "schema": {"type": "number"},
  "tests": [
   {"description": "an integer is a number", "data": 1, "valid": True},
   {"description": "a float is a number", "data": 1.1, "valid": True},
   {"description": "a string is not a number", "data": "foo",
    "valid": False},
   {"description": "an object is not a number", "data": {}, "valid": False},
   {"description": "an array is not a number", "data": [], "valid": False},
   {"description": "a boolean is not a number", "data": True,
    "valid": False}]},
 {"description": "string type matches strings", "schema": {"type": "string"},
  "tests": [
   {"description": "1 is not a string", "data": 1, "valid": False},
   {"description": "a float is not a string", "data": 1.1, "valid": False},
   {"description": "a string is a string", "data": "foo", "valid": True},
   {"description": "a string number is a string", "data": "1",
    "valid": True},
   {"description": "an empty string is a string", "data": "", "valid": True},
   {"description": "an object is not a string", "data": {}, "valid": False},
   {"description": "an array is not a string", "data": [], "valid": False},
   {"description": "a boolean is not a string", "data": True,
    "valid": False}]},
 {"description": "object type matches objects", "schema": {"type": "object"},
  "tests": [
   {"description": "an integer is not an object", "data": 1, "valid": False},
   {"description": "a string is not an object", "data": "foo",
    "valid": False},
   {"description": "an object is an object", "data": {}, "valid": True},
   {"description": "an array is not an object", "data": [], "valid": False},
   {"description": "a boolean is not an object", "data": True,
    "valid": False}]},
 {"description": "array type matches arrays", "schema": {"type": "array"},
  "tests": [
   {"description": "an integer is not an array", "data": 1, "valid": False},
   {"description": "a string is not an array", "data": "foo",
    "valid": False},
   {"description": "an object is not an array", "data": {}, "valid": False},
   {"description": "an array is an array", "data": [], "valid": True},
   {"description": "a boolean is not an array", "data": True,
    "valid": False}]},
 {"description": "boolean type matches booleans",
  "schema": {"type": "boolean"},
  "tests": [
   {"description": "an integer is not a boolean", "data": 1, "valid": False},
   {"description": "zero is not a boolean", "data": 0, "valid": False},
   {"description": "a string is not a boolean", "data": "foo",
    "valid": False},
   {"description": "true is a boolean", "data": True, "valid": True},
   {"description": "false is a boolean", "data": False, "valid": True}]},
 {"description": "null type matches only the null object",
  "schema": {"type": "null"},
  "tests": [
   {"description": "an integer is not null", "data": 1, "valid": False},
   {"description": "a float is not null", "data": 1.1, "valid": False},
   {"description": "zero is not null", "data": 0, "valid": False},
   {"description": "a string is not null", "data": "foo", "valid": False},
   {"description": "an empty string is not null", "data": "",
    "valid": False},
   {"description": "false is not null", "data": False, "valid": False},
   {"description": "null is null", "data": None, "valid": True}]},
 {"description": "multiple types can be specified in an array",
  "schema": {"type": ["integer", "string"]},
  "tests": [
   {"description": "an integer is valid", "data": 1, "valid": True},
   {"description": "a string is valid", "data": "foo", "valid": True},
   {"description": "a float is invalid", "data": 1.1, "valid": False},
   {"description": "an object is invalid", "data": {}, "valid": False},
   {"description": "an array is invalid", "data": [], "valid": False},
   {"description": "a boolean is invalid", "data": True, "valid": False}]},
 {"description": "type as array with one item",
  "schema": {"type": ["string"]},
  "tests": [
   {"description": "string is valid", "data": "foo", "valid": True},
   {"description": "number is invalid", "data": 123, "valid": False}]},
 {"description": "type array or object",
  "schema": {"type": ["array", "object"]},
  "tests": [
   {"description": "array is valid", "data": [1, 2, 3], "valid": True},
   {"description": "object is valid", "data": {"foo": 123}, "valid": True},
   {"description": "number is invalid", "data": 123, "valid": False},
   {"description": "string is invalid", "data": "foo", "valid": False}]}]

D["enum"] = [
 {"description": "simple enum validation", "schema": {"enum": [1, 2, 3]},
  "tests": [
   {"description": "one of the enum is valid", "data": 1, "valid": True},
   {"description": "something else is invalid", "data": 4, "valid": False}]},
 {"description": "heterogeneous enum validation",
  "schema": {"enum": [6, "foo", [], True, {"foo": 12}]},
  "tests": [
   {"description": "one of the enum is valid", "data": [], "valid": True},
   {"description": "objects are deep compared", "data": {"foo": False},
    "valid": False},
   {"description": "valid object matches", "data": {"foo": 12},
    "valid": True},
   {"description": "extra properties in object is invalid",
    "data": {"foo": 12, "boo": 42}, "valid": False}]},
 {"description": "enums in properties",
  "schema": {"type": "object",
             "properties": {"foo": {"enum": ["foo"]},
                            "bar": {"enum": ["bar"]}},
             "required": ["bar"]},
  "tests": [
   {"description": "both properties are valid",
    "data": {"foo": "foo", "bar": "bar"}, "valid": True},
   {"description": "wrong foo value", "data": {"foo": "foot", "bar": "bar"},
    "valid": False},
   {"description": "wrong bar value", "data": {"foo": "foo", "bar": "bart"},
    "valid": False},
   {"description": "missing optional property is valid",
    "data": {"bar": "bar"}, "valid": True},
   {"description": "missing required property is invalid",
    "data": {"foo": "foo"}, "valid": False},
   {"description": "missing all properties is invalid", "data": {},
    "valid": False}]},
 {"description": "enum with escaped characters",
  "schema": {"enum": ["foo\nbar", "foo\rbar"]},
  "tests": [
   {"description": "member 1 is valid", "data": "foo\nbar", "valid": True},
   {"description": "member 2 is valid", "data": "foo\rbar", "valid": True},
   {"description": "another string is invalid", "data": "abc",
    "valid": False}]},
 {"description": "enum with false does not match 0",
  "schema": {"enum": [False]},
  "tests": [
   {"description": "false is valid", "data": False, "valid": True},
   {"description": "integer zero is invalid", "data": 0, "valid": False},
   {"description": "float zero is invalid", "data": 0.0, "valid": False}]},
 {"description": "enum with true does not match 1",
  "schema": {"enum": [True]},
  "tests": [
   {"description": "true is valid", "data": True, "valid": True},
   {"description": "integer one is invalid", "data": 1, "valid": False},
   {"description": "float one is invalid", "data": 1.0, "valid": False}]},
 {"description": "enum with 0 does not match false", "schema": {"enum": [0]},
  "tests": [
   {"description": "false is invalid", "data": False, "valid": False},
   {"description": "integer zero is valid", "data": 0, "valid": True},
   {"description": "float zero is valid", "data": 0.0, "valid": True}]},
 {"description": "enum with 1 does not match true", "schema": {"enum": [1]},
  "tests": [
   {"description": "true is invalid", "data": True, "valid": False},
   {"description": "integer one is valid", "data": 1, "valid": True},
   {"description": "float one is valid", "data": 1.0, "valid": True}]},
 {"description": "nul characters in strings",
  "schema": {"enum": ["hello\u0000there"]},
  "tests": [
   {"description": "match string with nul", "data": "hello\u0000there",
    "valid": True},
   {"description": "do not match string lacking nul", "data": "hellothere",
    "valid": False}]}]

D["const"] = [
 {"description": "const validation", "schema": {"const": 2},
  "tests": [
   {"description": "same value is valid", "data": 2, "valid": True},
   {"description": "another value is invalid", "data": 5, "valid": False},
   {"description": "another type is invalid", "data": "a", "valid": False}]},
 {"description": "const with object",
  "schema": {"const": {"foo": "bar", "baz": "bax"}},
  "tests": [
   {"description": "same object is valid",
    "data": {"foo": "bar", "baz": "bax"}, "valid": True},
   {"description": "same object with different property order is valid",
    "data": {"baz": "bax", "foo": "bar"}, "valid": True},
   {"description": "another object is invalid", "data": {"foo": "bar"},
    "valid": False},
   {"description": "another type is invalid", "data": [1, 2],
    "valid": False}]},
 {"description": "const with array", "schema": {"const": [{"foo": "bar"}]},
  "tests": [
   {"description": "same array is valid", "data": [{"foo": "bar"}],
    "valid": True},
   {"description": "another array item is invalid", "data": [2],
    "valid": False},
   {"description": "array with additional items is invalid",
    "data": [1, 2, 3], "valid": False}]},
 {"description": "const with false does not match 0",
  "schema": {"const": False},
  "tests": [
   {"description": "false is valid", "data": False, "valid": True},
   {"description": "integer zero is invalid", "data": 0, "valid": False},
   {"description": "float zero is invalid", "data": 0.0, "valid": False}]},
 {"description": "const with true does not match 1",
  "schema": {"const": True},
  "tests": [
   {"description": "true is valid", "data": True, "valid": True},
   {"description": "integer one is invalid", "data": 1, "valid": False},
   {"description": "float one is invalid", "data": 1.0, "valid": False}]},
 {"description": "const with 0 does not match other zero-like types",
  "schema": {"const": 0},
  "tests": [
   {"description": "false is invalid", "data": False, "valid": False},
   {"description": "integer zero is valid", "data": 0, "valid": True},
   {"description": "float zero is valid", "data": 0.0, "valid": True},
   {"description": "empty object is invalid", "data": {}, "valid": False},
   {"description": "empty array is invalid", "data": [], "valid": False},
   {"description": "empty string is invalid", "data": "", "valid": False}]},
 {"description": "const with 1 does not match true", "schema": {"const": 1},
  "tests": [
   {"description": "true is invalid", "data": True, "valid": False},
   {"description": "integer one is valid", "data": 1, "valid": True},
   {"description": "float one is valid", "data": 1.0, "valid": True}]},
 {"description": "const with -2.0 matches integer and float types",
  "schema": {"const": -2.0},
  "tests": [
   {"description": "integer -2 is valid", "data": -2, "valid": True},
   {"description": "float -2.0 is valid", "data": -2.0, "valid": True},
   {"description": "float -2.00001 is invalid", "data": -2.00001,
    "valid": False}]},
 {"description": "nul characters in strings",
  "schema": {"const": "hello\u0000there"},
  "tests": [
   {"description": "match string with nul", "data": "hello\u0000there",
    "valid": True},
   {"description": "do not match string lacking nul", "data": "hellothere",
    "valid": False}]}]

D["multipleOf"] = [
 {"description": "by int", "schema": {"multipleOf": 2},
  "tests": [
   {"description": "int by int", "data": 10, "valid": True},
   {"description": "int by int fail", "data": 7, "valid": False},
   {"description": "ignores non-numbers", "data": "foo", "valid": True}]},
 {"description": "by number", "schema": {"multipleOf": 1.5},
  "tests": [
   {"description": "zero is multiple of anything", "data": 0,
    "valid": True},
   {"description": "4.5 is multiple of 1.5", "data": 4.5, "valid": True},
   {"description": "35 is not multiple of 1.5", "data": 35,
    "valid": False}]},
 {"description": "by small number", "schema": {"multipleOf": 0.0001},
  "tests": [
   {"description": "0.0075 is multiple of 0.0001", "data": 0.0075,
    "valid": True},
   {"description": "0.00751 is not multiple of 0.0001", "data": 0.00751,
    "valid": False}]}]

D["maximum"] = [
 {"description": "maximum validation", "schema": {"maximum": 3.0},
  "tests": [
   {"description": "below the maximum is valid", "data": 2.6,
    "valid": True},
   {"description": "boundary point is valid", "data": 3.0, "valid": True},
   {"description": "above the maximum is invalid", "data": 3.5,
    "valid": False},
   {"description": "ignores non-numbers", "data": "x", "valid": True}]},
 {"description": "maximum validation with unsigned integer",
  "schema": {"maximum": 300},
  "tests": [
   {"description": "below the maximum is invalid", "data": 299.97,
    "valid": True},
   {"description": "boundary point integer is valid", "data": 300,
    "valid": True},
   {"description": "boundary point float is valid", "data": 300.00,
    "valid": True},
   {"description": "above the maximum is invalid", "data": 300.5,
    "valid": False}]}]

D["minimum"] = [
 {"description": "minimum validation", "schema": {"minimum": 1.1},
  "tests": [
   {"description": "above the minimum is valid", "data": 2.6,
    "valid": True},
   {"description": "boundary point is valid", "data": 1.1, "valid": True},
   {"description": "below the minimum is invalid", "data": 0.6,
    "valid": False},
   {"description": "ignores non-numbers", "data": "x", "valid": True}]},
 {"description": "minimum validation with signed integer",
  "schema": {"minimum": -2},
  "tests": [
   {"description": "negative above the minimum is valid", "data": -1,
    "valid": True},
   {"description": "positive above the minimum is valid", "data": 0,
    "valid": True},
   {"description": "boundary point is valid", "data": -2, "valid": True},
   {"description": "boundary point with float is valid", "data": -2.0,
    "valid": True},
   {"description": "float below the minimum is invalid", "data": -2.0001,
    "valid": False},
   {"description": "int below the minimum is invalid", "data": -3,
    "valid": False},
   {"description": "ignores non-numbers", "data": "x", "valid": True}]}]

D["exclusiveMaximum"] = [
 {"description": "exclusiveMaximum validation",
  "schema": {"exclusiveMaximum": 3.0},
  "tests": [
   {"description": "below the exclusiveMaximum is valid", "data": 2.2,
    "valid": True},
   {"description": "boundary point is invalid", "data": 3.0,
    "valid": False},
   {"description": "above the exclusiveMaximum is invalid", "data": 3.5,
    "valid": False},
   {"description": "ignores non-numbers", "data": "x", "valid": True}]}]

D["exclusiveMinimum"] = [
 {"description": "exclusiveMinimum validation",
  "schema": {"exclusiveMinimum": 1.1},
  "tests": [
   {"description": "above the exclusiveMinimum is valid", "data": 1.2,
    "valid": True},
   {"description": "boundary point is invalid", "data": 1.1,
    "valid": False},
   {"description": "below the exclusiveMinimum is invalid", "data": 0.6,
    "valid": False},
   {"description": "ignores non-numbers", "data": "x", "valid": True}]}]

D["maxLength"] = [
 {"description": "maxLength validation", "schema": {"maxLength": 2},
  "tests": [
   {"description": "shorter is valid", "data": "f", "valid": True},
   {"description": "exact length is valid", "data": "fo", "valid": True},
   {"description": "too long is invalid", "data": "foo", "valid": False},
   {"description": "ignores non-strings", "data": 100, "valid": True},
   {"description": "two supplementary Unicode code points is long enough",
    "data": "\U0001f4a9\U0001f4a9", "valid": True}]},
 {"description": "maxLength validation with a decimal",
  "schema": {"maxLength": 2.0},
  "tests": [
   {"description": "shorter is valid", "data": "f", "valid": True},
   {"description": "too long is invalid", "data": "foo", "valid": False}]}]

D["minLength"] = [
 {"description": "minLength validation", "schema": {"minLength": 2},
  "tests": [
   {"description": "longer is valid", "data": "foo", "valid": True},
   {"description": "exact length is valid", "data": "fo", "valid": True},
   {"description": "too short is invalid", "data": "f", "valid": False},
   {"description": "ignores non-strings", "data": 1, "valid": True},
   {"description": "one supplementary Unicode code point is not long enough",
    "data": "\U0001f4a9", "valid": False}]},
 {"description": "minLength validation with a decimal",
  "schema": {"minLength": 2.0},
  "tests": [
   {"description": "longer is valid", "data": "foo", "valid": True},
   {"description": "too short is invalid", "data": "f", "valid": False}]}]

D["pattern"] = [
 {"description": "pattern validation", "schema": {"pattern": "^a*$"},
  "tests": [
   {"description": "a matching pattern is valid", "data": "aaa",
    "valid": True},
   {"description": "a non-matching pattern is invalid", "data": "abc",
    "valid": False},
   {"description": "ignores booleans", "data": True, "valid": True},
   {"description": "ignores integers", "data": 123, "valid": True},
   {"description": "ignores floats", "data": 1.0, "valid": True},
   {"description": "ignores objects", "data": {}, "valid": True},
   {"description": "ignores arrays", "data": [], "valid": True}]},
 {"description": "pattern is not anchored", "schema": {"pattern": "a+"},
  "tests": [
   {"description": "matches a substring", "data": "xxaayy",
    "valid": True}]}]

for name, content in D.items():
    with open(os.path.join(HERE, name + ".json"), "w") as f:
        json.dump(content, f, indent=1, ensure_ascii=False)
print("wrote", sorted(D))
