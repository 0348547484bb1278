"""Generator part 3: combinators, conditionals, boolean schemas, $ref /
definitions, default. Same provenance note as _gen_part1.py."""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
D = {}

D["allOf"] = [
 {"description": "allOf",
  "schema": {"allOf": [
      {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
      {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
  "tests": [
   {"description": "allOf", "data": {"foo": "baz", "bar": 2},
    "valid": True},
   {"description": "mismatch second", "data": {"foo": "baz"},
    "valid": False},
   {"description": "mismatch first", "data": {"bar": 2}, "valid": False},
   {"description": "wrong type", "data": {"foo": "baz", "bar": "quux"},
    "valid": False}]},
 {"description": "allOf with base schema",
  "schema": {"properties": {"bar": {"type": "integer"}},
             "required": ["bar"],
             "allOf": [
      {"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
      {"properties": {"baz": {"type": "null"}}, "required": ["baz"]}]},
  "tests": [
   {"description": "valid", "data": {"foo": "quux", "bar": 2, "baz": None},
    "valid": True},
   {"description": "mismatch base schema", "data": {"foo": "quux",
                                                    "baz": None},
    "valid": False},
   {"description": "mismatch first allOf", "data": {"bar": 2, "baz": None},
    "valid": False},
   {"description": "mismatch both", "data": {"bar": 2}, "valid": False}]},
 {"description": "allOf simple types",
  "schema": {"allOf": [{"maximum": 30}, {"minimum": 20}]},
  "tests": [
   {"description": "valid", "data": 25, "valid": True},
   {"description": "mismatch one", "data": 35, "valid": False}]},
 {"description": "allOf with boolean schemas, all true",
  "schema": {"allOf": [True, True]},
  "tests": [
   {"description": "any value is valid", "data": "foo", "valid": True}]},
 {"description": "allOf with boolean schemas, some false",
  "schema": {"allOf": [True, False]},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "allOf with boolean schemas, all false",
  "schema": {"allOf": [False, False]},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "allOf with one empty schema",
  "schema": {"allOf": [{}]},
  "tests": [
   {"description": "any data is valid", "data": 1, "valid": True}]},
 {"description": "allOf with two empty schemas",
  "schema": {"allOf": [{}, {}]},
  "tests": [
   {"description": "any data is valid", "data": 1, "valid": True}]},
 {"description": "allOf with the first empty schema",
  "schema": {"allOf": [{}, {"type": "number"}]},
  "tests": [
   {"description": "number is valid", "data": 1, "valid": True},
   {"description": "string is invalid", "data": "foo", "valid": False}]},
 {"description": "nested allOf, to check validation semantics",
  "schema": {"allOf": [{"allOf": [{"type": "null"}]}]},
  "tests": [
   {"description": "anything non-null is invalid", "data": 123,
    "valid": False}]}]

D["anyOf"] = [
 {"description": "anyOf",
  "schema": {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
  "tests": [
   {"description": "first anyOf valid", "data": 1, "valid": True},
   {"description": "second anyOf valid", "data": 2.5, "valid": True},
   {"description": "both anyOf valid", "data": 3, "valid": True},
   {"description": "neither anyOf valid", "data": 1.5, "valid": False}]},
 {"description": "anyOf with base schema",
  "schema": {"type": "string",
             "anyOf": [{"maxLength": 2}, {"minLength": 4}]},
  "tests": [
   {"description": "mismatch base schema", "data": 3, "valid": False},
   {"description": "one anyOf valid", "data": "foobar", "valid": True},
   {"description": "both anyOf invalid", "data": "foo", "valid": False}]},
 {"description": "anyOf with boolean schemas, all true",
  "schema": {"anyOf": [True, True]},
  "tests": [
   {"description": "any value is valid", "data": "foo", "valid": True}]},
 {"description": "anyOf with boolean schemas, some true",
  "schema": {"anyOf": [True, False]},
  "tests": [
   {"description": "any value is valid", "data": "foo", "valid": True}]},
 {"description": "anyOf with boolean schemas, all false",
  "schema": {"anyOf": [False, False]},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "anyOf complex types",
  "schema": {"anyOf": [
      {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
      {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
  "tests": [
   {"description": "first anyOf valid (complex)", "data": {"bar": 2},
    "valid": True},
   {"description": "second anyOf valid (complex)", "data": {"foo": "baz"},
    "valid": True},
   {"description": "both anyOf valid (complex)",
    "data": {"foo": "baz", "bar": 2}, "valid": True},
   {"description": "neither anyOf valid (complex)",
    "data": {"foo": 2, "bar": "quux"}, "valid": False}]},
 {"description": "anyOf with one empty schema",
  "schema": {"anyOf": [{"type": "number"}, {}]},
  "tests": [
   {"description": "string is valid", "data": "foo", "valid": True},
   {"description": "number is valid", "data": 123, "valid": True}]},
 {"description": "nested anyOf, to check validation semantics",
  "schema": {"anyOf": [{"anyOf": [{"type": "null"}]}]},
  "tests": [
   {"description": "anything non-null is invalid", "data": 123,
    "valid": False}]}]

D["oneOf"] = [
 {"description": "oneOf",
  "schema": {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
  "tests": [
   {"description": "first oneOf valid", "data": 1, "valid": True},
   {"description": "second oneOf valid", "data": 2.5, "valid": True},
   {"description": "both oneOf valid", "data": 3, "valid": False},
   {"description": "neither oneOf valid", "data": 1.5, "valid": False}]},
 {"description": "oneOf with base schema",
  "schema": {"type": "string",
             "oneOf": [{"minLength": 2}, {"maxLength": 4}]},
  "tests": [
   {"description": "mismatch base schema", "data": 3, "valid": False},
   {"description": "one oneOf valid", "data": "foobar", "valid": True},
   {"description": "both oneOf valid", "data": "foo", "valid": False}]},
 {"description": "oneOf with boolean schemas, all true",
  "schema": {"oneOf": [True, True, True]},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "oneOf with boolean schemas, one true",
  "schema": {"oneOf": [True, False, False]},
  "tests": [
   {"description": "any value is valid", "data": "foo", "valid": True}]},
 {"description": "oneOf with boolean schemas, more than one true",
  "schema": {"oneOf": [True, True, False]},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "oneOf with boolean schemas, all false",
  "schema": {"oneOf": [False, False, False]},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "oneOf complex types",
  "schema": {"oneOf": [
      {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
      {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
  "tests": [
   {"description": "first oneOf valid (complex)", "data": {"bar": 2},
    "valid": True},
   {"description": "second oneOf valid (complex)", "data": {"foo": "baz"},
    "valid": True},
   {"description": "both oneOf valid (complex)",
    "data": {"foo": "baz", "bar": 2}, "valid": False},
   {"description": "neither oneOf valid (complex)",
    "data": {"foo": 2, "bar": "quux"}, "valid": False}]},
 {"description": "oneOf with empty schema",
  "schema": {"oneOf": [{"type": "number"}, {}]},
  "tests": [
   {"description": "one valid - valid", "data": "foo", "valid": True},
   {"description": "both valid - invalid", "data": 123, "valid": False}]},
 {"description": "oneOf with required",
  "schema": {"type": "object",
             "oneOf": [{"required": ["foo", "bar"]},
                       {"required": ["foo", "baz"]}]},
  "tests": [
   {"description": "both invalid - invalid", "data": {"bar": 2},
    "valid": False},
   {"description": "first valid - valid", "data": {"foo": 1, "bar": 2},
    "valid": True},
   {"description": "second valid - valid", "data": {"foo": 1, "baz": 3},
    "valid": True},
   {"description": "both valid - invalid",
    "data": {"foo": 1, "bar": 2, "baz": 3}, "valid": False}]}]

D["not"] = [
 {"description": "not", "schema": {"not": {"type": "integer"}},
  "tests": [
   {"description": "allowed", "data": "foo", "valid": True},
   {"description": "disallowed", "data": 1, "valid": False}]},
 {"description": "not multiple types",
  "schema": {"not": {"type": ["integer", "boolean"]}},
  "tests": [
   {"description": "valid", "data": "foo", "valid": True},
   {"description": "mismatch", "data": 1, "valid": False},
   {"description": "other mismatch", "data": True, "valid": False}]},
 {"description": "not more complex schema",
  "schema": {"not": {"type": "object",
                     "properties": {"foo": {"type": "string"}}}},
  "tests": [
   {"description": "match", "data": 1, "valid": True},
   {"description": "other match", "data": {"foo": 1}, "valid": True},
   {"description": "mismatch", "data": {"foo": "bar"}, "valid": False}]},
 {"description": "forbidden property",
  "schema": {"properties": {"foo": {"not": {}}}},
  "tests": [
   {"description": "property present", "data": {"foo": 1, "bar": 2},
    "valid": False},
   {"description": "property absent", "data": {"bar": 1, "baz": 2},
    "valid": True}]},
 {"description": "not with boolean schema true", "schema": {"not": True},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "not with boolean schema false", "schema": {"not": False},
  "tests": [
   {"description": "any value is valid", "data": "foo", "valid": True}]}]

D["if-then-else"] = [
 {"description": "ignore if without then or else",
  "schema": {"if": {"const": 0}},
  "tests": [
   {"description": "valid when valid against lone if", "data": 0,
    "valid": True},
   {"description": "valid when invalid against lone if", "data": "hello",
    "valid": True}]},
 {"description": "ignore then without if",
  "schema": {"then": {"const": 0}},
  "tests": [
   {"description": "valid when valid against lone then", "data": 0,
    "valid": True},
   {"description": "valid when invalid against lone then", "data": "hello",
    "valid": True}]},
 {"description": "ignore else without if",
  "schema": {"else": {"const": 0}},
  "tests": [
   {"description": "valid when valid against lone else", "data": 0,
    "valid": True},
   {"description": "valid when invalid against lone else", "data": "hello",
    "valid": True}]},
 {"description": "if and then without else",
  "schema": {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}},
  "tests": [
   {"description": "valid through then", "data": -1, "valid": True},
   {"description": "invalid through then", "data": -100, "valid": False},
   {"description": "valid when if test fails", "data": 3, "valid": True}]},
 {"description": "if and else without then",
  "schema": {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}},
  "tests": [
   {"description": "valid when if test passes", "data": -1, "valid": True},
   {"description": "valid through else", "data": 4, "valid": True},
   {"description": "invalid through else", "data": 3, "valid": False}]},
 {"description": "validate against correct branch, then vs else",
  "schema": {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10},
             "else": {"multipleOf": 2}},
  "tests": [
   {"description": "valid through then", "data": -1, "valid": True},
   {"description": "invalid through then", "data": -100, "valid": False},
   {"description": "valid through else", "data": 4, "valid": True},
   {"description": "invalid through else", "data": 3, "valid": False}]},
 {"description": "non-interference across combined schemas",
  "schema": {"allOf": [{"if": {"exclusiveMaximum": 0}},
                       {"then": {"minimum": -10}},
                       {"else": {"multipleOf": 2}}]},
  "tests": [
   {"description": "valid, but would have been invalid through then",
    "data": -100, "valid": True},
   {"description": "valid, but would have been invalid through else",
    "data": 3, "valid": True}]},
 {"description": "if with boolean schema true",
  "schema": {"if": True, "then": {"const": "then"},
             "else": {"const": "else"}},
  "tests": [
   {"description": "boolean schema true in if always chooses the then "
                   "path (valid)", "data": "then", "valid": True},
   {"description": "boolean schema true in if always chooses the then "
                   "path (invalid)", "data": "else", "valid": False}]},
 {"description": "if with boolean schema false",
  "schema": {"if": False, "then": {"const": "then"},
             "else": {"const": "else"}},
  "tests": [
   {"description": "boolean schema false in if always chooses the else "
                   "path (invalid)", "data": "then", "valid": False},
   {"description": "boolean schema false in if always chooses the else "
                   "path (valid)", "data": "else", "valid": True}]},
 {"description": "if appears at the end when serialized (keyword "
                 "processing sequence)",
  "schema": {"then": {"const": "yes"}, "else": {"const": "other"},
             "if": {"maxLength": 4}},
  "tests": [
   {"description": "yes redirects to then and passes", "data": "yes",
    "valid": True},
   {"description": "other redirects to else and passes", "data": "other",
    "valid": True},
   {"description": "no redirects to then and fails", "data": "no",
    "valid": False},
   {"description": "invalid redirects to else and fails", "data": "invalid",
    "valid": False}]}]

D["boolean_schema"] = [
 {"description": "boolean schema 'true'", "schema": True,
  "tests": [
   {"description": "number is valid", "data": 1, "valid": True},
   {"description": "string is valid", "data": "foo", "valid": True},
   {"description": "boolean true is valid", "data": True, "valid": True},
   {"description": "boolean false is valid", "data": False, "valid": True},
   {"description": "object is valid", "data": {"foo": "bar"},
    "valid": True},
   {"description": "empty object is valid", "data": {}, "valid": True},
   {"description": "array is valid", "data": ["foo"], "valid": True},
   {"description": "empty array is valid", "data": [], "valid": True}]},
 {"description": "boolean schema 'false'", "schema": False,
  "tests": [
   {"description": "number is invalid", "data": 1, "valid": False},
   {"description": "string is invalid", "data": "foo", "valid": False},
   {"description": "boolean true is invalid", "data": True,
    "valid": False},
   {"description": "boolean false is invalid", "data": False,
    "valid": False},
   {"description": "object is invalid", "data": {"foo": "bar"},
    "valid": False},
   {"description": "empty object is invalid", "data": {}, "valid": False},
   {"description": "array is invalid", "data": ["foo"], "valid": False},
   {"description": "empty array is invalid", "data": [], "valid": False}]}]

D["ref"] = [
 {"description": "root pointer ref",
  "schema": {"properties": {"foo": {"$ref": "#"}},
             "additionalProperties": False},
  "tests": [
   {"description": "match", "data": {"foo": False}, "valid": True},
   {"description": "recursive match", "data": {"foo": {"foo": False}},
    "valid": True},
   {"description": "mismatch", "data": {"bar": False}, "valid": False},
   {"description": "recursive mismatch", "data": {"foo": {"bar": False}},
    "valid": False}]},
 {"description": "relative pointer ref to object property",
  "schema": {"properties": {"foo": {"type": "integer"},
                            "bar": {"$ref": "#/properties/foo"}}},
  "tests": [
   {"description": "match", "data": {"bar": 3}, "valid": True},
   {"description": "mismatch", "data": {"bar": True}, "valid": False}]},
 {"description": "relative pointer ref to array element",
  "schema": {"items": [{"type": "integer"},
                       {"$ref": "#/items/0"}]},
  "tests": [
   {"description": "match array", "data": [1, 2], "valid": True},
   {"description": "mismatch array", "data": [1, "foo"], "valid": False}]},
 {"description": "escaped pointer ref",
  "schema": {"definitions": {"tilde~field": {"type": "integer"},
                             "slash/field": {"type": "integer"},
                             "percent%field": {"type": "integer"}},
             "properties": {
                 "tilde": {"$ref": "#/definitions/tilde~0field"},
                 "slash": {"$ref": "#/definitions/slash~1field"},
                 "percent": {"$ref": "#/definitions/percent%25field"}}},
  "tests": [
   {"description": "slash invalid", "data": {"slash": "aoeu"},
    "valid": False},
   {"description": "tilde invalid", "data": {"tilde": "aoeu"},
    "valid": False},
   {"description": "percent invalid", "data": {"percent": "aoeu"},
    "valid": False},
   {"description": "slash valid", "data": {"slash": 123}, "valid": True},
   {"description": "tilde valid", "data": {"tilde": 123}, "valid": True},
   {"description": "percent valid", "data": {"percent": 123},
    "valid": True}]},
 {"description": "nested refs",
  "schema": {"definitions": {
      "a": {"type": "integer"},
      "b": {"$ref": "#/definitions/a"},
      "c": {"$ref": "#/definitions/b"}},
      "allOf": [{"$ref": "#/definitions/c"}]},
  "tests": [
   {"description": "nested ref valid", "data": 5, "valid": True},
   {"description": "nested ref invalid", "data": "a", "valid": False}]},
 {"description": "ref overrides any sibling keywords",
  "schema": {"definitions": {"reffed": {"type": "array"}},
             "properties": {"foo": {"$ref": "#/definitions/reffed",
                                    "maxItems": 2}}},
  "tests": [
   {"description": "ref valid", "data": {"foo": []}, "valid": True},
   {"description": "ref valid, maxItems ignored",
    "data": {"foo": [1, 2, 3]}, "valid": True},
   {"description": "ref invalid", "data": {"foo": "string"},
    "valid": False}]},
 {"description": "property named $ref that is not a reference",
  "schema": {"properties": {"$ref": {"type": "string"}}},
  "tests": [
   {"description": "property named $ref valid", "data": {"$ref": "a"},
    "valid": True},
   {"description": "property named $ref invalid", "data": {"$ref": 2},
    "valid": False}]},
 {"description": "$ref to boolean schema true",
  "schema": {"allOf": [{"$ref": "#/definitions/bool"}],
             "definitions": {"bool": True}},
  "tests": [
   {"description": "any value is valid", "data": "foo", "valid": True}]},
 {"description": "$ref to boolean schema false",
  "schema": {"allOf": [{"$ref": "#/definitions/bool"}],
             "definitions": {"bool": False}},
  "tests": [
   {"description": "any value is invalid", "data": "foo",
    "valid": False}]},
 {"description": "recursive references between schemas (tree of nodes)",
  "schema": {"definitions": {
      "node": {"type": "object",
               "properties": {"value": {"type": "number"},
                              "subtree": {"$ref": "#"}},
               "required": ["value"]}},
      "type": "object",
      "properties": {"meta": {"type": "string"},
                     "nodes": {"type": "array",
                               "items": {"$ref": "#/definitions/node"}}},
      "required": ["meta", "nodes"]},
  "tests": [
   {"description": "valid tree",
    "data": {"meta": "root", "nodes": [
        {"value": 1, "subtree": {"meta": "child", "nodes": []}},
        {"value": 2}]}, "valid": True},
   {"description": "invalid tree: string value",
    "data": {"meta": "root",
             "nodes": [{"value": "string is invalid"}]},
    "valid": False}]}]

D["definitions"] = [
 {"description": "validate definition against definition subschema",
  "schema": {"definitions": {"foo": {"type": "integer"}},
             "$ref": "#/definitions/foo"},
  "tests": [
   {"description": "valid definition schema", "data": 5, "valid": True},
   {"description": "invalid definition schema", "data": "a",
    "valid": False}]}]

D["default"] = [
 {"description": "invalid type for default",
  "schema": {"properties": {"foo": {"type": "integer", "default": []}}},
  "tests": [
   {"description": "valid when property is specified", "data": {"foo": 13},
    "valid": True},
   {"description": "still valid when the invalid default is used",
    "data": {}, "valid": True}]},
 {"description": "invalid string value for default",
  "schema": {"properties": {
      "bar": {"type": "string", "minLength": 4, "default": "bad"}}},
  "tests": [
   {"description": "valid when property is specified",
    "data": {"bar": "good"}, "valid": True},
   {"description": "still valid when the invalid default is used",
    "data": {}, "valid": True}]},
 {"description": "the default keyword does not do anything if the "
                 "property is missing",
  "schema": {"type": "object",
             "properties": {"alpha": {"type": "number", "maximum": 3,
                                      "default": 5}}},
  "tests": [
   {"description": "an explicit property value is checked against "
                   "maximum (passing)", "data": {"alpha": 1},
    "valid": True},
   {"description": "an explicit property value is checked against "
                   "maximum (failing)", "data": {"alpha": 5},
    "valid": False},
   {"description": "missing properties are not filled in with the default",
    "data": {}, "valid": True}]}]

for name, content in D.items():
    with open(os.path.join(HERE, name + ".json"), "w") as f:
        json.dump(content, f, indent=1, ensure_ascii=False)
print("wrote", sorted(D))
