"""Golden parity with the reference's flagship reflection tests: the README
MyStruct example (/root/reference/example_test.go:236-281) and the Org/Person
fixture (/root/reference/reflect_test.go:36-148), re-expressed as virtual
records over Arrow types.

Divergence policy: `type` unions are compared as SETS (draft-07 set
semantics) because the reference emits ["null","string"] and the engine emits
["string","null"]; everything else must match the golden JSON exactly.
"""

import json

import pyarrow as pa

from rayschema.infer import (
    InferOptions,
    NamedType,
    VirtualField,
    VirtualList,
    VirtualStruct,
    infer_schema,
)
from rayschema.serde import schema_to_dict


def norm_types(v):
    if isinstance(v, dict):
        return {k: (sorted(x) if k == "type" and isinstance(x, list) else norm_types(x))
                for k, x in v.items()}
    if isinstance(v, list):
        return [norm_types(x) for x in v]
    return v


def test_readme_mystruct_golden():
    # example_test.go:236-281 golden output
    my_struct = VirtualStruct(
        title="My Struct", description="Holds my data.",
        meta={"additionalProperties": False},
        fields=[
            VirtualField("amount", pa.float64(), required=True,
                         meta={"minimum": 10.5, "examples": [20.6]}),
            VirtualField("abc", pa.string(), meta={"pattern": "[abc]"}),
        ])
    got = schema_to_dict(infer_schema(my_struct))
    expected = json.loads("""{
      "title": "My Struct",
      "description": "Holds my data.",
      "required": ["amount"],
      "additionalProperties": false,
      "properties": {
        "abc": {"pattern": "[abc]", "type": "string"},
        "amount": {"examples": [20.6], "minimum": 10.5, "type": "number"}
      },
      "type": "object"
    }""")
    assert norm_types(got) == norm_types(expected)


def test_org_person_golden():
    # reflect_test.go:116-148 golden output (TestReflector_Reflect)
    enumed = NamedType("JsonschemaGoTestEnumed", pa.string(),
                       meta={"enum": ["foo", "bar"]})

    class Person(VirtualStruct):
        def prepare_json_schema(self, s):
            s.title = "Person"

    person = Person(
        def_name="JsonschemaGoTestPerson",
        fields=[
            # embedded Entity fields flattened (anonymous embed, reflect.go:1079)
            VirtualField("createdAt", pa.timestamp("us")),
            VirtualField("deletedAt", pa.timestamp("us"), nullable=True),
            VirtualField("birthDate", pa.date32(), meta={"name_override": None}),
            VirtualField("deathDate", pa.date32(), nullable=True),
            VirtualField("meta", pa.null(), meta={"raw_message": True}),
            # Person's own fields; BirthDate shadowed by `date`
            VirtualField("date", pa.string(), meta={"format": "date"}),
            VirtualField("firstName", pa.string()),
            VirtualField("lastName", pa.string(), required=True),
            VirtualField("height", pa.int32()),
            VirtualField("role", pa.string(),
                         meta={"description": "The role of person."}),
            VirtualField("enumed", enumed),
            VirtualField("enumedPtr", enumed, nullable=True),
        ])

    class Org(VirtualStruct):
        def prepare_json_schema(self, s):
            s.title = "Organization"

    org = Org(fields=[
        VirtualField("chiefOfMorale", person),
        VirtualField("employees", VirtualList(person)),
    ])

    # json.RawMessage maps to the empty schema `{}` (reflect_test.go:136):
    # model `meta` as a no-type field via an intercept
    def ischema(path, subject, schema):
        if path[-1:] == ["meta"]:
            schema.type = None
            return True
        return None

    got = schema_to_dict(infer_schema(org, InferOptions(intercept_schema=ischema)))

    expected = json.loads("""{
      "title": "Organization",
      "definitions": {
        "JsonschemaGoTestEnumed": {"enum": ["foo", "bar"], "type": "string"},
        "JsonschemaGoTestPerson": {
          "title": "Person", "required": ["lastName"],
          "properties": {
            "birthDate": {"type": "string", "format": "date"},
            "createdAt": {"type": "string", "format": "date-time"},
            "date": {"type": "string", "format": "date"},
            "deathDate": {"type": ["null", "string"], "format": "date"},
            "deletedAt": {"type": ["null", "string"], "format": "date-time"},
            "enumed": {"$ref": "#/definitions/JsonschemaGoTestEnumed"},
            "enumedPtr": {"$ref": "#/definitions/JsonschemaGoTestEnumed"},
            "firstName": {"type": "string"}, "height": {"type": "integer"},
            "lastName": {"type": "string"}, "meta": {},
            "role": {"description": "The role of person.", "type": "string"}
          },
          "type": "object"
        }
      },
      "properties": {
        "chiefOfMorale": {"$ref": "#/definitions/JsonschemaGoTestPerson"},
        "employees": {"items": {"$ref": "#/definitions/JsonschemaGoTestPerson"},
                      "type": "array"}
      },
      "type": "object"
    }""")
    assert norm_types(got) == norm_types(expected)


def test_named_interface_intercept_golden():
    # reflect_test.go:87-115: InterceptSchema forcing string/binary + named def
    upload_t = NamedType("MultipartFile", pa.string(), meta={"format": "binary"})
    s = VirtualStruct(fields=[VirtualField("upload", upload_t, nullable=True)])

    got = schema_to_dict(infer_schema(s))
    expected = json.loads("""{
      "definitions": {"MultipartFile": {"type": ["null", "string"], "format": "binary"}},
      "properties": {"upload": {"$ref": "#/definitions/MultipartFile"}},
      "type": "object"
    }""")
    assert norm_types(got) == norm_types(expected)
