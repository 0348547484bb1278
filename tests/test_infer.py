"""Inference tests: Arrow type -> Schema IR mapping rules, options and
interceptors — golden expectations mirroring the reference's reflect tests
(SURVEY.md §5; reflect_test.go golden-JSON pattern)."""

import json

import pyarrow as pa
import pytest

from rayschema.infer import (
    Inferrer,
    InferOptions,
    NamedType,
    SkipProperty,
    VirtualField,
    VirtualStruct,
    infer_schema,
    to_camel,
)
from rayschema.serde import json_equal, schema_to_dict, schema_to_json
from rayschema.trivial import is_trivial


def infer_dict(subject, options=None, **kw):
    return schema_to_dict(infer_schema(subject, options, **kw))


def test_to_camel():
    # camelcase.go:14-50 incl. digit-sequence splitting (9-10)
    assert to_camel("org_unit") == "OrgUnit"
    assert to_camel("hello world") == "HelloWorld"
    assert to_camel("abc2d") == "Abc2D"
    assert to_camel("already Camel") == "AlreadyCamel"
    assert to_camel("with-dash.and.dot") == "WithDashAndDot"


def test_scalar_kinds():
    # kindSwitch rules (reflect.go:951-963)
    assert infer_dict(pa.bool_()) == {"type": "boolean"}
    assert infer_dict(pa.int32()) == {"type": "integer"}
    assert infer_dict(pa.float64()) == {"type": "number"}
    assert infer_dict(pa.string()) == {"type": "string"}
    assert infer_dict(pa.null()) == {"type": "null"}


def test_uint_minimum_zero_and_trivial_quirk():
    # reflect.go:955-957 + helper.go:200-212
    s = infer_schema(pa.uint16())
    assert schema_to_dict(s) == {"type": "integer", "minimum": 0}
    assert is_trivial(s) is True          # uint-backed minimum:0 stays trivial


def test_well_known_types():
    # reflect.go:742-776 re-expressed for Arrow
    assert infer_dict(pa.binary()) == {"type": "string", "format": "base64"}
    assert infer_dict(pa.timestamp("us")) == {"type": "string", "format": "date-time"}
    assert infer_dict(pa.date32()) == {"type": "string", "format": "date"}
    assert infer_dict(pa.time64("us")) == {"type": "string", "format": "time"}
    d = infer_dict(pa.binary(16))
    assert d["format"] == "uuid" and d["examples"]


def test_struct_nullability_and_required():
    sch = pa.schema([
        pa.field("a", pa.int64(), nullable=False),
        pa.field("b", pa.string(), nullable=True),
    ])
    d = infer_dict(sch)
    assert d["required"] == ["a"]
    assert d["properties"]["a"] == {"type": "integer"}
    assert d["properties"]["b"]["type"] == ["string", "null"]


def test_list_map_recursion():
    d = infer_dict(pa.list_(pa.int64()))
    assert d == {"type": "array", "items": {"type": ["integer", "null"]}} or \
        d == {"type": "array", "items": {"type": "integer"}}
    d2 = infer_dict(pa.map_(pa.string(), pa.string()))
    assert d2["type"] == "object" and d2["additionalProperties"]["type"] == "string"
    d3 = infer_dict(pa.list_(pa.float32(), 3) if hasattr(pa, "list_") else None)


def test_fixed_size_list_bounds():
    d = infer_dict(pa.list_(pa.float32(), 4))
    assert d["minItems"] == 4 and d["maxItems"] == 4


def test_nested_struct_hoisted_to_definitions():
    inner = pa.struct([pa.field("x", pa.int64(), nullable=False)])
    sch = pa.schema([pa.field("first", inner), pa.field("second", inner)])
    s = infer_schema(sch)
    d = schema_to_dict(s)
    # repeated anonymous struct type -> one definition, two $refs
    assert len(d["definitions"]) == 1
    name = next(iter(d["definitions"]))
    ref = f"#/definitions/{name}"
    assert d["properties"]["first"]["$ref"] == ref
    assert d["properties"]["second"]["$ref"] == ref


def test_inline_refs_option():
    # InlineRefs (context.go:191-193)
    inner = pa.struct([pa.field("x", pa.int64(), nullable=False)])
    sch = pa.schema([pa.field("first", inner)])
    d = infer_dict(sch, InferOptions(inline_refs=True))
    assert "definitions" not in d
    assert d["properties"]["first"]["properties"]["x"] == {"type": "integer"}


def test_root_ref_and_root_nullable():
    # RootRef / RootNullable (context.go:196-203)
    sch = pa.schema([pa.field("a", pa.int64(), nullable=False)])
    d = infer_dict(sch, InferOptions(root_ref=True), root_def_name="Sample")
    assert d["$ref"] == "#/definitions/Sample"
    assert "Sample" in d["definitions"]
    d2 = infer_dict(sch, InferOptions(root_nullable=True))
    assert "null" in d2["type"]


def test_property_name_mapping_and_skip():
    # PropertyNameMapping (context.go:225-229) + "-" skip (reflect.go:1073)
    sch = pa.schema([pa.field("internal_id", pa.int64(), nullable=False),
                     pa.field("drop_me", pa.string())])
    opts = InferOptions(property_name_mapping={"internal_id": "id", "drop_me": "-"})
    d = infer_dict(sch, opts)
    assert list(d["properties"]) == ["id"]
    assert d["required"] == ["id"]


def test_field_meta_constraints_and_enum():
    # tag->keyword analog (reflect.go:1140-1220, enum 1426-1520)
    sch = pa.schema([pa.field("amount", pa.float64(), nullable=False),
                     pa.field("kind", pa.string(), nullable=False)])
    opts = InferOptions(field_meta={
        "amount": {"minimum": 10.5, "title": "Amount"},
        "kind": {"enum": "foo,bar", "enum_names": ["Foo", "Bar"], "default": "foo"},
    })
    d = infer_dict(sch, opts)
    assert d["properties"]["amount"]["minimum"] == 10.5
    assert d["properties"]["amount"]["title"] == "Amount"
    assert d["properties"]["kind"]["enum"] == ["foo", "bar"]
    assert d["properties"]["kind"]["x-enum-names"] == ["Foo", "Bar"]
    assert d["properties"]["kind"]["default"] == "foo"


def test_arrow_field_metadata_tags():
    f = pa.field("v", pa.string(), nullable=False,
                 metadata={"pattern": "\"^a\"", "description": "\"doc\""})
    d = infer_dict(pa.schema([f]))
    assert d["properties"]["v"]["pattern"] == "^a"
    assert d["properties"]["v"]["description"] == "doc"


def test_interceptors():
    # InterceptSchema / InterceptProp (context.go:124-172)
    calls = []

    def iprop(name, f, sub):
        calls.append(name)
        if name == "secret":
            raise SkipProperty()

    sch = pa.schema([pa.field("a", pa.int64(), nullable=False),
                     pa.field("secret", pa.string())])
    d = infer_dict(sch, InferOptions(intercept_prop=iprop))
    assert "secret" not in d.get("properties", {})
    assert calls == ["a", "secret"]

    def ischema(path, subject, schema):
        if isinstance(subject, pa.DataType) and pa.types.is_string(subject):
            schema.type = "string"
            schema.format = "custom"
            return True
        return None

    d2 = infer_dict(pa.schema([pa.field("s", pa.string(), nullable=False)]),
                    InferOptions(intercept_schema=ischema))
    assert d2["properties"]["s"]["format"] == "custom"


def test_envelop_nullability():
    # EnvelopNullability (context.go:281, reflect.go:1380-1391)
    inner = pa.struct([pa.field("x", pa.int64(), nullable=False)])
    sch = pa.schema([pa.field("first", inner, nullable=True),
                     pa.field("second", inner, nullable=False)])
    d = infer_dict(sch, InferOptions(envelop_nullability=True))
    env = d["properties"]["first"]
    assert env["anyOf"][0] == {"type": "null"}
    assert env["anyOf"][1]["$ref"].startswith("#/definitions/")


def test_virtual_struct():
    # Struct/Field virtual records (struct.go:13-29, reflect.go:1039-1053)
    vs = VirtualStruct(
        title="Virtual", def_name="SampleVirtual",
        fields=[VirtualField("id", pa.int64(), required=True),
                VirtualField("name", pa.string(), nullable=True,
                             meta={"minLength": 1})])
    d = infer_dict(vs)
    assert d["title"] == "Virtual"
    assert d["type"] == "object"
    assert d["required"] == ["id"]
    assert d["properties"]["name"]["minLength"] == 1
    assert "null" in d["properties"]["name"]["type"]


def test_def_name_conflict_suffix():
    # conflict suffix TypeN (reflect.go:816-836)
    inner1 = pa.struct([pa.field("x", pa.int64(), nullable=False)])
    inner2 = pa.struct([pa.field("y", pa.int64(), nullable=False)])
    sch = pa.schema([pa.field("thing", inner1), pa.field("other", inner2)])
    opts = InferOptions(intercept_def_name=lambda t, n: "Same")
    d = infer_dict(sch, opts)
    names = set(d["definitions"])
    assert names == {"Same", "SameType1"}


def test_inferred_schema_validates_its_table():
    # end-to-end: infer from the table's own schema, compile, validate -> all pass
    from rayschema.compile import compile_validator

    t = pa.table({"a": pa.array([1, 2], type=pa.int64()),
                  "b": pa.array(["x", None], type=pa.string())})
    sch = pa.schema([pa.field("a", pa.int64(), nullable=False),
                     pa.field("b", pa.string(), nullable=True)])
    ir = infer_schema(sch)
    v = compile_validator(ir)
    assert v.probe(t).tolist() == [True, True]


def test_collect_definitions_callback():
    # CollectDefinitions (context.go:12-16)
    got = {}
    inner = pa.struct([pa.field("x", pa.int64(), nullable=False)])
    sch = pa.schema([pa.field("first", inner)])
    d = infer_dict(sch, InferOptions(collect_definitions=lambda k, v: got.__setitem__(k, v)))
    assert "definitions" not in d
    assert list(got) == ["First"]


def test_exposer_and_preparer_analogs():
    # Exposer / Preparer (helper.go:26-38, reflect.go:129-182, 533-541)
    class Exposed:
        def json_schema(self):
            return '{"type":"string","format":"custom-exposed"}'

    class Prepared(VirtualStruct):
        def prepare_json_schema(self, s):
            s.title = "prepared!"

    d = infer_dict(pa.schema([]), InferOptions())  # smoke empty
    sch = infer_schema(Exposed())
    assert schema_to_dict(sch)["format"] == "custom-exposed"
    vs = Prepared(fields=[VirtualField("a", pa.int64(), required=True)])
    d2 = infer_dict(vs)
    assert d2["title"] == "prepared!" and d2["required"] == ["a"]


def test_type_mapping_and_inline_definition_options():
    # AddTypeMapping / InlineDefinition analogs (reflect.go:103-120)
    from rayschema.serde import schema_from_json

    opts = InferOptions(type_mapping={
        str(pa.int8()): pa.string(),
        str(pa.float16()): schema_from_json('{"type":"number","title":"half"}'),
    })
    d = infer_dict(pa.schema([pa.field("a", pa.int8(), nullable=False),
                              pa.field("b", pa.float16(), nullable=False)]), opts)
    assert d["properties"]["a"] == {"type": "string"}
    assert d["properties"]["b"]["title"] == "half"
    inner = pa.struct([pa.field("x", pa.int64(), nullable=False)])
    d2 = infer_dict(pa.schema([pa.field("first", inner)]),
                    InferOptions(inline_definitions=[str(inner)]))
    assert "definitions" not in d2
    assert "properties" in d2["properties"]["first"]


def test_oneof_anyof_allof_helpers():
    # OneOf/AnyOf/AllOf helpers (reflect.go:1535-1595)
    from rayschema.infer import all_of, any_of, one_of

    s = one_of(pa.string(), pa.int64())
    d = schema_to_dict(s)
    assert d == {"oneOf": [{"type": "string"}, {"type": "integer"}]}
    d2 = schema_to_dict(any_of(pa.schema([pa.field("a", pa.int64(), nullable=False)]),
                               pa.bool_()))
    assert d2["anyOf"][0]["properties"]["a"] == {"type": "integer"}
    assert d2["anyOf"][1] == {"type": "boolean"}
    d3 = schema_to_dict(all_of(pa.float64()))
    assert d3 == {"allOf": [{"type": "number"}]}
    # combined schema compiles and validates
    from rayschema.compile import compile_validator

    v = compile_validator(one_of(pa.string(), pa.int64()))
    arr = pa.array([1.0, 1.5])
    assert v.probe(arr).tolist() == [True, False]


def test_anonymous_embed_flatten_and_refer():
    # embedded structs: flattened by default, allOf-referenced with
    # refer=True (reflect.go:1079-1098, EmbedReferencer)
    base = VirtualStruct(def_name="Base",
                         fields=[VirtualField("id", pa.int64(), required=True)])
    flat = VirtualStruct(fields=[VirtualField("", base),
                                 VirtualField("x", pa.string())])
    d = infer_dict(flat)
    assert d["properties"]["id"] == {"type": "integer"}
    assert d["required"] == ["id"]
    referred = VirtualStruct(fields=[VirtualField("", base, meta={"refer": True}),
                                     VirtualField("x", pa.string())])
    d2 = infer_dict(referred)
    assert d2["allOf"][0]["$ref"] == "#/definitions/Base"
    assert "id" not in d2.get("properties", {})


def test_named_type_inline_marker():
    # SchemaInliner analog (reflect.go:49-51)
    t = NamedType("Inlined", pa.string(), meta={"minLength": 1}, inline=True)
    d = infer_dict(VirtualStruct(fields=[VirtualField("v", t, required=True)]))
    assert "definitions" not in d
    assert d["properties"]["v"]["minLength"] == 1


def test_process_without_tags_option():
    # context.go:232-234: with process_without_tags=False, only fields
    # carrying an explicit meta "name" tag are reflected; the tag also names
    # the property (PropertyNameTag analog)
    vs = VirtualStruct(fields=[
        VirtualField("a", pa.int64(), meta={"name": "renamed_a"}),
        VirtualField("b", pa.string()),
    ])
    d = infer_dict(vs, InferOptions(process_without_tags=False))
    assert list(d["properties"]) == ["renamed_a"]
    d2 = infer_dict(vs)
    assert set(d2["properties"]) == {"renamed_a", "b"}


def test_skip_embedded_maps_slices_option():
    # context.go:237-239: anonymous map embeds shortcut the parent's
    # additionalProperties unless skipped
    vs = VirtualStruct(fields=[
        VirtualField("", pa.map_(pa.string(), pa.int64())),
        VirtualField("x", pa.string()),
    ])
    d = infer_dict(vs)
    assert d["additionalProperties"] == {"type": "integer"}
    d2 = infer_dict(vs, InferOptions(skip_embedded_maps_slices=True))
    assert "additionalProperties" not in d2


def test_skip_unsupported_properties_option():
    # context.go:242-244: duration (no JSON mapping) raises UnsupportedType
    # by default, is dropped with the option
    from rayschema.infer import UnsupportedType

    vs = VirtualStruct(fields=[
        VirtualField("ok", pa.int64()),
        VirtualField("bad", pa.duration("s")),
    ])
    with pytest.raises(UnsupportedType):
        infer_dict(vs)
    d = infer_dict(vs, InferOptions(skip_unsupported_properties=True))
    assert list(d["properties"]) == ["ok"]


def test_unnamed_field_with_tag_option():
    # reflect.go:1101-1122 + context.go:273-278: "_" fields configure the
    # parent schema; with unnamed_field_with_tag they need a "name" tag
    vs = VirtualStruct(fields=[
        VirtualField("_", pa.struct([]), meta={"additionalProperties": False,
                                               "title": "Parent"}),
        VirtualField("x", pa.string()),
    ])
    d = infer_dict(vs)
    assert d["additionalProperties"] is False and d["title"] == "Parent"
    d2 = infer_dict(vs, InferOptions(unnamed_field_with_tag=True))
    assert "additionalProperties" not in d2
    vs2 = VirtualStruct(fields=[
        VirtualField("_", pa.struct([]), meta={"name": "_",
                                               "additionalProperties": False}),
    ])
    d3 = infer_dict(vs2, InferOptions(unnamed_field_with_tag=True))
    assert d3["additionalProperties"] is False
