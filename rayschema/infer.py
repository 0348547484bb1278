"""Schema inference: Arrow schema / virtual record -> Schema IR.

The engine analog of the reference's ``Reflector`` (SURVEY.md §2.B,
/root/reference/reflect.go): where the reference walks Go types with
``reflect``, this walks ``pyarrow`` types — the rules are the same mapping
table re-expressed for Arrow (kindSwitch reflect.go:839-973, well-knowns
reflect.go:742-776, nullability reflect.go:1332-1393). Inference is a
DRIVER-side operation (runs once per pipeline, never per row); the resulting
IR compiles to the vectorized validator (compile.py).

Mapping rules:
* struct -> object + properties; non-nullable field -> ``required`` (our
  analog of the required tag reflect.go:1144-1154); nullable field ->
  ``type: [..., "null"]`` (pointer nullability, reflect.go:439-441, 1372-1376)
* list/large_list/fixed_size_list -> array + items recursion
  (reflect.go:856-901; fixed_size_list also sets min/maxItems)
* map -> object + additionalProperties recursion (reflect.go:903-949)
* int types -> integer; UNSIGNED ints also get ``minimum: 0`` and keep
  ``reflect_type`` so the is_trivial uint quirk holds (reflect.go:955-957,
  helper.go:200-212)
* float/decimal -> number; bool -> boolean; string -> string
* well-knowns (reflect.go:742-776): binary -> string format base64;
  fixed_size_binary(16) -> string format uuid (+ example);
  timestamp -> string format date-time; date32/64 -> string format date;
  time32/64 -> string format time
* dictionary -> its value type; null -> type "null"

Extension surface (§2.E): options mirror the reference's Reflect options —
property-name mapping, interceptors (schema/property/def-name), inline refs,
root ref/nullable, definitions collection — plus per-field metadata (the
Arrow analog of Go struct tags: Arrow Field.metadata keys or an explicit
``field_meta`` dict) carrying title/description/format/pattern/minimum/
enum/default/examples/required/nullable.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import pyarrow as pa

from rayschema.ir import ABSENT, Schema

# ----------------------------------------------------------------------- toCamel


_NUM_SEQ = re.compile(r"([a-zA-Z])(\d+)([a-zA-Z]?)")


def to_camel(s: str) -> str:
    """CamelCase normalizer, porting the reference's digit-splitting rules
    (camelcase.go:9-50): 'org_unit' -> 'OrgUnit', 'abc2d' -> 'Abc2D'."""
    s = _NUM_SEQ.sub(r"\1 \2 \3", s).strip()
    out = []
    cap_next = True
    for ch in s:
        if "A" <= ch <= "Z":
            out.append(ch)
        if "0" <= ch <= "9":
            out.append(ch)
        if ch in "[]":
            out.append(ch)
        if "a" <= ch <= "z":
            out.append(ch.upper() if cap_next else ch)
        cap_next = ch in "_ -.[]·"
    return "".join(out)


# ----------------------------------------------------------------------- virtual records
@dataclass
class VirtualField:
    """Field of a virtual record (Field analog, /root/reference/struct.go:22-29)."""

    name: str
    type: Any                      # pa.DataType | VirtualStruct
    required: bool = False
    nullable: bool = False
    meta: Dict[str, Any] = dc_field(default_factory=dict)


@dataclass
class VirtualStruct:
    """Runtime-defined record treated like a static struct
    (Struct analog, /root/reference/struct.go:13-20). ``meta`` carries
    parent-schema keywords — the analog of the reference's unnamed `_` config
    fields (reflect.go:1101-1122), e.g. {"additionalProperties": False}."""

    fields: List[VirtualField]
    title: Optional[str] = None
    description: Optional[str] = None
    def_name: Optional[str] = None
    nullable: bool = False
    meta: Dict[str, Any] = dc_field(default_factory=dict)


@dataclass
class VirtualList:
    """A list-of-<virtual subject> type for virtual records (the analog of a
    Go slice field, reflect.go:856-901)."""

    element: Any                   # pa.DataType | VirtualStruct | NamedType
    meta: Dict[str, Any] = dc_field(default_factory=dict)


@dataclass
class NamedType:
    """A named scalar/derived type hoisted into definitions — the analog of a
    Go named type like `type Enumed string` with an Enum() implementation
    (reflect_test.go:55-61; defName reflect.go:780-837). ``inline=True`` is
    the SchemaInliner marker analog (reflect.go:49-51): never hoisted."""

    def_name: str
    type: Any                      # pa.DataType
    meta: Dict[str, Any] = dc_field(default_factory=dict)
    inline: bool = False


# ----------------------------------------------------------------------- options
class SkipProperty(Exception):
    """Raised by an intercept_prop hook to drop a property
    (ErrSkipProperty analog, reflect.go:33-35)."""


class UnsupportedType(Exception):
    """An Arrow type with no JSON mapping (union/duration/interval — the
    func/chan analog). Raised during inference unless
    InferOptions.skip_unsupported_properties drops the property instead
    (context.go:242-244)."""


@dataclass
class InferOptions:
    """Mirror of the reference's reflection options (context.go:12-244)."""

    definitions_prefix: str = "#/definitions/"
    property_name_mapping: Dict[str, str] = dc_field(default_factory=dict)
    required_from_nullability: bool = True     # non-nullable arrow field -> required
    nullable_from_arrow: bool = True           # nullable field type += "null"
    envelop_nullability: bool = False          # $ref nullability via anyOf envelope
    root_ref: bool = False
    root_nullable: bool = False
    inline_refs: bool = False
    # context.go:232-234 — the reference default SKIPS untagged Go fields;
    # Arrow fields are self-describing, so the engine default processes all.
    # False = only fields carrying an explicit meta "name" tag are reflected.
    process_without_tags: bool = True
    # context.go:237-239 — ignore anonymous map/list embeds instead of
    # shortcutting the parent schema into their additionalProperties/items
    skip_embedded_maps_slices: bool = False
    # context.go:242-244 — drop properties whose Arrow type has no JSON
    # mapping (union/duration/interval) instead of raising UnsupportedType
    skip_unsupported_properties: bool = False
    # context.go:273-278 — parent-config "_" fields require a meta "name" tag
    unnamed_field_with_tag: bool = False
    strip_definition_name_prefix: List[str] = dc_field(default_factory=list)
    skip_non_constraints: bool = False         # drop title/description/examples
    field_meta: Dict[str, Dict[str, Any]] = dc_field(default_factory=dict)
    # interceptors (context.go:124-188); called (path, subject, schema)
    intercept_schema: Optional[Callable[[List[str], Any, Schema], Optional[bool]]] = None
    intercept_prop: Optional[Callable[[str, Any, Schema], None]] = None
    intercept_def_name: Optional[Callable[[Any, str], str]] = None
    intercept_nullability: Optional[Callable[[Any, Schema], None]] = None
    collect_definitions: Optional[Callable[[str, Schema], None]] = None
    # AddTypeMapping analog (reflect.go:103-112): substitute one Arrow type
    # (keyed by str(type)) with another type or a fixed Schema before mapping
    type_mapping: Dict[str, Any] = dc_field(default_factory=dict)
    # InlineDefinition analog (reflect.go:115-120): per-type inline forcing
    inline_definitions: List[str] = dc_field(default_factory=list)


_META_KEYWORDS = {
    "title": "title", "description": "description", "format": "format",
    "pattern": "pattern", "minimum": "minimum", "maximum": "maximum",
    "exclusiveMinimum": "exclusive_minimum", "exclusiveMaximum": "exclusive_maximum",
    "multipleOf": "multiple_of", "minLength": "min_length", "maxLength": "max_length",
    "minItems": "min_items", "maxItems": "max_items", "uniqueItems": "unique_items",
    "const": "const",
}


class Inferrer:
    """Driver-side schema inferrer with cross-call definition caches
    (Reflector state analog, reflect.go:93-98)."""

    def __init__(self, options: Optional[InferOptions] = None):
        self.options = options or InferOptions()
        self._definitions: Dict[str, Schema] = {}
        self._def_of_type: Dict[str, str] = {}
        self._def_index: Dict[str, int] = {}

    # ------------------------------------------------------------------ naming
    def _def_name(self, subject: Any, fallback: str) -> str:
        name = None
        if isinstance(subject, (VirtualStruct, NamedType)) and subject.def_name:
            name = subject.def_name
        if name is None:
            name = to_camel(fallback)
        for pref in self.options.strip_definition_name_prefix:
            if name.startswith(pref):
                name = name[len(pref):]
        if self.options.intercept_def_name:
            name = self.options.intercept_def_name(subject, name)
        base, i = name, self._def_index.get(name, 0)
        # conflict suffix TypeN (reflect.go:816-836)
        while name in self._definitions and self._def_of_type.get(self._fingerprint(subject)) != name:
            i += 1
            name = f"{base}Type{i}"
        self._def_index[base] = i
        return name

    @staticmethod
    def _fingerprint(subject: Any) -> str:
        if isinstance(subject, VirtualStruct):
            return "virtual:" + (subject.def_name or str(id(subject)))
        if isinstance(subject, NamedType):
            return "named:" + subject.def_name
        return "arrow:" + str(subject)

    # ------------------------------------------------------------------ entry
    def infer(self, subject: Union[pa.Schema, pa.DataType, VirtualStruct],
              root_def_name: str = "Root") -> Schema:
        """Reflect entry point (reflect.go:269-306): recurse, then merge
        collected definitions into the root (or stream to collect_definitions)."""
        self._definitions = {}
        if isinstance(subject, pa.Schema):
            subject = pa.struct(list(subject))
        path: List[str] = ["#"]
        schema = self._node(subject, path, root_def_name, top=True)
        if self.options.root_nullable:
            schema.add_type("null")
        if self.options.root_ref and not self.options.inline_refs:
            name = self._def_name(subject, root_def_name)
            self._definitions[name] = schema
            ref = Schema()
            ref.ref = self.options.definitions_prefix + _escape_ref(name)
            schema = ref
        if self._definitions:
            if self.options.collect_definitions:
                for k, v in self._definitions.items():
                    self.options.collect_definitions(k, v)
            else:
                schema.definitions = dict(self._definitions)
        return schema

    # ------------------------------------------------------------------ recursion
    def _node(self, t: Any, path: List[str], hint: str, top: bool = False,
              meta: Optional[Dict[str, Any]] = None,
              nullable: bool = False) -> Schema:
        s = self._node_inner(t, path, hint, top, meta, nullable)
        # Preparer analog (helper.go:26-28, reflect.go:533-541): subject may
        # post-process the mapped schema. Definable subjects are prepared
        # inside _maybe_define (the definition BODY is prepared; a
        # registry-hit $ref stub is returned untouched, mirroring the early
        # return at reflect.go:498-500).
        if not isinstance(t, (VirtualStruct, NamedType)):
            prepare = getattr(t, "prepare_json_schema", None)
            if callable(prepare):
                prepare(s)
        return s

    def _node_inner(self, t: Any, path: List[str], hint: str, top: bool = False,
                    meta: Optional[Dict[str, Any]] = None,
                    nullable: bool = False) -> Schema:
        # type-mapping substitution (reflect.go:458-466)
        mapped = self.options.type_mapping.get(str(t))
        if mapped is not None:
            if isinstance(mapped, Schema):
                return mapped.clone()
            t = mapped

        s = Schema()
        s.reflect_type = t if isinstance(t, pa.DataType) else None

        # Exposer / RawExposer analogs (helper.go:26-38, applied at
        # reflect.go:129-182): a subject exposing its own schema short-circuits
        # inference entirely.
        expose = getattr(t, "json_schema", None)
        if callable(expose):
            exposed = expose()
            if isinstance(exposed, (str, bytes)):
                from rayschema.serde import schema_from_json

                exposed = schema_from_json(exposed)
            return exposed

        if self.options.intercept_schema is not None:
            stop = self.options.intercept_schema(list(path), t, s)
            if stop:
                return s

        if isinstance(t, VirtualStruct):
            if not self.options.skip_non_constraints:
                s.title, s.description = t.title, t.description
            self._struct_fields(s, t.fields, path)
            want_null = t.nullable or (
                nullable and self._fingerprint(t) not in self._def_of_type)
            if s.type is None:
                # object first, null second
                s.type = ["object", "null"] if want_null else "object"
            elif want_null:
                s.add_type("null")
            if t.meta:
                if "additionalProperties" in t.meta:
                    s.additional_properties = t.meta["additionalProperties"]
                self._apply_meta(s, {k: v for k, v in t.meta.items()
                                     if k != "additionalProperties"})
            return self._maybe_define(t, s, hint, top)

        if isinstance(t, VirtualList):
            s.type = "array"
            sub = self._node(t.element, path + ["items"], hint + "Items")
            if not _is_empty_schema(sub):
                s.items = sub
            return self._apply_meta(self._apply_meta(s, t.meta), meta)

        if isinstance(t, NamedType):
            s = self._node_inner(t.type, path, hint, top=True, meta=t.meta)
            if nullable and self._fingerprint(t) not in self._def_of_type:
                s.add_type("null")
            return self._maybe_define(t, s, t.def_name, top)

        t = _undict(t)

        if self._well_known(t, s):
            return self._apply_meta(s, meta)

        if pa.types.is_struct(t):
            fields = [VirtualField(f.name, f.type, required=not f.nullable,
                                   nullable=f.nullable,
                                   meta=_arrow_field_meta(f)) for f in t]
            self._struct_fields(s, fields, path)
            s.type = "object"
            return self._apply_meta(self._maybe_define(t, s, hint, top), meta)

        if pa.types.is_map(t):
            s.type = "object"
            sub = self._node(t.item_type, path + ["additionalProperties"], hint + "Value")
            if not _is_empty_schema(sub):
                s.additional_properties = sub
            return self._apply_meta(s, meta)

        if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
            s.type = "array"
            sub = self._node(t.value_type, path + ["items"], hint + "Items")
            if not _is_empty_schema(sub):
                s.items = sub
            if pa.types.is_fixed_size_list(t):
                s.min_items = t.list_size
                s.max_items = t.list_size
            return self._apply_meta(s, meta)

        # scalar kinds (kindSwitch reflect.go:951-969)
        if pa.types.is_boolean(t):
            s.type = "boolean"
        elif pa.types.is_unsigned_integer(t):
            s.type = "integer"
            s.minimum = 0              # reflect.go:955-957
        elif pa.types.is_integer(t):
            s.type = "integer"
        elif pa.types.is_floating(t) or pa.types.is_decimal(t):
            s.type = "number"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            s.type = "string"
        elif pa.types.is_null(t):
            s.type = "null"
        elif isinstance(t, pa.DataType) and (
                pa.types.is_union(t) or pa.types.is_duration(t)
                or pa.types.is_interval(t)):
            # no JSON mapping — the func/chan analog (reflect.go:962-967);
            # skip_unsupported_properties drops the property at the caller
            raise UnsupportedType(str(t))
        # unknown types -> no type constraint (interface{} analog reflect.go:962)
        return self._apply_meta(s, meta)

    def _well_known(self, t: pa.DataType, s: Schema) -> bool:
        """reflect.go:742-776 re-expressed for Arrow physical types."""
        if pa.types.is_fixed_size_binary(t) and t.byte_width == 16:
            s.type = "string"
            s.format = "uuid"
            if not self.options.skip_non_constraints:
                s.examples = ["248df4b7-aa70-47b8-a036-33ac447e668d"]
            return True
        if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
            s.type = "string"
            s.format = "base64"
            return True
        if pa.types.is_timestamp(t):
            s.type = "string"
            s.format = "date-time"
            return True
        if pa.types.is_date(t):
            s.type = "string"
            s.format = "date"
            return True
        if pa.types.is_time(t):
            s.type = "string"
            s.format = "time"
            return True
        return False

    def _struct_fields(self, s: Schema, fields: Sequence[VirtualField],
                       path: List[str]) -> None:
        """walkProperties analog (reflect.go:1065-1254)."""
        props: Dict[str, Any] = {}
        required: List[str] = []
        for f in fields:
            # parent-config field "_" (reflect.go:1101-1122): its meta applies
            # to the PARENT schema; with unnamed_field_with_tag it must carry
            # an explicit "name" tag to be honored (context.go:273-278)
            if f.name == "_":
                cfg = dict(f.meta or {})
                if self.options.unnamed_field_with_tag and "name" not in cfg:
                    continue
                cfg.pop("name", None)
                if "additionalProperties" in cfg:
                    s.additional_properties = cfg.pop("additionalProperties")
                self._apply_meta(s, cfg)
                continue
            # anonymous map/list embed (reflect.go:865-901): shortcut the
            # parent into the embed's additionalProperties/items — or ignore
            # it entirely with skip_embedded_maps_slices (context.go:237-239)
            if f.name == "" and (isinstance(f.type, VirtualList) or (
                    isinstance(f.type, pa.DataType) and (
                        pa.types.is_map(f.type) or pa.types.is_list(f.type)
                        or pa.types.is_large_list(f.type)))):
                if self.options.skip_embedded_maps_slices:
                    continue
                sub = self._node(f.type, path, "Embedded")
                if sub.additional_properties is not None:
                    s.additional_properties = sub.additional_properties
                if sub.items is not None:
                    s.items = sub.items
                    s.type = "array"
                continue
            # anonymous embed (name ""): flatten the embedded struct's fields
            # into the parent (reflect.go:1079-1098); meta {"refer": True} is
            # the EmbedReferencer analog — reference it via allOf instead
            if f.name == "" and isinstance(f.type, VirtualStruct):
                if (f.meta or {}).get("refer"):
                    ref_schema = self._node(f.type, path, f.type.def_name or "Embedded")
                    s.all_of = (s.all_of or []) + [ref_schema]
                else:
                    self._struct_fields(s, f.type.fields, path)
                    if s.properties:
                        props.update(s.properties)
                    if s.required:
                        for r in s.required:
                            if r not in required:
                                required.append(r)
                continue
            meta = dict(f.meta or {})
            meta.update(self.options.field_meta.get(f.name, {}))
            # tag-provided name wins over the mapping (PropertyNameTag analog,
            # context.go:210-222); with process_without_tags=False, untagged
            # fields are skipped entirely (context.go:232-234)
            if not self.options.process_without_tags and "name" not in meta:
                continue
            name = meta.pop(
                "name", self.options.property_name_mapping.get(f.name, f.name))
            if name == "-":                       # skip marker (reflect.go:1073)
                continue
            nullable = meta.get("nullable", f.nullable and self.options.nullable_from_arrow)
            try:
                sub = self._node(f.type, path + [name], name, meta=meta,
                                 nullable=bool(nullable))
            except UnsupportedType:
                if self.options.skip_unsupported_properties:
                    continue
                raise
            if self.options.intercept_prop is not None:
                try:
                    self.options.intercept_prop(name, f, sub)
                except SkipProperty:
                    continue
            if nullable and sub.ref is None:
                self._check_nullability(sub, f)
            elif nullable and sub.ref is not None and self.options.envelop_nullability:
                self._check_nullability(sub, f)
            req = meta.get("required",
                           f.required and self.options.required_from_nullability)
            if req:
                required.append(name)
            props[name] = sub
        if props:
            s.properties = props
        if required:
            s.required = required

    def _check_nullability(self, sub: Schema, f: VirtualField) -> None:
        """checkNullability analog (reflect.go:1332-1393)."""
        if self.options.intercept_nullability is not None:
            self.options.intercept_nullability(f, sub)
            return
        if sub.ref is not None and self.options.envelop_nullability:
            ref = Schema()
            ref.ref = sub.ref
            null_s = Schema()
            null_s.type = "null"
            sub.ref = None
            sub.any_of = [null_s, ref]
            return
        if sub.type is not None and not sub.has_type("null"):
            sub.add_type("null")

    def _maybe_define(self, t: Any, s: Schema, hint: str, top: bool) -> Schema:
        """reflectDefer analog (reflect.go:327-381): the root stays inline;
        repeated nested struct types are hoisted into definitions + $ref."""
        prepare = getattr(t, "prepare_json_schema", None)
        first_definition = self._fingerprint(t) not in self._def_of_type
        if callable(prepare) and first_definition:
            prepare(s)
        if top or self.options.inline_refs:
            return s
        if getattr(t, "inline", False):            # SchemaInliner marker
            return s
        if isinstance(t, pa.DataType) and str(t) in self.options.inline_definitions:
            return s
        fp = self._fingerprint(t)
        if fp in self._def_of_type:
            name = self._def_of_type[fp]
        else:
            name = self._def_name(t, hint)
            self._def_of_type[fp] = name
            self._definitions[name] = s
        ref = Schema()
        ref.ref = self.options.definitions_prefix + _escape_ref(name)
        return ref

    def _apply_meta(self, s: Schema, meta: Optional[Dict[str, Any]]) -> Schema:
        """Field-metadata -> keywords (the Arrow analog of the reference's
        tag parsing, reflect.go:1140-1220 + checkInlineValue 1256-1318)."""
        if not meta:
            return s
        for key, attr in _META_KEYWORDS.items():
            if key in meta:
                v = meta[key]
                if self.options.skip_non_constraints and attr in ("title", "description"):
                    continue
                setattr(s, attr, v)
        if "enum" in meta:
            v = meta["enum"]
            s.enum = list(v) if isinstance(v, (list, tuple)) else _parse_list(v)
        if "enum_names" in meta:
            s.extra_properties["x-enum-names"] = list(meta["enum_names"])
        if "default" in meta:
            s.default = meta["default"]
        if "examples" in meta and not self.options.skip_non_constraints:
            v = meta["examples"]
            s.examples = list(v) if isinstance(v, (list, tuple)) else _parse_list(v)
        return s


def _parse_list(v: Any) -> List[Any]:
    """Tag-text fallback parsing (checkInlineValue reflect.go:1256-1318):
    JSON array first, then comma-separated list."""
    if isinstance(v, str):
        try:
            out = json.loads(v)
            if isinstance(out, list):
                return out
        except ValueError:
            pass
        return [x.strip() for x in v.split(",")]
    return [v]


def _arrow_field_meta(f: pa.Field) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if f.metadata:
        for k, v in f.metadata.items():
            key = k.decode() if isinstance(k, bytes) else k
            val = v.decode() if isinstance(v, bytes) else v
            try:
                val = json.loads(val)
            except (ValueError, TypeError):
                pass
            out[key] = val
    return out


def _undict(t: Any) -> Any:
    if isinstance(t, pa.DataType) and pa.types.is_dictionary(t):
        return t.value_type
    return t


def _is_empty_schema(s: Schema) -> bool:
    from rayschema.serde import schema_to_dict

    return not schema_to_dict(s)


def _escape_ref(name: str) -> str:
    """JSON-pointer escaping (Ref.Schema + defNameEscaper, reflect.go:72-90)."""
    return name.replace("~", "~0").replace("/", "~1").replace("%", "%25")


def infer_schema(subject: Union[pa.Schema, pa.DataType, VirtualStruct],
                 options: Optional[InferOptions] = None,
                 root_def_name: str = "Root") -> Schema:
    """One-shot inference (Reflector.Reflect analog, reflect.go:269-306)."""
    return Inferrer(options).infer(subject, root_def_name)


# ----------------------------------------------------------------------- subschema helpers
def one_of(*subjects: Any) -> Schema:
    """Combine subjects into a oneOf schema (OneOf helper analog,
    /root/reference/reflect.go:1535-1553): each subject is inferred inline."""
    return _combine("one_of", subjects)


def any_of(*subjects: Any) -> Schema:
    """AnyOf helper analog (reflect.go:1555-1573)."""
    return _combine("any_of", subjects)


def all_of(*subjects: Any) -> Schema:
    """AllOf helper analog (reflect.go:1575-1595)."""
    return _combine("all_of", subjects)


def _combine(attr: str, subjects) -> Schema:
    inf = Inferrer(InferOptions(inline_refs=True))
    out = Schema()
    setattr(out, attr, [inf.infer(s) if not isinstance(s, Schema) else s
                        for s in subjects])
    return out
