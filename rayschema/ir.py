"""Schema IR: the JSON Schema draft-07 document model.

From-scratch Python mirror of the reference's data model
(/root/reference/entities.go:16-67 `Schema`, entities.go:620-686 `SchemaOrBool`,
entities.go:689-748 `Items`, entities.go:751-810
`DependenciesAdditionalProperties`, entities.go:813-924 `Type`/`SimpleType`).

Representation choices (Pythonic tagged unions instead of Go two-arm structs):

* ``SchemaOrBool``  -> ``Schema | bool``  (draft-07 boolean schemas are
  first-class: ``True`` = accept-all, ``False`` = reject-all).
* ``Items``         -> ``Schema | bool | list[Schema | bool]`` (tuple form).
* ``Dependencies`` values -> ``Schema | bool | list[str]`` (schema dependency
  vs property dependency, entities.go:751-810).
* ``Type``          -> ``str | list[str]`` drawn from the 7-value ``SimpleType``
  enum (entities.go:866-877).
* Unknown JSON keys are preserved verbatim in ``extra_properties``
  (entities.go:64, captured at entities.go:584-601) — round-trip fidelity of
  unknown keys is a core behavior.
* Present-but-null ``default`` / ``const`` are distinguished from absent via
  the ``ABSENT`` sentinel (entities.go:570-582 null fixup).
"""

from __future__ import annotations

import copy
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union


class _Absent:
    """Sentinel distinguishing 'keyword absent' from 'keyword present = null'."""

    _instance: Optional["_Absent"] = None

    def __new__(cls) -> "_Absent":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "ABSENT"

    def __bool__(self) -> bool:
        return False

    def __deepcopy__(self, memo: dict) -> "_Absent":
        return self

    def __copy__(self) -> "_Absent":
        return self


ABSENT = _Absent()

# The closed SimpleType enum (entities.go:866-877).
TYPE_ARRAY = "array"
TYPE_BOOLEAN = "boolean"
TYPE_INTEGER = "integer"
TYPE_NULL = "null"
TYPE_NUMBER = "number"
TYPE_OBJECT = "object"
TYPE_STRING = "string"
SIMPLE_TYPES = frozenset(
    {TYPE_ARRAY, TYPE_BOOLEAN, TYPE_INTEGER, TYPE_NULL, TYPE_NUMBER, TYPE_OBJECT, TYPE_STRING}
)

SchemaOrBool = Union["Schema", bool]
ItemsType = Union["Schema", bool, List[Union["Schema", bool]]]
DependencyType = Union["Schema", bool, List[str]]
TypeType = Union[str, List[str]]


def validate_simple_type(t: str) -> str:
    """Validating decode of a SimpleType value (entities.go:880-906)."""
    if t not in SIMPLE_TYPES:
        raise ValueError(f"unexpected SimpleType value: {t!r}")
    return t


@dataclass
class Schema:
    """One draft-07 schema node; one optional attribute per keyword
    (entities.go:16-67). ``min_length`` / ``min_items`` / ``min_properties``
    are zero-default non-optionals like the reference's non-pointer int64
    fields (entities.go:34,39,43): absent ≡ 0 and 0 is not serialized.
    """

    # --- identity / metadata (entities.go:17-27)
    id: Optional[str] = None                      # $id
    schema: Optional[str] = None                  # $schema
    ref: Optional[str] = None                     # $ref
    comment: Optional[str] = None                 # $comment
    title: Optional[str] = None
    description: Optional[str] = None
    default: Any = ABSENT
    read_only: Optional[bool] = None
    write_only: Optional[bool] = None
    deprecated: Optional[bool] = None             # x-deprecated / draft extension
    examples: Optional[List[Any]] = None

    # --- numeric constraints (entities.go:28-32)
    multiple_of: Optional[float] = None
    maximum: Optional[float] = None
    exclusive_maximum: Optional[float] = None
    minimum: Optional[float] = None
    exclusive_minimum: Optional[float] = None

    # --- string constraints (entities.go:33-35)
    max_length: Optional[int] = None
    min_length: int = 0
    pattern: Optional[str] = None

    # --- array constraints (entities.go:36-41)
    additional_items: Optional[SchemaOrBool] = None
    items: Optional[ItemsType] = None
    max_items: Optional[int] = None
    min_items: int = 0
    unique_items: Optional[bool] = None
    contains: Optional[SchemaOrBool] = None

    # --- object constraints (entities.go:42-50)
    max_properties: Optional[int] = None
    min_properties: int = 0
    required: Optional[List[str]] = None
    additional_properties: Optional[SchemaOrBool] = None
    definitions: Optional[Dict[str, SchemaOrBool]] = None
    properties: Optional[Dict[str, SchemaOrBool]] = None
    pattern_properties: Optional[Dict[str, SchemaOrBool]] = None
    dependencies: Optional[Dict[str, DependencyType]] = None
    property_names: Optional[SchemaOrBool] = None

    # --- generic (entities.go:51-56)
    const: Any = ABSENT
    enum: Optional[List[Any]] = None
    type: Optional[TypeType] = None
    format: Optional[str] = None
    content_media_type: Optional[str] = None
    content_encoding: Optional[str] = None

    # --- applicators (entities.go:57-63)
    if_: Optional[SchemaOrBool] = None
    then: Optional[SchemaOrBool] = None
    else_: Optional[SchemaOrBool] = None
    all_of: Optional[List[SchemaOrBool]] = None
    any_of: Optional[List[SchemaOrBool]] = None
    one_of: Optional[List[SchemaOrBool]] = None
    not_: Optional[SchemaOrBool] = None

    # --- open-world escape hatch (entities.go:64)
    extra_properties: Dict[str, Any] = field(default_factory=dict)

    # --- non-serialized back-pointers (entities.go:65-66)
    reflect_type: Any = None
    parent: Optional["Schema"] = None

    # ------------------------------------------------------------------ type set ops
    def type_list(self) -> List[str]:
        """The type union as a list (empty when absent)."""
        if self.type is None:
            return []
        if isinstance(self.type, str):
            return [self.type]
        return list(self.type)

    def has_type(self, t: str) -> bool:
        """helper.go:292-310 HasType."""
        return t in self.type_list()

    def add_type(self, t: str) -> "Schema":
        """helper.go:114-141 AddType: append to the union, no duplicates."""
        validate_simple_type(t)
        types = self.type_list()
        if t not in types:
            types.append(t)
        self.type = types[0] if len(types) == 1 else types
        return self

    def remove_type(self, t: str) -> "Schema":
        """helper.go:144-175 RemoveType / reflect.go:308-325 removeNull."""
        types = [x for x in self.type_list() if x != t]
        if not types:
            self.type = None
        elif len(types) == 1:
            self.type = types[0]
        else:
            self.type = types
        return self

    # ------------------------------------------------------------------ clone
    def clone(self) -> "Schema":
        """Deep copy (helper.go:76-90 JSONSchema round-trip clone)."""
        parent, self.parent = self.parent, None
        rt, self.reflect_type = self.reflect_type, None
        try:
            out = copy.deepcopy(self)
        finally:
            self.parent, self.reflect_type = parent, rt
        return out

    # ------------------------------------------------------------------ fluent builders
    def with_(self, **kwargs: Any) -> "Schema":
        """Fluent setter analog of the generated With* builders
        (entities.go:69-500): ``Schema().with_(type="string", min_length=2)``.
        """
        names = {f.name for f in dataclasses.fields(self)}
        for k, v in kwargs.items():
            if k not in names:
                raise AttributeError(f"Schema has no keyword field {k!r}")
            setattr(self, k, v)
        return self

    def ensure_properties(self) -> Dict[str, SchemaOrBool]:
        if self.properties is None:
            self.properties = {}
        return self.properties

    def ensure_definitions(self) -> Dict[str, SchemaOrBool]:
        if self.definitions is None:
            self.definitions = {}
        return self.definitions


def to_simple_map(s: SchemaOrBool) -> Dict[str, Any]:
    """Schema|bool -> plain dict; bool False -> {"not": {}} (helper.go:323-347)."""
    from rayschema.serde import schema_to_dict

    if s is True:
        return {}
    if s is False:
        return {"not": {}}
    return schema_to_dict(s)


def from_simple_map(m: Dict[str, Any]) -> "Schema":
    """Plain dict -> Schema (helper.go:350-359)."""
    from rayschema.serde import schema_from_dict

    return schema_from_dict(m)
