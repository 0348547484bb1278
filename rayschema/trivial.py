"""is_trivial: does a schema impose any constraint beyond type?

Faithful port of the semantics at /root/reference/helper.go:178-289
(SchemaOrBool.IsTrivial + Schema.IsTrivial). The validator compiler uses this
to prune no-op predicates: a trivial (sub)schema compiles to nothing, and a
fully trivial document skips the validation ``map_batches`` stage entirely
(only stats / uniqueness / referential stages run).

Notable faithful quirks:
* ``minimum: 0`` on a uint-backed type stays trivial (helper.go:200-212); our
  analog is ``Schema.reflect_type`` holding an unsigned Arrow type (set by
  ``infer.py`` when mapping uint columns, reflect.go:955-957).
* A multi-valued ``type`` union is non-trivial UNLESS it merely adds ``null``
  (helper.go:236-238).
* ``$ref`` resolution goes through caller-supplied resolvers with a
  self-ref cycle skip (helper.go:259-288); an unresolvable ref is non-trivial.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import pyarrow as pa

from rayschema.ir import ABSENT, Schema, SchemaOrBool

RefResolver = Callable[[str], Tuple[Optional[SchemaOrBool], bool]]

_UNSIGNED_ARROW = {pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()}


def _is_uint_backed(s: Schema) -> bool:
    rt = s.reflect_type
    if rt is None:
        return False
    if isinstance(rt, pa.DataType):
        return rt in _UNSIGNED_ARROW
    return isinstance(rt, str) and rt.startswith("uint")


def sob_is_trivial(s: SchemaOrBool, *ref_resolvers: RefResolver) -> bool:
    """SchemaOrBool.IsTrivial (helper.go:178-188): False-schema is
    non-trivial, True-schema is trivial."""
    if isinstance(s, bool):
        return s
    return is_trivial(s, *ref_resolvers)


def is_trivial(s: Schema, *ref_resolvers: RefResolver) -> bool:
    """Schema.IsTrivial (helper.go:194-289)."""
    if s.all_of or s.any_of or s.one_of or s.not_ is not None or \
            s.if_ is not None or s.then is not None or s.else_ is not None:
        return False

    if s.minimum is not None:
        # helper.go:201-212: only uint-backed minimum:0 stays trivial
        if s.minimum != 0 or not _is_uint_backed(s):
            return False

    if s.multiple_of is not None or s.maximum is not None or \
            s.exclusive_minimum is not None or s.exclusive_maximum is not None:
        return False

    if s.min_length != 0 or s.max_length is not None or s.pattern is not None or s.format is not None:
        return False

    if s.min_items != 0 or s.max_items is not None or s.unique_items is not None or s.contains is not None:
        return False

    if s.min_properties != 0 or s.max_properties is not None or s.required or s.pattern_properties:
        return False

    if s.dependencies or s.property_names is not None or s.const is not ABSENT or s.enum:
        return False

    # multi-type union is non-trivial unless it's just adding null (helper.go:236-238)
    types = s.type_list()
    if len(types) > 1 and "null" not in types:
        return False

    if s.items is not None:
        if isinstance(s.items, list):
            if len(s.items) > 0:
                return False
        elif not sob_is_trivial(s.items, *ref_resolvers):
            return False

    if s.additional_items is not None and not sob_is_trivial(s.additional_items, *ref_resolvers):
        return False

    if s.additional_properties is not None and not sob_is_trivial(s.additional_properties, *ref_resolvers):
        return False

    if s.properties:
        for ps in s.properties.values():
            if not sob_is_trivial(ps, *ref_resolvers):
                return False

    if s.ref is None:
        return True

    # $ref: resolve through caller resolvers; same-ref recursion short-circuits
    # as trivial to avoid infinite descent (helper.go:259-288)
    my_ref = s.ref

    def skip_ref(ref: str) -> Tuple[Optional[SchemaOrBool], bool]:
        if ref == my_ref:
            return True, True
        return None, False

    augmented: List[RefResolver] = [skip_ref, *ref_resolvers]

    for resolve in ref_resolvers:
        rs, found = resolve(my_ref)
        if found:
            return sob_is_trivial(rs, *augmented)
    return False


def definitions_resolver(root: Schema, prefix: str = "#/definitions/") -> RefResolver:
    """Resolver over a root schema's ``definitions`` map, the shape consumers
    pass to IsTrivial (helper_test.go:105-178 uses the same convention)."""

    def resolve(ref: str) -> Tuple[Optional[SchemaOrBool], bool]:
        if ref == "#":
            return root, True
        if ref.startswith(prefix) and root.definitions:
            name = (ref[len(prefix):].replace("%25", "%")
                    .replace("~1", "/").replace("~0", "~"))
            if name in root.definitions:
                return root.definitions[name], True
        return None, False

    return resolve
