"""IR -> vectorized predicate plan ("the validator compiler").

Compiles a draft-07 ``Schema`` (rayschema.ir) into a tree of closures, each
mapping an Arrow subject (a column array, a struct/map array, or a whole
``pyarrow.Table`` treated as the root object) to a per-row boolean pass mask
plus attributed violations ``(json_path, keyword, fail_mask, message)``.

Design notes (SURVEY.md §2.D / §3.4):
* All keywords are conjunctive; applicators (allOf/anyOf/oneOf/not/if-then-else)
  combine child masks with boolean algebra — children run in probe mode (no
  violation attribution inside an applicator branch, only the combined verdict).
* ``$ref`` is resolved at compile time against the root's ``definitions``
  (getDefinition analog, /root/reference/context.go:331-339) with a lazy
  forwarder so recursive schemas compile finitely (typeCycles analog,
  reflect.go:502-508); runtime recursion terminates because Arrow types have
  finite nesting depth.
* Trivial subtrees compile to constant-true (IsTrivial pruning,
  helper.go:178-289 via rayschema.trivial): zero predicates, zero cost.
* Regexes / format checkers are compiled ONCE here — the compiled plan is the
  state an actor pool holds per worker (the engine analog of the Reflector's
  cross-call caches, reflect.go:93-98).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayschema import validate as V
from rayschema.ir import ABSENT, Schema, SchemaOrBool
from rayschema.trivial import definitions_resolver, sob_is_trivial


def _regex_search_mask(keys: pa.Array, pat: str):
    """Unanchored regex match over a string array. Arrow/RE2 kernel when the
    pattern compiles under RE2; Python-``re`` fallback otherwise, so
    RE2-rejected syntax (lookahead, backrefs) behaves identically on the map
    path and the struct/table path instead of raising ArrowInvalid at
    validation time. (Patterns valid in BOTH engines are evaluated by RE2
    here and by Python re on the static-property path; for the rare construct
    where the two engines disagree semantically, the Python-re result is the
    documented reference behavior.)"""
    try:
        return pc.match_substring_regex(keys, pat)
    except pa.ArrowInvalid:
        import re as _re

        rx = _re.compile(pat)   # re module caches compiled patterns
        return pa.array(
            [None if k is None else bool(rx.search(k)) for k in keys.to_pylist()],
            type=pa.bool_())


# --------------------------------------------------------------------------- subjects
class TableSubject:
    """Presents a pyarrow Table / RecordBatch as one object-typed 'array'
    whose properties are the columns (the root-object view of a flat corpus
    row, BASELINE.json input_hint)."""

    __slots__ = ("table", "_names")

    def __init__(self, table: Union[pa.Table, pa.RecordBatch]):
        self.table = table
        self._names = set(table.schema.names)

    def __len__(self) -> int:
        return self.table.num_rows

    @property
    def names(self) -> List[str]:
        return list(self.table.schema.names)

    def column(self, name: str) -> Optional[pa.Array]:
        if name not in self._names:
            return None
        return V.ensure_array(self.table.column(name))


Subject = Union[pa.Array, TableSubject]


@dataclass
class Violation:
    path: str
    keyword: str
    fail_mask: np.ndarray  # aligned with the TOP subject rows
    message: str


NodeFn = Callable[[Subject, bool], Tuple[np.ndarray, List[Violation]]]


@dataclass
class CompileContext:
    root: Optional[SchemaOrBool] = None
    definitions_prefix: str = "#/definitions/"
    validate_formats: bool = True
    custom_formats: Dict[str, Callable[[pa.Array], np.ndarray]] = dc_field(default_factory=dict)
    custom_keywords: Dict[str, Callable[[Schema, pa.Array], np.ndarray]] = dc_field(default_factory=dict)
    prune_trivial: bool = True
    _ref_fns: Dict[str, NodeFn] = dc_field(default_factory=dict)

    def lookup_ref(self, ref: str) -> Optional[SchemaOrBool]:
        if self.root is None:
            return None
        if ref == "#":
            return self.root
        if ref.startswith(self.definitions_prefix) and isinstance(self.root, Schema) \
                and self.root.definitions:
            name = _unescape_ref(ref[len(self.definitions_prefix):])
            hit = self.root.definitions.get(name)
            if hit is not None:
                return hit
        if ref.startswith("#/"):
            # generic JSON-pointer walk (RFC 6901) over the schema tree:
            # "#/properties/foo", "#/items/0", "#/allOf/1/..." etc. —
            # draft-07 $ref may target ANY schema location, not just
            # definitions (official-suite "relative pointer ref" cases)
            return _pointer_walk(self.root, ref[2:].split("/"))
        return None

    def resolve_compiled(self, ref: str) -> NodeFn:
        if ref in self._ref_fns:
            return self._ref_fns[ref]
        cell: Dict[str, NodeFn] = {}
        in_progress: set = set()

        def forwarder(subject: Subject, want: bool) -> Tuple[np.ndarray, List[Violation]]:
            # RUNTIME cycle guard: a $ref cycle (a -> b -> a) re-enters
            # this forwarder with the SAME subject before the outer call
            # returns. The fixed point of a pure ref cycle adds no
            # further constraint, so the inner re-entry passes everything
            # (the outer frame still applies every reachable keyword).
            # Recursion through containers (items etc.) builds NEW
            # subjects and terminates at the static Arrow type depth.
            key = (id(subject), want)
            if key in in_progress:
                return V.all_true(_n(subject)), []
            in_progress.add(key)
            try:
                return cell["fn"](subject, want)
            finally:
                in_progress.discard(key)

        self._ref_fns[ref] = forwarder
        target = self.lookup_ref(ref)
        if target is None:
            raise KeyError(f"unresolvable $ref: {ref}")
        cell["fn"] = compile_sob(target, self, path=ref)
        return forwarder


def _unescape_ref(name: str) -> str:
    """Inverse of infer._escape_ref (JSON-pointer ~0/~1 + %25, RFC 6901)."""
    return name.replace("%25", "%").replace("~1", "/").replace("~0", "~")


# JSON keyword -> IR Schema attribute, for generic $ref pointer walks
_POINTER_ATTRS = {
    "definitions": "definitions", "properties": "properties",
    "patternProperties": "pattern_properties",
    "dependencies": "dependencies", "propertyNames": "property_names",
    "items": "items", "additionalItems": "additional_items",
    "additionalProperties": "additional_properties",
    "contains": "contains", "if": "if_", "then": "then", "else": "else_",
    "allOf": "all_of", "anyOf": "any_of", "oneOf": "one_of", "not": "not_",
}


def _pointer_walk(node, tokens) -> Optional[SchemaOrBool]:
    """Resolve a JSON-pointer token list against the IR schema tree.
    Alternates keyword hops (on Schema nodes) with dict-key / list-index
    hops; returns None when the pointer goes nowhere schema-shaped."""
    from rayschema.ir import Schema as _S

    for tok in tokens:
        tok = _unescape_ref(tok)
        if isinstance(node, _S):
            attr = _POINTER_ATTRS.get(tok)
            if attr is None:
                node = node.extra_properties.get(tok) \
                    if node.extra_properties else None
            else:
                node = getattr(node, attr)
        elif isinstance(node, dict):
            node = node.get(tok)
        elif isinstance(node, (list, tuple)):
            try:
                node = node[int(tok)]
            except (ValueError, IndexError):
                return None
        else:
            return None
        if node is None:
            return None
    return node if isinstance(node, (_S, bool)) else None


def _n(subject: Subject) -> int:
    return len(subject)


def _const_true_fn() -> NodeFn:
    def fn(subject: Subject, want: bool) -> Tuple[np.ndarray, List[Violation]]:
        return V.all_true(_n(subject)), []
    return fn


def _const_false_fn(path: str) -> NodeFn:
    """The `false` boolean schema (entities.go:620-645): every PRESENT value
    violates; nulls pass under the absent convention."""
    def fn(subject: Subject, want: bool) -> Tuple[np.ndarray, List[Violation]]:
        if isinstance(subject, TableSubject):
            mask = V.all_false(_n(subject))
        else:
            mask = ~V.valid_mask(subject)
        out: List[Violation] = []
        if want and not mask.all():
            out.append(Violation(path, "false", ~mask, "false schema accepts nothing"))
        return mask, out
    return fn


# --------------------------------------------------------------------------- list helpers
def _as_list_parts(arr: pa.Array):
    off = V.list_offsets(arr)
    off = off - off[0]
    flat = V.list_flatten(arr)
    return off, flat


def _reduce_sub_violations(subs: List[Violation], off: np.ndarray, n: int,
                           prefix: str) -> List[Violation]:
    """Element-level violations -> row-level (segment any-failure)."""
    out = []
    for v in subs:
        row_fail = V.segment_any(v.fail_mask, off, empty=False)
        out.append(Violation(prefix + v.path, v.keyword, row_fail, v.message))
    return out


# --------------------------------------------------------------------------- compiler
def compile_sob(sob: SchemaOrBool, ctx: CompileContext, path: str = "#") -> NodeFn:
    if isinstance(sob, bool):
        return _const_true_fn() if sob else _const_false_fn(path)
    if ctx.prune_trivial and ctx.root is not None:
        resolver = definitions_resolver(ctx.root, ctx.definitions_prefix) \
            if isinstance(ctx.root, Schema) else (lambda r: (None, False))
        if sob_is_trivial(sob, resolver):
            return _const_true_fn()
    return _compile_schema(sob, ctx, path)


def _compile_schema(s: Schema, ctx: CompileContext, path: str) -> NodeFn:
    """Build the conjunctive predicate list for one schema node."""
    # draft-07 $ref semantics (core spec 8.3): when "$ref" is present,
    # ALL sibling keywords MUST be ignored — the node validates as the
    # referenced schema alone. ("definitions" still resolves: the target
    # lookup goes through the ROOT, not this node.)
    if s.ref is not None:
        ref_only = ctx.resolve_compiled(s.ref)

        def ref_node(subject, want: bool):
            return ref_only(subject, want)

        return ref_node

    # ---- value-level closures prepared once (regex compile etc.)
    checks: List[Tuple[str, Callable[[pa.Array], np.ndarray], str]] = []

    if s.type is not None:
        allowed = s.type_list()
        checks.append(("type", lambda a, al=tuple(allowed): V.type_check_mask(a, list(al)),
                       f"type must be {allowed}"))
    if s.enum:
        checks.append(("enum", lambda a, e=tuple(s.enum): V.enum_mask(a, list(e)),
                       f"value not in enum ({len(s.enum)} allowed)"))
    if s.const is not ABSENT:
        checks.append(("const", lambda a, c=s.const: V.const_mask(a, c), "value != const"))
    if s.minimum is not None:
        checks.append(("minimum", lambda a, b=s.minimum: V.numeric_cmp_mask(a, "ge", b),
                       f"value < minimum {s.minimum}"))
    if s.maximum is not None:
        checks.append(("maximum", lambda a, b=s.maximum: V.numeric_cmp_mask(a, "le", b),
                       f"value > maximum {s.maximum}"))
    if s.exclusive_minimum is not None:
        checks.append(("exclusiveMinimum", lambda a, b=s.exclusive_minimum: V.numeric_cmp_mask(a, "gt", b),
                       f"value <= exclusiveMinimum {s.exclusive_minimum}"))
    if s.exclusive_maximum is not None:
        checks.append(("exclusiveMaximum", lambda a, b=s.exclusive_maximum: V.numeric_cmp_mask(a, "lt", b),
                       f"value >= exclusiveMaximum {s.exclusive_maximum}"))
    if s.multiple_of is not None:
        checks.append(("multipleOf", lambda a, m=s.multiple_of: V.multiple_of_mask(a, m),
                       f"value not a multiple of {s.multiple_of}"))
    if s.min_length:
        checks.append(("minLength", lambda a, b=s.min_length: V.min_length_mask(a, b),
                       f"length < minLength {s.min_length}"))
    if s.max_length is not None:
        checks.append(("maxLength", lambda a, b=s.max_length: V.max_length_mask(a, b),
                       f"length > maxLength {s.max_length}"))
    if s.pattern is not None:
        pat = s.pattern
        checks.append(("pattern", lambda a, p=pat: V.pattern_mask(a, p),
                       f"value does not match pattern {pat!r}"))
    if s.format is not None and ctx.validate_formats:
        checks.append(("format", lambda a, f=s.format: V.format_mask(a, f, ctx.custom_formats),
                       f"value is not a valid {s.format}"))
    if s.min_items:
        checks.append(("minItems", lambda a, b=s.min_items: _list_len_mask(a, "ge", b),
                       f"fewer than minItems {s.min_items}"))
    if s.max_items is not None:
        checks.append(("maxItems", lambda a, b=s.max_items: _list_len_mask(a, "le", b),
                       f"more than maxItems {s.max_items}"))
    if s.unique_items:
        checks.append(("uniqueItems", V.unique_items_mask, "items are not unique"))
    for kw, fn in ctx.custom_keywords.items():
        if kw in s.extra_properties:
            checks.append((kw, lambda a, f=fn, sc=s: f(sc, a), f"custom keyword {kw} failed"))

    # ---- sub-schema compilation (once)
    items_fn: Optional[NodeFn] = None
    tuple_fns: Optional[List[NodeFn]] = None
    add_items_fn: Optional[NodeFn] = None
    add_items_false = False
    if s.items is not None:
        if isinstance(s.items, list):
            tuple_fns = [compile_sob(x, ctx, f"{path}/items[{i}]") for i, x in enumerate(s.items)]
            if s.additional_items is not None:
                if s.additional_items is False:
                    add_items_false = True
                elif s.additional_items is not True:
                    add_items_fn = compile_sob(s.additional_items, ctx, f"{path}/additionalItems")
        else:
            items_fn = compile_sob(s.items, ctx, f"{path}/items")
    contains_fn = compile_sob(s.contains, ctx, f"{path}/contains") if s.contains is not None else None

    prop_fns: Dict[str, NodeFn] = {}
    if s.properties:
        prop_fns = {k: compile_sob(v, ctx, f"{path}/properties/{k}") for k, v in s.properties.items()}
    pat_prop_fns: List[Tuple[str, NodeFn]] = []
    if s.pattern_properties:
        pat_prop_fns = [(k, compile_sob(v, ctx, f"{path}/patternProperties/{k}"))
                        for k, v in s.pattern_properties.items()]
    add_props_fn: Optional[NodeFn] = None
    add_props_false = s.additional_properties is False
    if isinstance(s.additional_properties, Schema):
        add_props_fn = compile_sob(s.additional_properties, ctx, f"{path}/additionalProperties")
    prop_names_fn = compile_sob(s.property_names, ctx, f"{path}/propertyNames") \
        if s.property_names is not None else None
    dep_fns: Dict[str, Union[List[str], NodeFn]] = {}
    if s.dependencies:
        for k, v in s.dependencies.items():
            dep_fns[k] = list(v) if isinstance(v, list) else compile_sob(v, ctx, f"{path}/dependencies/{k}")

    ref_fn = ctx.resolve_compiled(s.ref) if s.ref is not None else None

    all_of_fns = [compile_sob(x, ctx, f"{path}/allOf[{i}]") for i, x in enumerate(s.all_of or [])]
    any_of_fns = [compile_sob(x, ctx, f"{path}/anyOf[{i}]") for i, x in enumerate(s.any_of or [])]
    one_of_fns = [compile_sob(x, ctx, f"{path}/oneOf[{i}]") for i, x in enumerate(s.one_of or [])]
    not_fn = compile_sob(s.not_, ctx, f"{path}/not") if s.not_ is not None else None
    if_fn = compile_sob(s.if_, ctx, f"{path}/if") if s.if_ is not None else None
    then_fn = compile_sob(s.then, ctx, f"{path}/then") if s.then is not None else None
    else_fn = compile_sob(s.else_, ctx, f"{path}/else") if s.else_ is not None else None

    required = list(s.required or [])
    min_props, max_props = s.min_properties, s.max_properties

    def fn(subject: Subject, want: bool) -> Tuple[np.ndarray, List[Violation]]:
        n = _n(subject)
        mask = V.all_true(n)
        out: List[Violation] = []

        def add(kw: str, m: np.ndarray, msg: str, p: str = path) -> None:
            nonlocal mask
            mask &= m
            if want and not m.all():
                out.append(Violation(p, kw, ~m, msg))

        is_value = not isinstance(subject, TableSubject)

        if is_value:
            for kw, kfn, msg in checks:
                add(kw, kfn(subject), msg)
            t = subject.type
            if V.is_listish(t):
                _apply_list(subject, add, want, items_fn, tuple_fns, add_items_fn,
                            add_items_false, contains_fn, path)
            if pa.types.is_struct(t):
                _apply_struct(subject, add, want, prop_fns, required, add_props_false,
                              add_props_fn, pat_prop_fns, dep_fns, min_props, max_props, path)
                if prop_names_fn is not None:
                    _apply_static_property_names(subject, [f.name for f in t], add,
                                                 prop_names_fn, path)
            elif pa.types.is_map(t):
                _apply_map(subject, add, want, prop_fns, pat_prop_fns, add_props_false,
                           add_props_fn, prop_names_fn, dep_fns, required, min_props, max_props, path)
            elif contains_fn is not None and not V.is_listish(t):
                pass
        else:
            _apply_table(subject, add, want, prop_fns, required, add_props_false,
                         add_props_fn, pat_prop_fns, dep_fns, min_props, max_props, path)
            if prop_names_fn is not None:
                _apply_static_property_names(subject, subject.names, add,
                                             prop_names_fn, path)

        if ref_fn is not None:
            m, sub = ref_fn(subject, want)
            mask &= m
            out.extend(sub)

        # applicators: probe children, attribute at this level
        for i, f in enumerate(all_of_fns):
            m, _ = f(subject, False)
            add("allOf", m, f"allOf[{i}] failed", f"{path}/allOf[{i}]")
        if any_of_fns:
            acc = V.all_false(n)
            for f in any_of_fns:
                acc |= f(subject, False)[0]
            add("anyOf", acc, "no anyOf branch matched")
        if one_of_fns:
            cnt = np.zeros(n, dtype=np.int64)
            for f in one_of_fns:
                cnt += f(subject, False)[0].astype(np.int64)
            add("oneOf", cnt == 1, "oneOf must match exactly one branch")
        if not_fn is not None:
            m, _ = not_fn(subject, False)
            if is_value:
                m = m & V.valid_mask(subject)  # null = absent: not applies to present values
            add("not", ~m, "value matches 'not' schema")
        if if_fn is not None:
            c = if_fn(subject, False)[0]
            t_m = then_fn(subject, False)[0] if then_fn is not None else V.all_true(n)
            e_m = else_fn(subject, False)[0] if else_fn is not None else V.all_true(n)
            add("if", (~c | t_m) & (c | e_m), "conditional (if/then/else) failed")

        # null = absent convention: a null value vacuously passes every keyword
        # at this node (its absence is judged by the parent's `required`).
        if is_value:
            absent = ~V.valid_mask(subject)
            if absent.any():
                mask |= absent
                for v in out:
                    v.fail_mask &= ~absent

        return mask, out

    return fn


# --------------------------------------------------------------------------- keyword appliers
def _list_len_mask(arr: pa.Array, op: str, bound: int) -> np.ndarray:
    if not V.is_listish(arr.type):
        return V.all_true(len(arr))
    ln = pc.list_value_length(arr).cast(pa.int64())
    fn = pc.greater_equal if op == "ge" else pc.less_equal
    return V.bool_mask(fn(ln, bound), len(arr))


def _apply_list(arr: pa.Array, add, want: bool, items_fn, tuple_fns, add_items_fn,
                add_items_false: bool, contains_fn, path: str) -> None:
    """items / additionalItems / contains (entities.go:36-41): sub-validate the
    flattened child array once, segment-reduce back to rows."""
    n = len(arr)
    off, flat = _as_list_parts(arr)
    if items_fn is not None and len(flat):
        m, sub = items_fn(flat, want)
        row = V.segment_all(m, off)
        add("items", row, "an item fails the items schema")
        if want:
            for v in _reduce_sub_violations(sub, off, n, ""):
                add(v.keyword, ~v.fail_mask, v.message, v.path)
    if tuple_fns is not None and len(flat):
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], np.diff(off))
        for i, f in enumerate(tuple_fns):
            sel = pos == i
            if not sel.any():
                continue
            m, _ = f(flat, False)
            elem_ok = np.where(sel, m, True)
            add("items", V.segment_all(elem_ok, off), f"tuple item [{i}] fails its schema",
                f"{path}/items[{i}]")
        tail = pos >= len(tuple_fns)
        if add_items_false:
            add("additionalItems", V.segment_all(~tail, off), "no additional items allowed")
        elif add_items_fn is not None and tail.any():
            m, _ = add_items_fn(flat, False)
            add("additionalItems", V.segment_all(np.where(tail, m, True), off),
                "an additional item fails additionalItems")
    if contains_fn is not None:
        if len(flat):
            m, _ = contains_fn(flat, False)
            row = V.segment_any(m & V.valid_mask(flat), off, empty=False)
        else:
            row = V.all_false(n)
        row |= ~V.valid_mask(arr)  # null rows pass
        add("contains", row, "no item matches 'contains'")


def _apply_static_property_names(subject, names, add, prop_names_fn, path) -> None:
    """``propertyNames`` over a STATIC property set (struct/table subjects):
    names are fixed, so the name check is evaluated once; a PRESENT value
    under a failing name violates (null = absent passes, as elsewhere)."""
    if not names:
        return
    name_arr = pa.array(list(names), type=pa.string())
    name_ok, _ = prop_names_fn(name_arr, False)
    for name, ok in zip(names, name_ok):
        if ok:
            continue
        if isinstance(subject, TableSubject):
            col = subject.column(name)
        else:
            col = V.ensure_array(subject.field(name))
        present = V.valid_mask(col) if col is not None else None
        if present is None:
            continue
        if not isinstance(subject, TableSubject):
            present = present & V.valid_mask(subject)
        add("propertyNames", ~present, f"property name {name!r} fails propertyNames",
            f"{path}/propertyNames/{name}")


def _presence_table(subject: TableSubject, name: str) -> np.ndarray:
    col = subject.column(name)
    if col is None:
        return V.all_false(len(subject))
    return V.valid_mask(col)


def _apply_object_common(n, present_of, col_of, names, add, want,
                         prop_fns, required, dep_fns, min_props, max_props, path,
                         add_props_false, add_props_fn, pat_prop_fns, parent_absent) -> None:
    """Shared object-keyword logic for Table and Struct subjects (static
    property sets). entities.go:42-50."""
    for name in required:
        add("required", present_of(name) | parent_absent, f"required property {name!r} is missing",
            f"{path}/required/{name}")
    for name, f in prop_fns.items():
        col = col_of(name)
        if col is None:
            continue
        m, sub = f(col, want)
        add("properties", m | parent_absent, f"property {name!r} fails its schema",
            f"{path}/properties/{name}")
        if want:
            for v in sub:
                add(v.keyword, ~v.fail_mask | parent_absent, v.message, v.path)
    # additionalProperties over a STATIC property set: a present value in a
    # column not covered by properties/patternProperties
    if add_props_false or add_props_fn is not None:
        import re as _re
        pats = [_re.compile(p) for p, _ in pat_prop_fns]
        for name in names:
            if name in prop_fns:
                continue
            if any(p.search(name) for p in pats):
                continue
            col = col_of(name)
            if col is None:
                continue
            if add_props_false:
                add("additionalProperties", ~V.valid_mask(col) | parent_absent,
                    f"additional property {name!r} not allowed", f"{path}/additionalProperties/{name}")
            else:
                m, _ = add_props_fn(col, False)
                add("additionalProperties", m | parent_absent,
                    f"additional property {name!r} fails additionalProperties",
                    f"{path}/additionalProperties/{name}")
    if pat_prop_fns:
        import re as _re
        for pat, f in pat_prop_fns:
            rx = _re.compile(pat)
            for name in names:
                if rx.search(name):
                    col = col_of(name)
                    if col is None:
                        continue
                    m, _ = f(col, False)
                    add("patternProperties", m | parent_absent,
                        f"property {name!r} fails patternProperties {pat!r}",
                        f"{path}/patternProperties/{pat}")
    for key, dep in dep_fns.items():
        pk = present_of(key)
        if isinstance(dep, list):
            m = V.all_true(n)
            for d in dep:
                m &= present_of(d)
            add("dependencies", ~pk | m | parent_absent,
                f"dependencies of {key!r} missing", f"{path}/dependencies/{key}")
        # schema-arm handled by caller (needs the whole subject)
    if min_props or max_props is not None:
        cnt = np.zeros(n, dtype=np.int64)
        for name in names:
            cnt += present_of(name).astype(np.int64)
        if min_props:
            add("minProperties", (cnt >= min_props) | parent_absent,
                f"fewer than minProperties {min_props}")
        if max_props is not None:
            add("maxProperties", (cnt <= max_props) | parent_absent,
                f"more than maxProperties {max_props}")


def _apply_table(subject: TableSubject, add, want, prop_fns, required, add_props_false,
                 add_props_fn, pat_prop_fns, dep_fns, min_props, max_props, path) -> None:
    n = len(subject)
    parent_absent = V.all_false(n)
    _apply_object_common(n, lambda nm: _presence_table(subject, nm), subject.column,
                         subject.names, add, want, prop_fns, required, dep_fns,
                         min_props, max_props, path, add_props_false, add_props_fn,
                         pat_prop_fns, parent_absent)
    for key, dep in dep_fns.items():
        if not isinstance(dep, list):
            m, _ = dep(subject, False)
            add("dependencies", ~_presence_table(subject, key) | m,
                f"schema dependency of {key!r} failed", f"{path}/dependencies/{key}")


def _apply_struct(arr: pa.StructArray, add, want, prop_fns, required, add_props_false,
                  add_props_fn, pat_prop_fns, dep_fns, min_props, max_props, path) -> None:
    n = len(arr)
    parent_absent = ~V.valid_mask(arr)
    names = [f.name for f in arr.type]

    def col_of(name: str) -> Optional[pa.Array]:
        if name not in names:
            return None
        return V.ensure_array(arr.field(name))

    def present_of(name: str) -> np.ndarray:
        c = col_of(name)
        if c is None:
            return V.all_false(n)
        return V.valid_mask(c) & ~parent_absent

    _apply_object_common(n, present_of, col_of, names, add, want, prop_fns, required,
                         dep_fns, min_props, max_props, path, add_props_false,
                         add_props_fn, pat_prop_fns, parent_absent)
    for key, dep in dep_fns.items():
        if not isinstance(dep, list):
            m, _ = dep(arr, False)
            add("dependencies", ~present_of(key) | m | parent_absent,
                f"schema dependency of {key!r} failed", f"{path}/dependencies/{key}")


def _apply_map(arr: pa.Array, add, want, prop_fns, pat_prop_fns, add_props_false,
               add_props_fn, prop_names_fn, dep_fns, required, min_props, max_props,
               path) -> None:
    """Object keywords over a map-typed column (dynamic key set):
    patternProperties / additionalProperties / propertyNames / min-maxProperties
    evaluated on the flattened key/value child arrays (SURVEY.md §2.D)."""
    n = len(arr)
    parent_absent = ~V.valid_mask(arr)
    off = V.list_offsets(arr)
    off = off - off[0]
    keys = V.ensure_array(arr.keys)
    lo = arr.offsets[0].as_py()
    hi = arr.offsets[len(arr)].as_py()
    keys = V.ensure_array(arr.keys.slice(lo, hi - lo))
    vals = V.ensure_array(arr.items.slice(lo, hi - lo))
    nkeys = len(keys)
    # null-as-absent convention (matches the struct/table paths, compile.py
    # _apply_object_common): an entry whose VALUE is null is treated as
    # absent by additionalProperties / propertyNames
    vvalid = V.valid_mask(vals)

    if min_props or max_props is not None:
        cnt = np.diff(off)
        if min_props:
            add("minProperties", (cnt >= min_props) | parent_absent,
                f"fewer than minProperties {min_props}")
        if max_props is not None:
            add("maxProperties", (cnt <= max_props) | parent_absent,
                f"more than maxProperties {max_props}")

    if required:
        for name in required:
            has = V.bool_mask(pc.equal(keys, name), nkeys, null_fill=False)
            add("required", V.segment_any(has, off) | parent_absent,
                f"required property {name!r} is missing", f"{path}/required/{name}")

    # properties: sub-validate values whose key matches exactly — all key
    # matching stays on Arrow kernels (pc.equal / is_in /
    # match_substring_regex), never per-key Python
    for name, f in prop_fns.items():
        sel = V.bool_mask(pc.equal(keys, name), nkeys, null_fill=False)
        if not sel.any():
            continue
        m, _ = f(vals, False)
        add("properties", V.segment_all(np.where(sel, m, True), off) | parent_absent,
            f"property {name!r} fails its schema", f"{path}/properties/{name}")

    matched = np.zeros(nkeys, dtype=bool)
    if prop_fns:
        matched |= V.bool_mask(
            pc.is_in(keys, value_set=pa.array(list(prop_fns), type=pa.string())),
            nkeys, null_fill=False)
    for pat, f in pat_prop_fns:
        sel = V.bool_mask(_regex_search_mask(keys, pat), nkeys, null_fill=False)
        matched |= sel
        if sel.any():
            m, _ = f(vals, False)
            add("patternProperties", V.segment_all(np.where(sel, m, True), off) | parent_absent,
                f"a property fails patternProperties {pat!r}", f"{path}/patternProperties/{pat}")
    leftover = ~matched & vvalid        # null-valued entries are absent
    if add_props_false:
        add("additionalProperties", V.segment_all(~leftover, off) | parent_absent,
            "additional properties not allowed")
    elif add_props_fn is not None and leftover.any():
        m, _ = add_props_fn(vals, False)
        add("additionalProperties", V.segment_all(np.where(leftover, m, True), off) | parent_absent,
            "an additional property fails additionalProperties")
    if prop_names_fn is not None and nkeys:
        m, _ = prop_names_fn(keys, False)
        add("propertyNames", V.segment_all(m | ~vvalid, off) | parent_absent,
            "a property name fails propertyNames")

    # dependencies over a dynamic key set (entities.go:49): presence of key k
    # implies presence of its dep keys (string arm) / the whole-map subschema
    # (schema arm)
    if dep_fns:
        def present_of(name: str) -> np.ndarray:
            has = V.bool_mask(pc.equal(keys, name), nkeys, null_fill=False)
            return V.segment_any(has, off)

        for dkey, dep in dep_fns.items():
            pk = present_of(dkey)
            if isinstance(dep, list):
                m = np.ones(n, dtype=bool)
                for d in dep:
                    m &= present_of(d)
                add("dependencies", ~pk | m | parent_absent,
                    f"dependencies of {dkey!r} missing", f"{path}/dependencies/{dkey}")
            else:
                m, _ = dep(arr, False)
                add("dependencies", ~pk | m | parent_absent,
                    f"schema dependency of {dkey!r} failed", f"{path}/dependencies/{dkey}")


# --------------------------------------------------------------------------- public API
@dataclass
class CompiledValidator:
    """A compiled plan: apply to a pyarrow Table/RecordBatch (root object view)
    or to a single column array."""

    fn: NodeFn
    schema: SchemaOrBool

    def probe(self, subject) -> np.ndarray:
        return self.fn(self._wrap(subject), False)[0]

    def validate(self, subject) -> Tuple[np.ndarray, List[Violation]]:
        return self.fn(self._wrap(subject), True)

    @staticmethod
    def _wrap(subject) -> Subject:
        if isinstance(subject, (pa.Table, pa.RecordBatch)):
            return TableSubject(subject)
        if isinstance(subject, pa.ChunkedArray):
            return subject.combine_chunks()
        return subject


def compile_validator(sob: SchemaOrBool, *, validate_formats: bool = True,
                      custom_formats: Optional[dict] = None,
                      custom_keywords: Optional[dict] = None,
                      prune_trivial: bool = False) -> CompiledValidator:
    """Entry point: Schema|bool -> CompiledValidator (compile once — per
    driver, or per actor in ``__init__`` for map_batches stages).

    ``prune_trivial=True`` compiles IsTrivial subtrees (helper.go:192-193:
    "can be used to skip validation of structures that check types during
    decoding") to constant-true — sound when the subject is statically typed
    Arrow whose decode already enforces the ``type`` keyword; off by default
    because a trivial schema still carries a runtime-checkable ``type``
    (e.g. integer over a float column)."""
    ctx = CompileContext(root=sob, validate_formats=validate_formats,
                         custom_formats=custom_formats or {},
                         custom_keywords=custom_keywords or {},
                         prune_trivial=prune_trivial)
    return CompiledValidator(fn=compile_sob(sob, ctx, "#"), schema=sob)
