"""Declarative attribute-evolution rule engine.

Re-expresses the reference's two rule-application surfaces as ONE
vectorized ``map_batches`` transform over Arrow batches:

* the ~200-entry fixed deidentification rule table — unconditional
  remove, null-out (``replaceWithZeroLengthIfPresent``), replace-with-
  constant, and boolean-flag-conditioned groups (``keepDescriptors`` …)
  — ``ClinicalTrialsAttributes.java:2528-2843`` (reference);
* user-supplied dynamic properties ``TagName=value`` with expression-
  language values, validated at config time — ``ModifyDICOMTags.java:80-156``.

Design points carried over:
* **present-only no-ops** (schema-evolution tolerance): a rule whose
  column is absent from a batch is silently skipped, exactly like
  ``list.remove(tag)`` on an absent tag (SURVEY.md §1.2);
* **ordered phases**: rules apply in declaration order, so a derive may
  read a column a later rule destroys (derive-age-before-nulling-birthdate
  ordering, ``ClinicalTrialsAttributes.java:128-205``);
* **audit trail**: ``add_audit`` appends the engine analog of
  ``PatientIdentityRemoved=YES`` / ``DeidentificationMethod``
  (``ClinicalTrialsAttributes.java:2410-2482``);
* **recursion into nested structures**: rules may target ``parent.child``
  paths inside struct columns (``ClinicalTrialsAttributes.java:2818-2842``);
* **UDF hook**: ``action: map/derive`` takes a registered named function
  or a Python callable over the batch (expression-language analog,
  reference ``ModifyDICOMTags.java:137-138``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ACTIONS = ("remove", "null", "replace", "rename", "map", "derive", "cast")


# ---------------------------------------------------------------- builtin UDFs
def _recompute_len(col: str):
    def fn(t: pa.Table) -> pa.Array:
        return pc.list_value_length(t[col]).cast(pa.int32())

    return fn


def _drop_first_k(col: str, k: int):
    def fn(t: pa.Table) -> pa.Array:
        return pc.list_slice(t[col], start=k)

    return fn


def _truncate_to_k(col: str, k: int):
    def fn(t: pa.Table) -> pa.Array:
        return pc.list_slice(t[col], start=0, stop=k)

    return fn


def _prefix_token(col: str, token: int):
    def fn(t: pa.Table) -> pa.Array:
        lists = t[col]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n = len(lists)
        is_null = pc.is_null(lists).to_numpy(zero_copy_only=False).astype(bool)
        lengths = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = lists.flatten().to_numpy(zero_copy_only=False)
        # null rows stay null: zero-length spans, no prefix token
        new_lens = np.where(is_null, 0, lengths + 1)
        new_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_lens, out=new_off[1:])
        # dtype from the list's declared value type, NOT from whether the
        # flattened values happen to be non-empty (an all-empty batch of a
        # list<int64> column must still come back list<int64>)
        decl_dtype = np.dtype(lists.type.value_type.to_pandas_dtype())
        new_vals = np.empty(int(new_off[-1]), dtype=vals.dtype if len(vals) else decl_dtype)
        # vectorized interleave: prefix token sits at each non-null row's offset
        head_pos = new_off[:-1][~is_null]
        new_vals[head_pos] = token
        mask = np.ones(len(new_vals), dtype=bool)
        mask[head_pos] = False
        new_vals[mask] = vals
        null_mask = pa.array(is_null) if is_null.any() else None
        return pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()), pa.array(new_vals), mask=null_mask
        )

    return fn


def _sanitize(col: str):
    """Filename-sanitizer analog (``ExtractDICOMTags.java:139-160``)."""

    def fn(t: pa.Table) -> pa.Array:
        return pc.replace_substring_regex(t[col], pattern=r"[^a-zA-Z0-9.^]", replacement="_")

    return fn


BUILTIN_FNS: dict[str, Callable[..., Callable]] = {
    "recompute_len": _recompute_len,
    "drop_first_k": _drop_first_k,
    "truncate_to_k": _truncate_to_k,
    "prefix_token": _prefix_token,
    "sanitize": _sanitize,
}


@dataclass(frozen=True)
class Rule:
    column: str
    action: str
    value: object = None  # constant for replace; new name for rename; type name for cast
    fn: Callable[[pa.Table], pa.Array] | None = None  # for map/derive
    flag: str | None = None  # apply only when flags[flag] is truthy
    unless_flag: str | None = None  # skip when flags[unless_flag] is truthy

    def active(self, flags: dict[str, bool]) -> bool:
        if self.flag is not None and not flags.get(self.flag, False):
            return False
        if self.unless_flag is not None and flags.get(self.unless_flag, False):
            return False
        return True


AUDIT_COLS = {
    "identity_removed": "YES",
    "evolution_method": "raycdc-rules-v1",
}


@dataclass
class RuleSet:
    """An ordered rule program + config flags, compiled to one batch fn."""

    rules: list[Rule] = field(default_factory=list)
    flags: dict[str, bool] = field(default_factory=dict)
    audit: bool = False

    @classmethod
    def from_config(cls, cfg: dict) -> "RuleSet":
        """Build from a JSON/YAML-style dict (FIXTURES.md F4 shape):
        ``{"rules": [{"column":..., "action":..., ...}], "flags": {...},
        "audit": bool}``. ``fn`` entries name a builtin with kwargs."""
        rules = []
        for r in cfg.get("rules", []):
            r = dict(r)
            action = r.pop("action")
            column = r.pop("column")
            fn = None
            if "fn" in r:
                name = r.pop("fn")
                if callable(name):
                    fn = name
                else:
                    kwargs = {k: r.pop(k) for k in list(r) if k not in ("value", "flag", "unless_flag")}
                    target = kwargs.pop("on", column)
                    fn = BUILTIN_FNS[name](target, **kwargs)
            rules.append(
                Rule(
                    column=column,
                    action=action,
                    value=r.get("value"),
                    fn=fn,
                    flag=r.get("flag"),
                    unless_flag=r.get("unless_flag"),
                )
            )
        return cls(rules=rules, flags=dict(cfg.get("flags", {})), audit=bool(cfg.get("audit", False)))

    @classmethod
    def from_json(cls, text: str) -> "RuleSet":
        return cls.from_config(json.loads(text))

    def validate(self, schema: pa.Schema) -> list[str]:
        """Config-time validation (analog of tag-name validation,
        ``ModifyDICOMTags.java:81-109``): returns a list of problems.
        Rules on absent columns are allowed (present-only no-op) EXCEPT
        derive, which creates its column and so is always fine; unknown
        actions and bad types are errors."""
        problems = []
        for r in self.rules:
            if r.action not in ACTIONS:
                problems.append(f"unknown action {r.action!r} for column {r.column!r}")
            if r.action in ("map",) and r.fn is None:
                problems.append(f"rule on {r.column!r}: action 'map' requires fn")
            if r.action == "derive" and r.fn is None:
                problems.append(f"rule on {r.column!r}: action 'derive' requires fn")
            if r.action == "rename" and not r.value:
                problems.append(f"rule on {r.column!r}: rename requires value")
        return problems

    # ------------------------------------------------------------ application
    def _apply_one(self, t: pa.Table, r: Rule) -> pa.Table:
        col = r.column
        if "." in col:
            return _apply_struct_rule(t, r, self)
        present = col in t.column_names
        if r.action == "derive":
            arr = r.fn(t)
            if present:
                return t.set_column(t.column_names.index(col), col, arr)
            return t.append_column(col, arr)
        if not present:  # present-only no-op (schema tolerance)
            return t
        i = t.column_names.index(col)
        if r.action == "remove":
            return t.remove_column(i)
        if r.action == "null":
            return t.set_column(i, col, pa.nulls(t.num_rows, type=t.column(i).type))
        if r.action == "replace":
            return t.set_column(i, col, pa.array([r.value] * t.num_rows, type=t.column(i).type))
        if r.action == "rename":
            names = list(t.column_names)
            names[i] = r.value
            return t.rename_columns(names)
        if r.action == "cast":
            return t.set_column(i, col, t.column(i).cast(pa.type_for_alias(str(r.value))))
        if r.action == "map":
            return t.set_column(i, col, _as_chunked(r.fn(t)))
        raise ValueError(f"unknown action {r.action}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch
        for r in self.rules:
            if r.active(self.flags):
                t = self._apply_one(t, r)
        if self.audit:
            for name, val in AUDIT_COLS.items():
                if name not in t.column_names:
                    t = t.append_column(name, pa.array([val] * t.num_rows))
        return t


def _as_chunked(arr):
    if isinstance(arr, pa.ChunkedArray):
        return arr
    return pa.chunked_array([arr])


def _apply_struct_rule(t: pa.Table, r: Rule, rs: RuleSet) -> pa.Table:
    """Apply a rule addressed as a dotted path (``a.b``, ``a.b.c``, …)
    inside nested struct / list-of-struct columns — the
    recursion-into-sequences analog: the reference applies its rule
    table recursively into SequenceAttribute items, each of which is an
    AttributeList that may itself contain further sequences
    (``ClinicalTrialsAttributes.java:2818-2842``).

    ``list<struct>`` levels are traversed by flattening the value array
    (offsets/validity preserved on rebuild, null rows compacted to
    zero-length spans so parquet accepts the result); struct levels
    recurse field-wise. A path whose head is absent is a present-only
    no-op, like every rule."""
    parts = r.column.split(".")
    parent = parts[0]
    if parent not in t.column_names:
        return t
    arr = t.column(parent).combine_chunks()
    rebuilt = _apply_nested(arr, parts[1:], r, rs)
    if rebuilt is None:
        return t
    return t.set_column(t.column_names.index(parent), parent, rebuilt)


def _apply_nested(arr: pa.Array, path: list[str], r: Rule, rs: RuleSet) -> pa.Array | None:
    """Recurse a dotted path into ``arr``; returns the rebuilt array or
    None when the rule is a no-op (absent field / unsupported type)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        lens = pc.list_value_length(arr).fill_null(0).to_numpy(zero_copy_only=False)
        vals = arr.flatten()  # compacted: null rows contribute no values
        new_vals = _apply_nested(vals, path, r, rs)
        if new_vals is None:
            return None
        offsets = np.zeros(len(arr) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        mask = pa.array(
            pc.is_null(arr).to_numpy(zero_copy_only=False)
        ) if arr.null_count else None
        large = pa.types.is_large_list(arr.type)
        off_arr = pa.array(offsets, type=pa.int64() if large else pa.int32())
        cls = pa.LargeListArray if large else pa.ListArray
        return cls.from_arrays(off_arr, new_vals, mask=mask)
    if pa.types.is_struct(arr.type):
        names = [f.name for f in arr.type]
        head = path[0]
        mask = pc.is_null(arr) if arr.null_count else None
        if len(path) == 1:
            if head not in names and r.action != "derive":
                return None
            sub = pa.table({n: arr.field(n) for n in names})
            sub = rs._apply_one(sub, Rule(column=head, action=r.action, value=r.value, fn=r.fn))
            return pa.StructArray.from_arrays(
                [sub.column(n).combine_chunks() for n in sub.column_names],
                names=sub.column_names,
                mask=mask,  # preserve null struct rows (from_arrays drops validity)
            )
        if head not in names:
            return None
        new_child = _apply_nested(arr.field(head), path[1:], r, rs)
        if new_child is None:
            return None
        return pa.StructArray.from_arrays(
            [new_child if n == head else arr.field(n) for n in names],
            names=names,
            mask=mask,
        )
    return None  # scalar mid-path → no-op (schema tolerance)
