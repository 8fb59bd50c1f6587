"""Row-at-a-time golden oracle: a faithful Python re-statement of the
reference's validation semantics.

Mirrors `checkWithSchema` / `checkType` / `checkValue` / `checkLength` /
`checkRegex` (reference: validator_src/helpers/validationHelpers.js:4-164)
including the JS-typed quirks verified empirically in FIXTURES.md §3:

- schema-driven walk, extra data fields ignored (validationHelpers.js:133)
- reserved key "version" skipped (:134)
- `typeof null === 'object'`, `typeof NaN === 'number'`
- required empty/whitespace string -> ("non-empty string", "empty string") (:21-27)
- bilateral toString for `value` compare (:108); both-absent compares equal
- regex: partial match, string-coercing; empty/null -> 'empty_value' (:113-127)
- length: `(val || []).length` -> 0 for falsy, undefined for numbers (:76-85)
- rule order value -> type -> length -> regex, each independent (:155-162)
- array items validated per-index as `field[i]`; scalar items wrapped `{"": item}` (:38-48)
- nested objects extend the dotted path (:61-63)

This module is the correctness reference for every vectorized kernel, the
pytest oracle, and the execution path for JSON-payload (nested-document) rows.
It deliberately walks rows one at a time — use it only inside the nested-doc
map_batches stage and in tests, never for flat columns (stages/validate.py is
the vectorized path).
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from typing import Any

from .spec import FieldRule, _NO, js_tostring


class _Undefined:
    """JS `undefined`: key present with undefined value (distinct from null).
    `_js_undefined` marks the sentinel for spec.js_tostring (attribute
    protocol — spec.py cannot import this module without a cycle)."""

    _js_undefined = True
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __reduce__(self):
        return (_Undefined, ())

    def __repr__(self) -> str:
        return "undefined"


UNDEFINED = _Undefined()

Violation = tuple[str, str, str | None, str | None]  # (field, error_type, expected, actual)


def get_by_path(obj: Any, path: str | list | None) -> Any:
    """`getByPath` (validator_src/index.js:89-102): dot/bracket path
    extractor used for envelope unwrap and event-name extraction
    (`a.b[0].c`). Missing segments yield UNDEFINED, like the JS reduce."""
    if path is None or path == "":
        return obj
    if isinstance(path, list):
        parts = [str(p) for p in path]
    else:
        s = re.sub(r"\[(\w+)\]", r".\1", str(path).strip())
        s = re.sub(r"^\.", "", s)
        parts = [p for p in s.split(".") if p]
    cur = obj
    for key in parts:
        if cur is None or cur is UNDEFINED:
            return UNDEFINED
        if isinstance(cur, dict):
            cur = cur.get(key, UNDEFINED)
        elif isinstance(cur, list):
            try:
                cur = cur[int(key)]
            except (ValueError, IndexError):
                return UNDEFINED
        else:
            return UNDEFINED
    return cur


def js_typeof(v: Any) -> str:
    """JS `typeof` (arrays handled by callers via Array.isArray first)."""
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "object"  # typeof null === 'object'
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"  # NaN included
    if isinstance(v, str):
        return "string"
    if isinstance(v, (_dt.datetime, _dt.date)):
        # engine extension: timestamps arrive as datetime objects from Arrow
        return "timestamp"
    return "object"  # dict, list (callers check list first)


def _is_falsy(v: Any) -> bool:
    """JS falsiness for the `(val || [])` idiom (validationHelpers.js:78)."""
    if v is None or v is UNDEFINED or v is False:
        return True
    if isinstance(v, str) and v == "":
        return True
    if isinstance(v, bool):
        return v is False
    if isinstance(v, (int, float)):
        return v == 0 or (isinstance(v, float) and math.isnan(v))
    return False


def _regex_coerce(v: Any) -> str:
    """String JS passes to RegExp.test (implicit toString; undefined -> 'undefined')."""
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    s = js_tostring(v)
    return "" if s is None else s


def _array_props(lst: list) -> dict[str, Any]:
    """JS property view of an array: numeric index keys plus `length`."""
    props: dict[str, Any] = {str(i): v for i, v in enumerate(lst)}
    props["length"] = len(lst)
    return props


def check_value(rule: FieldRule, val: Any, field_path: str, out: list[Violation]) -> None:
    # validationHelpers.js:87-111 (exact method only; '*contains' is disabled
    # in the reference, :90-107)
    expected = None if rule.value is _NO else rule.value
    if js_tostring(val) != js_tostring(expected):
        out.append((field_path, "value", js_tostring(expected), js_tostring(val)))


def check_enum(rule: FieldRule, val: Any, field_path: str, out: list[Violation]) -> None:
    # engine extension: set-valued generalization of check_value
    if js_tostring(val) not in rule.enum_strs():
        expected = "|".join("" if e is None else e for e in rule.enum_strs())
        out.append((field_path, "enum", expected, js_tostring(val)))


def check_type(rule: FieldRule, val: Any, field_path: str, out: list[Violation]) -> None:
    # validationHelpers.js:4-74
    expected = rule.type
    actual = "array" if isinstance(val, list) else js_typeof(val)

    if expected == "string":
        if rule.optional and (val is UNDEFINED or val is None):
            return
        if not isinstance(val, str):
            out.append((field_path, "type", "string", js_typeof(val)))
            return
        if val.strip() == "":
            if rule.optional:
                return
            out.append((field_path, "type", "non-empty string", "empty string"))
        return

    if expected == "array":
        if not isinstance(val, list):
            out.append((field_path, "type", "array", actual))
            return
        if rule.nested:
            for idx, item in enumerate(val):
                item_path = f"{field_path}[{idx}]"
                if isinstance(item, dict):
                    validate_fields(rule.nested, item, item_path, out)
                elif isinstance(item, list):
                    # JS wraps only when `typeof item !== 'object' || item ===
                    # null` (validationHelpers.js:41): a nested-array item is
                    # walked UNWRAPPED, so schema keys resolve against the
                    # array's own properties — index keys and 'length' exist,
                    # everything else (incl. '') is missing
                    validate_fields(rule.nested, _array_props(item), item_path, out)
                else:
                    validate_fields(rule.nested, {"": item}, item_path, out)
        return

    if expected == "object":
        val_type = "array" if isinstance(val, list) else js_typeof(val)
        if val is None or isinstance(val, list) or val_type != "object":
            out.append((field_path, "type", "object", val_type))
            return
        if rule.nested:
            validate_fields(rule.nested, val, field_path, out)
        return

    # fallback: typeof equality (number / boolean / timestamp)
    if actual != expected:
        out.append((field_path, "type", expected, actual))


def check_length(rule: FieldRule, val: Any, field_path: str, out: list[Violation]) -> None:
    # validationHelpers.js:76-85: `(val || []).length` with strict !==
    expected = rule.length
    if _is_falsy(val):
        actual: Any = 0
    elif isinstance(val, (str, list)):
        actual = len(val)
    else:
        actual = UNDEFINED  # numbers/objects have no .length
    if actual is UNDEFINED or actual != expected:
        out.append(
            (
                field_path,
                "length",
                js_tostring(expected),
                None if actual is UNDEFINED else js_tostring(actual),
            )
        )


def check_regex(rule: FieldRule, val: Any, field_path: str, out: list[Violation]) -> None:
    # validationHelpers.js:113-127
    pattern = rule.regex or ""
    if (isinstance(val, str) and val.strip() == "") or val is None:
        out.append((field_path, "regex", pattern, "empty_value"))
        return
    if re.search(pattern, _regex_coerce(val)) is None:
        out.append((field_path, "regex", pattern, js_tostring(val)))


def validate_fields(
    rules: dict[str, FieldRule],
    data: dict[str, Any],
    parent_path: str = "",
    out: list[Violation] | None = None,
) -> list[Violation]:
    """`checkWithSchema` (validationHelpers.js:130-164)."""
    if out is None:
        out = []
    for key, rule in rules.items():
        if key == "version":
            continue
        field_path = f"{parent_path}.{key}" if parent_path else key

        if key not in data:
            if rule.optional:
                continue
            out.append((field_path, "missing", "field present", "field missing"))
            continue

        val = data[key]
        is_empty_string = isinstance(val, str) and val.strip() == ""
        if rule.optional and (val is UNDEFINED or val is None or is_empty_string):
            continue

        if rule.has_value:
            check_value(rule, val, field_path, out)
        if rule.enum is not None:
            check_enum(rule, val, field_path, out)
        if rule.type is not None:
            check_type(rule, val, field_path, out)
        if rule.length is not None:
            check_length(rule, val, field_path, out)
        if rule.regex is not None:
            check_regex(rule, val, field_path, out)
    return out


def validate_event(rules: dict[str, FieldRule], data: dict[str, Any]) -> list[Violation]:
    """Validate one event document; returns its violation rows (empty = valid).
    The per-event verdict follows validator_src/index.js:54-75: any row ->
    'validation_failed', none -> 'event valid'."""
    return validate_fields(rules, data, "")
