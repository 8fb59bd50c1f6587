"""Constraint-spec rule language + loader + compiler.

The rule vocabulary mirrors the reference's schema JSON documents
(reference: README.md:116-158; walker at
validator_src/helpers/validationHelpers.js:130-164):

    field_name -> {type?, value?, regex?, length?, optional?, required?,
                   description?, nestedSchema?}

plus engine extensions (SURVEY.md §2.10): ``enum`` (generalizes the exact
``value`` rule to a set) and a reserved ``_table`` entry holding wide checks the
per-record reference engine lacks: ``unique``, ``order``, ``ref``, ``drift``.
The key ``"version"`` is reserved and skipped, exactly like the reference
(validationHelpers.js:134).

Normalization follows the reference's repo/schema loaders: numeric strings in
``value`` are cast to int/float by the "has a dot" rule
(streamlit_ev/app/repo.py:24-42, helpers.py:141-142), and empty / ``"Any"``
values are dropped (helpers.py:139-143).
"""

from __future__ import annotations

import hashlib
import json
import math
import re
from dataclasses import dataclass, field
from typing import Any

# Sentinel distinguishing "rule has no `value` key" from "value: null"
# (the reference distinguishes hasOwnProperty('value') from value===null,
# validationHelpers.js:155 + FIXTURES.md case 23). Must survive pickling to
# Ray workers as the SAME singleton, hence __reduce__.
class _NoValue:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __reduce__(self):
        return (_NoValue, ())

    def __repr__(self) -> str:
        return "<no value>"


_NO = _NoValue()

RESERVED_KEYS = ("version", "_table")

#: rule evaluation order, mirroring validationHelpers.js:155-162
#: (value -> type -> length -> regex); `enum` slots after `value` since it
#: generalizes it.
RULE_ORDER = ("value", "enum", "type", "length", "regex")


def js_number_str(v: float | int) -> str:
    """JS Number.prototype.toString for the values we support: 2.0 -> '2',
    1.5 -> '1.5', NaN -> 'NaN'."""
    if isinstance(v, bool):  # pragma: no cover - callers dispatch bools first
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    return repr(v)


def js_tostring(v: Any) -> str | None:
    """``x?.toString()`` as used for the `expected`/`actual` log columns and the
    bilateral `value` comparison (loggingHelpers.js:13-14,
    validationHelpers.js:108). Returns None for JS null/undefined — including
    the oracle's UNDEFINED sentinel (marked by `_js_undefined`, checked by
    attribute to avoid a spec<->oracle import cycle)."""
    if v is None or v is _NO or getattr(v, "_js_undefined", False):
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_number_str(v)
    if isinstance(v, list):
        # Array.prototype.join renders null AND undefined as '' ([1,
        # undefined].toString() === '1,')
        return ",".join(
            "" if (s := js_tostring(x)) is None else s for x in v
        )
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def _normalize_value(v: Any) -> Any:
    """Numeric-string cast per the reference's clean_repo_types
    (streamlit_ev/app/repo.py:24-42): "1" -> 1, "1.5" -> 1.5."""
    if isinstance(v, str):
        s = v.strip()
        if s and (s.lstrip("+-").replace(".", "", 1).isdigit()):
            try:
                return float(s) if "." in s else int(s)
            except ValueError:
                # isdigit() admits forms int()/float() reject ("+-1",
                # unicode digits like "²") — keep them as strings rather
                # than aborting the whole spec load
                return v
    return v


@dataclass
class FieldRule:
    name: str
    type: str | None = None  # string|number|boolean|array|object|timestamp
    value: Any = _NO
    enum: list[Any] | None = None
    regex: str | None = None
    length: int | None = None
    optional: bool = False
    description: str | None = None
    nested: dict[str, "FieldRule"] | None = None
    extra: dict[str, Any] = field(default_factory=dict)  # unknown rule keys -> custom Check registry

    @property
    def has_value(self) -> bool:
        return self.value is not _NO

    def value_str(self) -> str | None:
        return js_tostring(None if self.value is _NO else self.value)

    def enum_strs(self) -> list[str | None]:
        return [js_tostring(e) for e in (self.enum or [])]


@dataclass
class OrderRule:
    by: str = "turn_idx"
    within: str = "conv_id"
    contiguous: bool = True
    ts_monotone: bool = True
    ts_column: str = "ts"
    #: roles that must not repeat on consecutive DISTINCT turns (role of a
    #: turn = MIN of its rows' non-null roles, deterministic under duplicates)
    alternate: list[str] = field(default_factory=list)


@dataclass
class RefRule:
    """Cross-column referential rule: `field` must be non-null exactly when
    `when_field == when_value` (e.g. tool name present iff role=='tool');
    optionally the first turn of each group must satisfy `first_value`."""

    field: str
    when_field: str
    when_value: str
    iff: bool = True


@dataclass
class DriftRule:
    columns: list[str] = field(default_factory=list)
    method: str = "psi"  # psi | chi2
    threshold: float = 0.2


@dataclass
class TableRules:
    unique: list[str] | None = None
    order: OrderRule | None = None
    refs: list[RefRule] = field(default_factory=list)
    first_role: str | None = None  # first turn of each conversation
    drift: DriftRule | None = None


@dataclass
class Spec:
    event_name: str
    fields: dict[str, FieldRule]
    table: TableRules = field(default_factory=TableRules)
    version: Any = None

    def spec_hash(self) -> str:
        """Stable fingerprint of the spec (for manifest lineage records)."""
        payload = json.dumps(spec_to_dict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _parse_field(name: str, raw: dict[str, Any]) -> FieldRule:
    if not isinstance(raw, dict):
        raise ValueError(f"rule for field {name!r} must be an object, got {raw!r}")
    optional = raw.get("optional") is True or raw.get("required") is False
    nested = None
    if raw.get("nestedSchema"):
        nested = {
            k: _parse_field(k, v)
            for k, v in raw["nestedSchema"].items()
            if k != "version"
        }
    length = None
    if "length" in raw:
        # parseInt(rule.length), validationHelpers.js:77 — JS parseInt takes
        # the longest leading integer prefix ("12px" -> 12, 1e21 -> 1); a
        # prefix-free string (parseInt -> NaN, which a JS !== would turn
        # into always-violating) is rejected at load time with a clear error
        m = re.match(r"[+-]?\d+", str(raw["length"]).strip())
        if m is None:
            raise ValueError(
                f"length rule for field {name!r} does not parse as an "
                f"integer (JS parseInt -> NaN): {raw['length']!r}"
            )
        length = int(m.group())
    value = _NO
    if "value" in raw:
        v = _normalize_value(raw["value"])
        # drop empty / "Any" per helpers.py:139-143
        if not (isinstance(v, str) and (v == "" or v == "Any")):
            value = v
    known = {
        "type", "value", "enum", "regex", "length", "optional", "required",
        "description", "nestedSchema",
    }
    return FieldRule(
        name=name,
        type=raw.get("type"),
        value=value,
        enum=list(raw["enum"]) if raw.get("enum") is not None else None,
        regex=raw.get("regex"),
        length=length,
        optional=optional,
        description=raw.get("description"),
        nested=nested,
        extra={k: v for k, v in raw.items() if k not in known},
    )


def _parse_table(raw: dict[str, Any]) -> TableRules:
    t = TableRules()
    if raw.get("unique"):
        t.unique = list(raw["unique"])
    if raw.get("order"):
        o = raw["order"]
        t.order = OrderRule(
            by=o.get("by", "turn_idx"),
            within=o.get("within", "conv_id"),
            contiguous=bool(o.get("contiguous", True)),
            ts_monotone=bool(o.get("ts_monotone", True)),
            ts_column=o.get("ts_column", "ts"),
            alternate=list(o.get("alternate", [])),
        )
    for r in raw.get("refs", []):
        t.refs.append(
            RefRule(
                field=r["field"],
                when_field=r["when_field"],
                when_value=r["when_value"],
                iff=bool(r.get("iff", True)),
            )
        )
    if raw.get("first_role"):
        t.first_role = raw["first_role"]
    if raw.get("drift"):
        d = raw["drift"]
        t.drift = DriftRule(
            columns=list(d.get("columns", [])),
            method=d.get("method", "psi"),
            threshold=float(d.get("threshold", 0.2)),
        )
    return t


def load_spec(raw: dict[str, Any] | str, event_name: str = "transcript") -> Spec:
    """Load a spec from a JSON string / dict in the reference's schema-document
    shape (one flat map field -> rule, plus optional `_table`)."""
    if isinstance(raw, str):
        raw = json.loads(raw)
    fields = {
        k: _parse_field(k, v) for k, v in raw.items() if k not in RESERVED_KEYS
    }
    table = _parse_table(raw.get("_table", {})) if isinstance(raw.get("_table"), dict) else TableRules()
    return Spec(
        event_name=event_name,
        fields=fields,
        table=table,
        version=raw.get("version"),
    )


def load_spec_file(path: str, event_name: str | None = None) -> Spec:
    with open(path) as f:
        raw = json.load(f)
    name = event_name or path.rsplit("/", 1)[-1].removesuffix(".json")
    return load_spec(raw, event_name=name)


def spec_to_dict(spec: Spec) -> dict[str, Any]:
    def f2d(r: FieldRule) -> dict[str, Any]:
        d: dict[str, Any] = {}
        if r.type is not None:
            d["type"] = r.type
        if r.has_value:
            d["value"] = r.value
        if r.enum is not None:
            d["enum"] = r.enum
        if r.regex is not None:
            d["regex"] = r.regex
        if r.length is not None:
            d["length"] = r.length
        if r.optional:
            d["optional"] = True
        if r.description is not None:
            d["description"] = r.description
        if r.nested:
            d["nestedSchema"] = {k: f2d(v) for k, v in r.nested.items()}
        # custom rule keys (CUSTOM_CHECKS dispatch) change validation results
        # and so MUST survive the round trip: save_spec would otherwise strip
        # them, and spec_hash — the manifest's resume key — would collide
        # for specs differing only in a custom rule
        d.update(r.extra)
        return d

    out: dict[str, Any] = {k: f2d(v) for k, v in spec.fields.items()}
    t = spec.table
    td: dict[str, Any] = {}
    if t.unique:
        td["unique"] = t.unique
    if t.order:
        td["order"] = {
            "by": t.order.by,
            "within": t.order.within,
            "contiguous": t.order.contiguous,
            "ts_monotone": t.order.ts_monotone,
            "ts_column": t.order.ts_column,
            "alternate": t.order.alternate,
        }
    if t.refs:
        td["refs"] = [
            {"field": r.field, "when_field": r.when_field, "when_value": r.when_value, "iff": r.iff}
            for r in t.refs
        ]
    if t.first_role:
        td["first_role"] = t.first_role
    if t.drift:
        td["drift"] = {
            "columns": t.drift.columns,
            "method": t.drift.method,
            "threshold": t.drift.threshold,
        }
    if td:
        out["_table"] = td
    return out


# ---------------------------------------------------------------------------
# The default transcript spec (FIXTURES.md §5) — the flagship table contract.
# ---------------------------------------------------------------------------

TRANSCRIPT_SPEC_JSON: dict[str, Any] = {
    "conv_id": {"type": "string", "regex": "^conv_[0-9]{8}$"},
    "turn_idx": {"type": "number"},
    "role": {"type": "string", "enum": ["user", "assistant", "tool", "system"]},
    "text": {"type": "string"},
    "tool": {"type": "string", "regex": "^[a-z_][a-z0-9_]*$", "optional": True},
    "ts": {"type": "timestamp"},
    "_table": {
        "unique": ["conv_id", "turn_idx"],
        "order": {
            "by": "turn_idx",
            "within": "conv_id",
            "contiguous": True,
            "ts_monotone": True,
            "ts_column": "ts",
        },
        "refs": [
            {"field": "tool", "when_field": "role", "when_value": "tool", "iff": True}
        ],
        "first_role": "user",
        "drift": {"columns": ["role", "tool"], "method": "psi", "threshold": 0.2},
    },
}


def transcript_spec() -> Spec:
    return load_spec(TRANSCRIPT_SPEC_JSON, event_name="transcript")
