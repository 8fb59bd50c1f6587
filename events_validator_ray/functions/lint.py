"""Spec lint: cross-check a constraint spec against an observed Arrow schema.

The Ray-native collapse of the reference's schema-health subsystem
(streamlit_ev/app/helpers/updater.py:151-217 — `check_schema_health` compares
each schema against the param repository, classifying findings as critical
(type conflicts) or minor (description/value/nested-shape drift)). Here the
"repository" is the physical Parquet schema: run at driver startup, before
any data moves.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..functions.kernels import arrow_js_typeof
from ..spec import Spec


@dataclass
class LintFinding:
    severity: str  # critical | minor
    field: str
    code: str
    message: str


def spec_lint(spec: Spec, schema: pa.Schema) -> list[LintFinding]:
    findings: list[LintFinding] = []
    names = set(schema.names)

    for rule in spec.fields.values():
        if rule.name not in names:
            findings.append(
                LintFinding(
                    "minor" if rule.optional else "critical",
                    rule.name,
                    "missing_column",
                    f"spec field {rule.name!r} has no column in the observed schema"
                    + (" (optional)" if rule.optional else " — every row will be a 'missing' violation"),
                )
            )
            continue
        col_kind = arrow_js_typeof(schema.field(rule.name).type)
        if rule.type is not None and rule.type != col_kind and rule.type in (
            "string",
            "number",
            "boolean",
            "timestamp",
            "array",
            "object",
        ):
            findings.append(
                LintFinding(
                    "critical",
                    rule.name,
                    "type_conflict",
                    f"rule type {rule.type!r} vs column type {col_kind!r} "
                    f"({schema.field(rule.name).type}) — every non-null row will fail",
                )
            )
        if rule.regex is not None and col_kind not in ("string", "number"):
            findings.append(
                LintFinding(
                    "minor",
                    rule.name,
                    "regex_on_nonstring",
                    f"regex rule on {col_kind!r} column relies on string coercion",
                )
            )
        if rule.length is not None and col_kind not in ("string", "array"):
            findings.append(
                LintFinding(
                    "minor",
                    rule.name,
                    "length_on_scalar",
                    f"length rule on {col_kind!r} column: JS `.length` of a "
                    "non-string/array is undefined — the rule fails every truthy row",
                )
            )

    ruled = {r.name for r in spec.fields.values()}
    for name in schema.names:
        if name not in ruled:
            findings.append(
                LintFinding(
                    "minor",
                    name,
                    "unvalidated_column",
                    f"column {name!r} has no rule (extra data fields are ignored, "
                    "matching the reference's schema-driven walk)",
                )
            )

    # wide-check columns must exist
    t = spec.table
    wide_cols = set()
    if t.unique:
        wide_cols.update(t.unique)
    if t.order:
        wide_cols.update({t.order.by, t.order.within, t.order.ts_column})
    for r in t.refs:
        wide_cols.update({r.field, r.when_field})
    for c in sorted(wide_cols - names):
        findings.append(
            LintFinding(
                "critical",
                c,
                "missing_wide_column",
                f"table-level checks reference column {c!r} which is absent",
            )
        )
    return findings


def lint_table(spec: Spec, schema: pa.Schema) -> "pd.DataFrame":  # noqa: F821
    import pandas as pd

    return pd.DataFrame(
        [
            {"severity": f.severity, "field": f.field, "code": f.code, "message": f.message}
            for f in spec_lint(spec, schema)
        ]
    )
