"""Schema documentation exporter (S10 analog).

The reference exports each schema as a PDF document — a header with schema
name + version, a parameter table (Name / Type / Required / value /
Description) and one nested-key table per `array` field
(streamlit_ev/app/export.py:42-191, reportlab). No PDF toolchain ships in
this container, so the analog renders the SAME structure as Markdown — the
content contract (sections, columns, nested tables) is preserved; only the
output medium differs.
"""

from __future__ import annotations

from ..spec import FieldRule, Spec, js_tostring

_HEADER = "| Name | Type | Required | value | Description |"
_RULE = "|---|---|---|---|---|"


def _cell(v) -> str:
    if v is None:
        return ""
    return str(v).replace("|", "\\|").replace("\n", "<br>")


def _row(name: str, r: FieldRule) -> str:
    value = "" if not r.has_value else js_tostring(r.value)
    required = "No" if r.optional else "Yes"
    return (
        f"| **{_cell(name)}** | {_cell(r.type or '')} | {required} "
        f"| {_cell(value)} | {_cell(r.description or '')} |"
    )


def export_schema_markdown(spec: Spec) -> str:
    """Render one schema document (the download_schema_pdf analog)."""
    lines = [
        f"# Schema: {spec.event_name or 'not provided'}",
        "",
        f"version: {spec.version if spec.version is not None else 'not provided'}",
        "",
        "## Parameters",
        "",
        _HEADER,
        _RULE,
    ]
    for name, rule in spec.fields.items():
        lines.append(_row(name, rule))
    # one nested-key section per container field, like export.py:154-186
    for name, rule in spec.fields.items():
        if rule.type in ("array", "object") and rule.nested:
            lines += ["", f"## {name}: nested keys", "", _HEADER, _RULE]
            for nname, nrule in rule.nested.items():
                lines.append(_row(nname, nrule))
    lines.append("")
    return "\n".join(lines)


def export_spec_dir_markdown(specs: dict[str, Spec], out_dir: str) -> list[str]:
    """Write `${event_name}.md` per schema (atomic per file)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, spec in specs.items():
        path = os.path.join(out_dir, f"{name}.md")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(export_schema_markdown(spec))
        os.replace(tmp, path)
        paths.append(path)
    return paths
