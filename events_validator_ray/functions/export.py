"""Schema documentation exporter (S10 analog).

The reference exports each schema as a PDF document — a header with schema
name + version, a parameter table (Name / Type / Required / value /
Description) and one nested-key table per `array` field
(streamlit_ev/app/export.py:42-191, reportlab). Two media here: Markdown
(same section/table structure, greppable) and REAL PDF via the stdlib-only
serializer in `pdfmini` (base-14 Helvetica, Flate streams, exact xref) —
no reportlab required.
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


_COLS = ["Name", "Type", "Required", "value", "Description"]
_COL_W = [3.0, 1.5, 1.2, 1.5, 4.0]


def _pdf_cells(name: str, r: FieldRule) -> list[str]:
    value = "" if not r.has_value else js_tostring(r.value)
    return [
        name,
        r.type or "",
        "No" if r.optional else "Yes",
        "" if value is None else str(value),
        r.description or "",
    ]


def export_schema_pdf(spec: Spec) -> bytes:
    """Render one schema document as a real PDF (download_schema_pdf analog:
    header + parameter table + one nested-key table per container field)."""
    from .pdfmini import PdfDoc

    doc = PdfDoc()
    doc.line(f"Schema: {spec.event_name or 'not provided'}", size=16, bold=True)
    doc.line(
        f"version: {spec.version if spec.version is not None else 'not provided'}",
        size=10,
    )
    doc.gap(8)

    def table(rows: list[list[str]]) -> None:
        doc.table_row(_COLS, _COL_W, size=9, bold=True)
        doc.rule()
        for cells in rows:
            doc.table_row(cells, _COL_W, size=9)
        doc.rule()

    doc.line("Parameters", size=13, bold=True)
    table([_pdf_cells(n, r) for n, r in spec.fields.items()])
    for name, rule in spec.fields.items():
        if rule.type in ("array", "object") and rule.nested:
            doc.gap(8)
            doc.line(f"{name}: nested keys", size=13, bold=True)
            table([_pdf_cells(n, r) for n, r in rule.nested.items()])
    return doc.render()


def export_spec_dir_pdf(specs: dict[str, Spec], out_dir: str) -> list[str]:
    """Write `${event_name}.pdf` per schema (atomic per file)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, spec in specs.items():
        path = os.path.join(out_dir, f"{name}.pdf")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(export_schema_pdf(spec))
        os.replace(tmp, path)
        paths.append(path)
    return paths


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
