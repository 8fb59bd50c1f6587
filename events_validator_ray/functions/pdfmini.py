"""Minimal stdlib-only PDF 1.4 writer (the S10 exporter's real-PDF medium).

The reference exports schema docs through reportlab
(streamlit_ev/app/export.py:42-191); no PDF toolchain ships in this
container, so this module serializes the same page content — text lines and
simple table rules — directly in the PDF object model: base-14 Helvetica
fonts (no embedding required by the spec), Flate-compressed content streams
(zlib), a correct xref table and trailer. Output opens in any conforming
viewer; a structural round-trip (offset-exact xref, stream inflate, text
extraction) is unit-tested since no PDF reader ships here either.
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612, 792  # US letter, points
MARGIN = 40


def _esc(s: str) -> str:
    """PDF literal-string escape; non-latin-1 chars degrade to '?' (base-14
    fonts are WinAnsi-encoded single-byte)."""
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif "\x20" <= ch <= "\x7e" or "\xa0" <= ch <= "\xff":
            out.append(ch)
        elif ch == "\n":
            out.append("\\n")
        else:
            out.append("?")
    return "".join(out)


class PdfPage:
    def __init__(self) -> None:
        self.ops: list[str] = []
        self.y = PAGE_H - MARGIN

    def text(self, x: float, y: float, s: str, size: float = 10, bold: bool = False) -> None:
        font = "/F2" if bold else "/F1"
        self.ops.append(f"BT {font} {size:g} Tf {x:g} {y:g} Td ({_esc(s)}) Tj ET")

    def hline(self, x1: float, x2: float, y: float, width: float = 0.5) -> None:
        self.ops.append(f"{width:g} w {x1:g} {y:g} m {x2:g} {y:g} l S")

    def content(self) -> bytes:
        return "\n".join(self.ops).encode("latin-1", "replace")


class PdfDoc:
    """Line-oriented page layout over the raw page ops: `line`/`table_row`
    advance a cursor and break pages automatically."""

    def __init__(self) -> None:
        self.pages: list[PdfPage] = [PdfPage()]

    @property
    def page(self) -> PdfPage:
        return self.pages[-1]

    def _need(self, h: float) -> None:
        if self.page.y - h < MARGIN:
            self.pages.append(PdfPage())

    def line(self, s: str, size: float = 10, bold: bool = False, leading: float | None = None) -> None:
        lead = leading if leading is not None else size * 1.4
        self._need(lead)
        self.page.y -= lead
        self.page.text(MARGIN, self.page.y, s, size=size, bold=bold)

    def gap(self, h: float = 6) -> None:
        self._need(h)
        self.page.y -= h

    def rule(self) -> None:
        self._need(4)
        self.page.y -= 2
        self.page.hline(MARGIN, PAGE_W - MARGIN, self.page.y)
        self.page.y -= 2

    def table_row(self, cells: list[str], widths: list[float], size: float = 9, bold: bool = False) -> None:
        lead = size * 1.5
        self._need(lead)
        self.page.y -= lead
        x = MARGIN
        avail = PAGE_W - 2 * MARGIN
        for cell, w in zip(cells, widths):
            frac = w / sum(widths)
            # crude clip: ~0.5pt/char average width at Helvetica size 9
            max_chars = max(4, int(avail * frac / (size * 0.55)))
            self.page.text(x, self.page.y, cell[:max_chars], size=size, bold=bold)
            x += avail * frac

    def render(self) -> bytes:
        """Serialize: catalog(1) pages(2) font(3) bold-font(4), then per page
        [page obj, content obj]; offset-exact xref + trailer."""
        objs: list[bytes] = []
        n_pages = len(self.pages)
        page_ids = [5 + 2 * i for i in range(n_pages)]
        kids = " ".join(f"{pid} 0 R" for pid in page_ids)
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
        )
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
        )
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold /Encoding /WinAnsiEncoding >>"
        )
        for i, pg in enumerate(self.pages):
            cid = page_ids[i] + 1
            objs.append(
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                    f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> "
                    f"/Contents {cid} 0 R >>"
                ).encode()
            )
            raw = zlib.compress(pg.content())
            objs.append(
                f"<< /Length {len(raw)} /Filter /FlateDecode >>\nstream\n".encode()
                + raw
                + b"\nendstream"
            )
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)
