"""Layout-aware PDF text extraction with reading-order reconstruction.

The container ships no PDF library (reference used pypdf — crawl.py:98-124),
and the input spans table carries *pre-decoded layout text* for pdf spans,
so the kernel operates on a deterministic synthetic layout encoding:

- pages are separated by form-feed (``\\f``), mirroring per-page extraction
- a page whose first non-blank line starts with ``%%ERR`` models a page
  whose ``extract_text()`` raises → the page is skipped
  (reference: crawl.py:113-118 skip-bad-pages)
- positioned lines are encoded ``@<y>,<x>:<text>``; reading order is
  reconstructed by clustering lines into rows by ``y`` (tolerance) and
  sorting each row by ``x`` — this reproduces layout-aware reading-order
  reconstruction without binary PDF parsing
- unpositioned lines keep their textual order
- non-empty pages are joined with a blank line (``\\n\\n``)
  (reference: crawl.py:120-121)
- no extractable text → the reference's sentinel string
  (crawl.py:122-124)
"""

from __future__ import annotations

import re

NO_TEXT_SENTINEL = "(No extractable text found in PDF.)\n"
PARSE_FAIL_SENTINEL = "(PDF captured, but failed to parse it.)\n"

_POS_LINE_RE = re.compile(r"^@(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?):(.*)$")
_Y_TOLERANCE = 2.0


def _extract_page(page: str) -> str | None:
    """Extract one page's text in reading order; None = failing page."""
    lines = page.splitlines()
    first_non_blank = next((ln for ln in lines if ln.strip()), "")
    if first_non_blank.startswith("%%ERR"):
        return None

    positioned: list[tuple[float, float, int, str]] = []
    plain: list[str] = []
    any_positioned = False
    for i, ln in enumerate(lines):
        m = _POS_LINE_RE.match(ln)
        if m:
            any_positioned = True
            positioned.append((float(m.group(1)), float(m.group(2)), i, m.group(3)))
        elif ln.strip():
            plain.append(ln.rstrip())

    if not any_positioned:
        return "\n".join(plain).strip()

    # Reading order: cluster by y (rows), sort rows top-to-bottom, cells
    # left-to-right; same-row cells joined by a single space.
    positioned.sort(key=lambda t: (t[0], t[1], t[2]))
    rows: list[list[tuple[float, float, int, str]]] = []
    for item in positioned:
        if rows and abs(item[0] - rows[-1][0][0]) <= _Y_TOLERANCE:
            rows[-1].append(item)
        else:
            rows.append([item])
    out_lines: list[str] = []
    for row in rows:
        row.sort(key=lambda t: (t[1], t[2]))
        out_lines.append(" ".join(cell[3].strip() for cell in row if cell[3].strip()))
    # Plain lines (page headers etc. without coordinates) come first, in
    # textual order — deterministic and documented.
    return "\n".join([*plain, *out_lines]).strip()


def extract_pdf_text(layout_text: str | None) -> str:
    """Per-page extraction, skip failing pages, join non-empty pages with
    a blank line; sentinel when nothing is extractable."""
    if layout_text is None:
        return PARSE_FAIL_SENTINEL
    pages = layout_text.split("\f")
    parts: list[str] = []
    for page in pages:
        page_text = _extract_page(page)
        if page_text:
            parts.append(page_text)
    text = "\n\n".join(parts).strip() + "\n"
    if text.strip():
        return text
    return NO_TEXT_SENTINEL
