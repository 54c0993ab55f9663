"""OCR-text normalization.

OCR spans carry noisy text: irregular intra-line whitespace, blank-line
runs, and end-of-line hyphenation. Normalization (deterministic, pure):

1. normalize line endings (``\\r\\n``/``\\r`` → ``\\n``)
2. de-hyphenate wrapped words: ``xxx-\\nyyy`` → ``xxxyyy`` when both sides
   are word characters (classic OCR line-wrap artifact)
3. per-line: strip + collapse internal whitespace runs to one space
4. collapse blank-line runs to ≤ 1 (reference blank-run collapse,
   crawl.py:49-57)
5. final strip + trailing newline
"""

from __future__ import annotations

import re

_DEHYPHEN_RE = re.compile(r"(\w)-[ \t]*\n[ \t]*(\w)")
_WS_RUN_RE = re.compile(r"[ \t\f\v]+")


def normalize_ocr_text(text: str | None) -> str:
    if not text:
        return "\n"
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = _DEHYPHEN_RE.sub(r"\1\2", text)
    lines = [_WS_RUN_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    out: list[str] = []
    blank_run = 0
    for ln in lines:
        if not ln:
            blank_run += 1
            if blank_run <= 1:
                out.append("")
            continue
        blank_run = 0
        out.append(ln)
    return "\n".join(out).strip() + "\n"
