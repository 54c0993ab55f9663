"""Scalar text kernels: truncation, JSON/XML pretty-print, lossy decode.

Reference parity:
- ``truncate_text``: crawl.py:61-64 (400k-char cap + ``[TRUNCATED]``)
- ``pretty_json``: crawl.py:77-85 (strict parse → ``json.dumps(indent=2,
  ensure_ascii=False)``; fallback = replace-decoded raw text)
- ``pretty_xml``: crawl.py:87-96 (minidom pretty-print, blank lines
  dropped; fallback raw)
- ``lossy_decode``: ``bytes.decode("utf-8", errors="replace")``
  (crawl.py:186 etc.)
"""

from __future__ import annotations

import json
from xml.dom import minidom
from xml.parsers.expat import ExpatError

TRUNCATION_MARKER = "\n\n[TRUNCATED]\n"
MAX_TEXT_CHARS = 400_000


def truncate_text(text: str, *, max_chars: int = MAX_TEXT_CHARS) -> tuple[str, bool]:
    if len(text) <= max_chars:
        return text, False
    return text[:max_chars].rstrip("\n") + TRUNCATION_MARKER, True


def pretty_json(text: str | None) -> str:
    raw = text or ""
    try:
        obj = json.loads(raw)
        return json.dumps(obj, indent=2, ensure_ascii=False) + "\n"
    except (json.JSONDecodeError, ValueError):
        return raw


def pretty_xml(text: str | None) -> str:
    raw = text or ""
    try:
        doc = minidom.parseString(raw.encode("utf-8"))
        pretty = doc.toprettyxml(indent="  ")
        lines = [ln.rstrip() for ln in pretty.splitlines() if ln.strip()]
        return "\n".join(lines).strip() + "\n"
    except (ExpatError, UnicodeEncodeError, ValueError):
        return raw.strip() + "\n"


def plain_text(text: str | None) -> str:
    return (text or "").strip() + "\n"


def lossy_decode(body: bytes) -> str:
    return body.decode("utf-8", errors="replace")


def wrap_source_bullets(source_url: str, *, max_width: int = 100) -> list[str]:
    """Reference parity: apis_report.py:141-163 (_wrap_source_bullets) —
    a '  - source: <url>' bullet, textwrap-wrapped at ``max_width`` with
    break_long_words=True / break_on_hyphens=False, continuation lines
    indented to the prefix width."""
    import textwrap

    prefix = "  - source: "
    if len(prefix) + len(source_url) <= max_width:
        return [f"{prefix}{source_url}"]
    wrapped = textwrap.wrap(
        source_url,
        width=max_width - len(prefix),
        break_long_words=True,
        break_on_hyphens=False,
    )
    if not wrapped:
        return [f"{prefix}{source_url}"]
    lines = [f"{prefix}{wrapped[0]}"]
    continuation = " " * len(prefix)
    lines.extend(f"{continuation}{part}" for part in wrapped[1:])
    return lines
