"""Citation rendering kernels: RIS / CSL-JSON / BibTeX.

Reference parity: src/extract_ocr/citations.py (RIS :18-38, CSL-JSON
:41-62, BibTeX :65-87). Rendering is a pure function of the citation
fields; the engine layer emits one rendered string per row (a projection
of the lineage table), and the file sink is a trivial text write.
"""

from __future__ import annotations

import json
from typing import Any


def ris_entry(title: str, url: str, accessed: str,
              local_path: str | None = None, publisher: str | None = None,
              author: str | None = None) -> str:
    lines = ["TY  - ELEC", f"TI  - {title}"]
    if author:
        lines.append(f"A1  - {author}")
    if publisher:
        lines.append(f"PB  - {publisher}")
    lines.append(f"UR  - {url}")
    lines.append(f"Y2  - {accessed}")
    if local_path:
        lines.append(f"L1  - {local_path}")
    lines.append("ER  - ")
    return "\n".join(lines)


def csl_entry(title: str, url: str, accessed: str,
              local_path: str | None = None, publisher: str | None = None,
              author: str | None = None) -> dict[str, Any]:
    entry: dict[str, Any] = {
        "type": "webpage",
        "title": title,
        "URL": url,
        "accessed": {"raw": accessed},
    }
    if publisher:
        entry["publisher"] = publisher
    if author:
        entry["author"] = [{"literal": author}]
    if local_path:
        entry["note"] = f"Local copy: {local_path}"
    return entry


def csl_json(entries: list[dict[str, Any]]) -> str:
    return json.dumps(entries, indent=2, ensure_ascii=False)


def bibtex_entry(idx: int, title: str, url: str, accessed: str,
                 local_path: str | None = None, publisher: str | None = None,
                 author: str | None = None) -> str:
    key = f"ref{idx:04d}"
    lines = [f"@online{{{key},", f"  title = {{{title}}},"]
    if author:
        lines.append(f"  author = {{{author}}},")
    if publisher:
        lines.append(f"  organization = {{{publisher}}},")
    lines.append(f"  url = {{{url}}},")
    lines.append(f"  urldate = {{{accessed}}},")
    if local_path:
        lines.append(f"  note = {{Local copy: {local_path}}},")
    lines.append("}")
    return "\n".join(lines)
