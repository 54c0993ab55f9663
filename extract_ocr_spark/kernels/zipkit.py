"""ZIP archive member handling (E15 at full strength).

The reference stores fetched archives without rendering in the crawl
path (crawl.py:853-860) but its docs-fetch helper opens the archive,
lists members, picks the single-HTML candidate, and extracts that member
(docs/pyUSPTO/fetch_latest_docs.py:59-82: ``pick_single_html`` —
``.html`` members only, prefer names containing "index", then shortest
name; stable order breaks remaining ties by archive listing order).

Pure-Python kernel over in-memory bytes: archives ride the span channel
as latin-1 strings like PDFs do, so everything works inside an
Arrow-batched UDF with no filesystem."""

from __future__ import annotations

import io
import zipfile


def zip_members(data: bytes) -> list[tuple[str, int]]:
    """(member_name, uncompressed_size) in archive listing order."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        return [(i.filename, i.file_size) for i in zf.infolist()
                if not i.is_dir()]


def pick_single_html(names: list[str]) -> str | None:
    """The reference's candidate pick (fetch_latest_docs.py:63-74):
    ``.html`` members only; prefer "index" in the (lowercased) name, then
    the shortest name; Python's stable sort keeps listing order for
    ties — mirrored exactly here."""
    candidates = [n for n in names if n.lower().endswith(".html")]
    if not candidates:
        return None
    return sorted(candidates,
                  key=lambda n: (0 if "index" in n.lower() else 1,
                                 len(n)))[0]


def read_member(data: bytes, name: str) -> bytes:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        return zf.read(name)


def zip_single_html_to_markdown(data: bytes) -> str | None:
    """End-to-end helper closing the reference's fetch pipeline: pick the
    single-HTML member and render it through the repo's HTML → markdown
    kernel (the reference feeds it to HTML2Text,
    fetch_latest_docs.py:85-92). None when the archive has no HTML."""
    from .htmlkit import html_to_markdown

    name = pick_single_html([n for n, _ in zip_members(data)])
    if name is None:
        return None
    return html_to_markdown(read_member(data, name).decode(
        "utf-8", errors="replace"))
