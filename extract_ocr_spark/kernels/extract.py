"""Fused per-document extraction kernel.

One document = ``(doc_id, spans)`` where ``spans`` is a list of
``{kind, text, media_ref, offset}``. The kernel dispatches each span on
``kind`` and emits an ordered list of output spans
``{kind, text, media_ref, order}`` — the per-row invariant is
**span-sequence equality (kind, text, media_ref, order)**.

Kind dispatch (reference code paths):

- ``html``  → markdown via boilerplate-stripped ATX emission with a
  ``Source:`` header (convert/html_to_md.py:47-53); WAF interstitials
  (content.py:48-93) are dropped (reference skips them: crawl.py:1000-1021)
- ``pdf``   → layout-aware text with reading-order reconstruction
  (crawl.py:98-124 semantics)
- ``ocr``   → OCR normalization (blank-run collapse, de-hyphenation)
- ``json``  → pretty-printed JSON, replace-fallback (crawl.py:77-85)
- ``xml``   → pretty-printed XML, raw fallback (crawl.py:87-96)
- ``text``  → stripped + trailing newline
- ``media`` → passthrough ``(kind='media', text=None, media_ref, order)``
- ``zip`` / ``bytes`` → no output span (reference stores these raw but
  never renders page variants: crawl.py:853-860 vs the rendered set at
  :303-309)
- other unknown kinds → treated as ``text`` (robustness default)

Every emitted text is capped at 400k chars with a ``[TRUNCATED]`` marker
(crawl.py:61-64). The kernel is a pure function of (doc_id, spans): output
is independent of partitioning, task retries, and input span order (spans
are sorted by ``offset`` first; ties broken by input position).
"""

from __future__ import annotations

from typing import Any

from .contentkit import is_waf_challenge_html_text
from .htmlkit import html_to_markdown
from .ocrkit import normalize_ocr_text
from .pdfkit import extract_pdf_text
from .textops import plain_text, pretty_json, pretty_xml, truncate_text

OUT_MARKDOWN = "markdown"
OUT_TEXT = "text"
OUT_MEDIA = "media"


def extract_doc(doc_id: str, spans: list[dict[str, Any]] | None,
                *, mode: str = "reference",
                waf_integration: bool = True) -> list[dict[str, Any]]:
    """Extract one document's interleaved spans into ordered output spans."""
    if doc_id is None:
        raise ValueError("doc_id must not be null (input-table contract)")
    if not spans:
        return []

    # Deterministic interleave order: offset first (strictly increasing per
    # the input contract), with a content-based tie-break so the result is
    # invariant to the physical span order even for malformed inputs with
    # duplicate offsets. Spans with a null offset order by input position.
    def sort_key(t):
        pos, span = t
        off = span.get("offset")
        text = span.get("text")
        ref = span.get("media_ref")
        return (
            off if off is not None else pos,
            span.get("kind") or "",
            text is None, text or "",
            ref is None, ref or "",
        )

    indexed = sorted(enumerate(spans), key=sort_key)
    out: list[dict[str, Any]] = []
    order = 0
    for pos, span in indexed:
        kind = (span.get("kind") or "text").lower()
        text = span.get("text")
        media_ref = span.get("media_ref")

        if kind == "media":
            out.append({"kind": OUT_MEDIA, "text": None,
                        "media_ref": media_ref, "order": order})
            order += 1
            continue

        if kind in ("zip", "bytes"):
            # stored-not-rendered in the reference: no output span
            continue

        if kind == "html":
            raw = text or ""
            # Local-seed ingest disables the anchor-count integration
            # heuristic (reference cli.py:473-483 / content.py:76-77):
            # browser-saved SPA pages are thin shells the heuristic would
            # misclassify as interstitials. Hard block markers always apply.
            if is_waf_challenge_html_text(
                    raw, allow_integration_heuristic=waf_integration):
                # Reference skips WAF interstitials entirely
                # (crawl.py:1000-1021: blocked_waf, no variants written).
                continue
            off = span.get("offset")
            rendered = html_to_markdown(
                raw,
                source_url=f"doc://{doc_id}/{off if off is not None else pos}",
                mode=mode)
            out_kind = OUT_MARKDOWN
        elif kind == "pdf":
            rendered = extract_pdf_text(text)
            out_kind = OUT_TEXT
        elif kind == "ocr":
            rendered = normalize_ocr_text(text)
            out_kind = OUT_TEXT
        elif kind == "json":
            rendered = pretty_json(text)
            out_kind = OUT_TEXT
        elif kind == "xml":
            rendered = pretty_xml(text)
            out_kind = OUT_TEXT
        else:  # "text" and unknown kinds
            rendered = plain_text(text)
            out_kind = OUT_TEXT

        rendered, _truncated = truncate_text(rendered)
        # Uniform invariant: every text output ends with exactly one
        # trailing newline (the JSON replace-fallback returns raw text).
        if not rendered.endswith("\n"):
            rendered += "\n"
        out.append({"kind": out_kind, "text": rendered,
                    "media_ref": None, "order": order})
        order += 1
    return out


def doc_size_bytes(spans: list[dict[str, Any]] | None) -> int:
    """Total payload size of a document, for size-class skew salting."""
    if not spans:
        return 0
    total = 0
    for s in spans:
        t = s.get("text")
        if t:
            total += len(t)
    return total
