"""Content-kind sniffing and WAF-interstitial classification.

Reference parity: src/extract_ocr/content.py (looks_like_html :39-45,
is_waf_challenge :48-93, sniff_kind :96-150). Gate order inside these
functions is load-bearing (cheap-check-first short-circuit) and preserved.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

from .urlkit import is_asset_intent_url

KIND_HTML = "html"
KIND_JSON = "json"
KIND_XML = "xml"
KIND_PDF = "pdf"
KIND_TEXT = "text"
KIND_ZIP = "zip"
KIND_BYTES = "bytes"

_WAF_INTEGRATION_MARKERS = (
    re.compile(r"edge\.sdk\.awswaf\.com", re.I),
    re.compile(r"awsWafCookieDomainList", re.I),
    re.compile(r"challenge\.js", re.I),
)
_HARD_BLOCK_MARKERS = (
    re.compile(r"Request\s+blocked", re.I),
    re.compile(r"You\s+have\s+been\s+blocked", re.I),
    re.compile(r"The\s+requested\s+URL\s+was\s+rejected", re.I),
)
_ANCHOR_RE = re.compile(r"<\s*a\b", re.I)


def looks_like_html(data: bytes) -> bool:
    head = data[:2048].lstrip()
    low = head.lower()
    return head.startswith(b"<") and (
        b"<html" in low or b"<!doctype" in low or b"<head" in low
    )


def is_waf_challenge(body: bytes, *, content_type: str | None,
                     allow_integration_heuristic: bool = True) -> bool:
    if content_type:
        ct = content_type.split(";", 1)[0].strip().lower()
        if ct not in {"text/html", "application/xhtml+xml"} and not looks_like_html(body):
            return False
    elif not looks_like_html(body):
        return False

    text = body[:200_000].decode("utf-8", errors="ignore")
    return _waf_markers_hit(text, allow_integration_heuristic)


def _waf_markers_hit(text: str, allow_integration_heuristic: bool) -> bool:
    if any(p.search(text) for p in _HARD_BLOCK_MARKERS):
        return True
    if not allow_integration_heuristic:
        return False
    if not any(p.search(text) for p in _WAF_INTEGRATION_MARKERS):
        return False
    # Interstitials are thin shells with few anchors; legit pages have nav.
    if len(_ANCHOR_RE.findall(text)) >= 5:
        return False
    return True


def is_waf_challenge_html_text(text: str,
                               allow_integration_heuristic: bool = True) -> bool:
    """``is_waf_challenge(text.encode('utf-8', 'ignore'),
    content_type='text/html', ...)`` without the encode→decode round-trip.

    For ASCII text within the 200k-byte window the byte path is an exact
    identity (utf-8-encode then utf-8-decode of ASCII is the text itself,
    and the known ``text/html`` content type short-circuits the byte head
    sniff), so the marker regexes can run on the string directly. Anything
    non-ASCII or longer falls back to the byte path — the 200k cut is a
    BYTE offset and must not be approximated in chars."""
    if len(text) <= 200_000 and text.isascii():
        return _waf_markers_hit(text, allow_integration_heuristic)
    return is_waf_challenge(text.encode("utf-8", errors="ignore"),
                            content_type="text/html",
                            allow_integration_heuristic=allow_integration_heuristic)


def sniff_kind(url: str, *, content_type: str | None, body: bytes) -> str:
    """Magic bytes > asset-intent > header > HTML body sniff > path ext."""
    if body.startswith(b"%PDF-"):
        return KIND_PDF
    if body.startswith(b"PK\x03\x04"):
        return KIND_ZIP

    if is_asset_intent_url(url):
        if content_type:
            ct = content_type.split(";", 1)[0].strip().lower()
            if ct in {"application/json", "text/json"}:
                return KIND_JSON
        return KIND_BYTES

    if content_type:
        ct = content_type.split(";", 1)[0].strip().lower()
        if ct in {"application/json", "text/json"}:
            return KIND_JSON
        if ct in {"application/xml", "text/xml"}:
            return KIND_XML
        if ct == "text/plain":
            return KIND_TEXT
        if ct in {"text/html", "application/xhtml+xml"}:
            return KIND_HTML

    if looks_like_html(body):
        return KIND_HTML

    path = urlparse(url or "").path.lower()
    if path.endswith(".json"):
        return KIND_JSON
    if path.endswith(".xml"):
        return KIND_XML
    if path.endswith(".txt"):
        return KIND_TEXT
    return KIND_BYTES
