"""URL normalization and classification kernels.

Reference parity: src/extract_ocr/urls.py (normalize_url :10-32,
is_asset_intent_url :35-61, safe_filename_piece :64-71, UrlScope :74-89).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse, urlunparse

_TRACKING_QUERY_EXACT = frozenset({"agt=index"})

ASSET_EXTS = frozenset(
    {
        ".css", ".js", ".mjs", ".map", ".png", ".jpg", ".jpeg", ".gif",
        ".webp", ".svg", ".ico", ".woff", ".woff2", ".ttf", ".otf",
        ".eot", ".pdf", ".zip", ".gz", ".tgz",
    }
)


def normalize_url(raw_url: str) -> str:
    """Lowercase scheme+host, strip fragment, drop known tracking query."""
    parsed = urlparse(raw_url or "")
    query = parsed.query
    if query.strip().lower() in _TRACKING_QUERY_EXACT:
        query = ""
    parsed = parsed._replace(
        scheme=(parsed.scheme or "").lower(),
        netloc=(parsed.netloc or "").lower(),
        fragment="",
        query=query,
    )
    return urlunparse(parsed)


def is_asset_intent_url(url: str) -> bool:
    path = urlparse(url or "").path.lower()
    return any(path.endswith(ext) for ext in ASSET_EXTS)


def safe_filename_piece(text: str, *, max_len: int = 80) -> str:
    text = (text or "").strip()
    text = re.sub(r"\s+", "-", text)
    text = re.sub(r"[^A-Za-z0-9._-]+", "-", text)
    text = re.sub(r"-+", "-", text).strip("-")
    if not text:
        return "untitled"
    return text[:max_len]


def host_allowed(url: str, allow_host_suffixes: tuple[str, ...],
                 follow_offsite: bool = False) -> bool:
    """Host-suffix allowlist gate (reference urls.py:74-89)."""
    if follow_offsite:
        return True
    host = (urlparse(url or "").hostname or "").lower()
    if not host:
        return False
    for suffix in allow_host_suffixes:
        suffix = suffix.lower().lstrip(".")
        if host == suffix or host.endswith("." + suffix):
            return True
    return False


def url_hash_key(url: str, n: int = 12) -> str:
    """Stable short key: sha256(url)[:n] (reference crawl.py:711-712)."""
    import hashlib

    return hashlib.sha256((url or "").encode("utf-8")).hexdigest()[:n]
