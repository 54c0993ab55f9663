"""robots.txt rule evaluation: Allow-first prefix matching.

Reference parity: src/extract_ocr/robots.py — ``RobotsRules.can_fetch``
checks ALL Allow prefixes first (any match ⇒ allowed, regardless of
length), then Disallow prefixes, then defaults to allowed. E.g. rules
``Allow:/a`` + ``Disallow:/a/b`` allow path ``/a/b/c`` even though the
Disallow prefix is longer. (This deliberately deviates from RFC 9309
longest-match, matching the reference.)
"""

from __future__ import annotations


def parse_robots(text: str) -> list[tuple[str, str]]:
    """Parse a robots.txt body into [(rule, path_prefix)] for the ``*``
    agent, sorted Allow-first (reference checks every Allow before any
    Disallow), then by prefix length desc for determinism."""
    rules: list[tuple[str, str]] = []
    applies = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif applies and field in ("allow", "disallow") and value:
            rules.append((field, value))
    rules.sort(key=lambda r: (0 if r[0] == "allow" else 1, -len(r[1])))
    return rules


def can_fetch(rules: list[tuple[str, str]], path: str) -> bool:
    """Any matching Allow wins; else any matching Disallow blocks; no
    match → allowed (reference robots.py can_fetch)."""
    for rule, prefix in rules:
        if rule == "allow" and path.startswith(prefix):
            return True
    for rule, prefix in rules:
        if rule == "disallow" and path.startswith(prefix):
            return False
    return True


# -- S7: sitemap discovery + parse ---------------------------------------------

import re as _re

_SITEMAP_LOC_RE = _re.compile(r"<loc>\s*(.*?)\s*</loc>", _re.S | _re.I)


def sitemaps_from_robots(robots_text: str) -> list[str]:
    """Sitemap URLs advertised by a robots.txt body: lines starting
    (case-insensitively) with ``sitemap:``, value after the FIRST colon,
    stripped and normalized (reference
    scripts/ingest_data_uspto_gov.py:587-601)."""
    from .urlkit import normalize_url

    out: list[str] = []
    for raw in (robots_text or "").splitlines():
        # strip first, like parse_robots above — indented directive lines
        # are common in the wild and allowed by RFC 9309's line grammar
        line = raw.strip()
        if line.lower().startswith("sitemap:"):
            _, _, value = line.partition(":")
            url = value.strip()
            if url:
                out.append(normalize_url(url))
    return out


def parse_sitemap_urls(xml_text: str) -> list[str]:
    """Every ``<loc>`` entry's stripped text, normalized (reference
    :604-610 uses BeautifulSoup; the <loc> grammar needs only a regex —
    no XML library ships in this container)."""
    from .urlkit import normalize_url

    return [normalize_url(m.group(1))
            for m in _SITEMAP_LOC_RE.finditer(xml_text or "")
            if m.group(1).strip()]
