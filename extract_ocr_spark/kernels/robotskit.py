"""robots.txt rule evaluation: longest-prefix match with Allow overriding
Disallow on ties, rules pre-sorted by prefix length descending.

Reference parity: src/extract_ocr/robots.py (parse :1-44, pre-sort :45-46,
can_fetch longest-prefix :48-56).
"""

from __future__ import annotations


def parse_robots(text: str) -> list[tuple[str, str]]:
    """Parse a robots.txt body into [(rule, path_prefix)] for the ``*``
    agent, sorted by prefix length desc then Allow-first (so the first
    match wins ties in favor of Allow)."""
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
    rules.sort(key=lambda r: (-len(r[1]), 0 if r[0] == "allow" else 1))
    return rules


def can_fetch(rules: list[tuple[str, str]], path: str) -> bool:
    """Longest-prefix rule decides; no match → allowed."""
    for rule, prefix in rules:
        if path.startswith(prefix):
            return rule == "allow"
    return True
