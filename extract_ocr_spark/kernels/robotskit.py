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
