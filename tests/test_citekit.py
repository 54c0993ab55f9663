"""Citation kernel tests (reference citations.py semantics)."""

import json

from extract_ocr_spark.kernels.citekit import (
    bibtex_entry,
    csl_entry,
    csl_json,
    ris_entry,
)


def test_ris_full_and_minimal():
    full = ris_entry("T", "http://u", "2026-01-01", local_path="p",
                     publisher="Pub", author="Au")
    assert full.splitlines() == [
        "TY  - ELEC", "TI  - T", "A1  - Au", "PB  - Pub", "UR  - http://u",
        "Y2  - 2026-01-01", "L1  - p", "ER  - ",
    ]
    minimal = ris_entry("T", "http://u", "2026-01-01")
    assert "A1" not in minimal and "PB" not in minimal and "L1" not in minimal


def test_csl_entry_shape():
    e = csl_entry("T", "http://u", "2026-01-01", publisher="Pub",
                  author="Au", local_path="p")
    assert e["type"] == "webpage"
    assert e["accessed"] == {"raw": "2026-01-01"}
    assert e["author"] == [{"literal": "Au"}]
    assert e["note"] == "Local copy: p"
    parsed = json.loads(csl_json([e]))
    assert parsed[0]["URL"] == "http://u"


def test_bibtex_entry():
    b = bibtex_entry(3, "T", "http://u", "2026-01-01", publisher="Pub")
    assert b.startswith("@online{ref0003,")
    assert "  title = {T}," in b
    assert "  organization = {Pub}," in b
    assert "  urldate = {2026-01-01}," in b
    assert b.endswith("}")
