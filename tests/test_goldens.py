"""Frozen golden fixtures: the kernel's output for the first 25 synthetic
documents, committed to the repo. Any semantic drift in the HTML/PDF/OCR/
JSON/XML kernels or the interleave-order logic breaks this test —
protection the self-referential pipeline-vs-kernel check can't give.

Regenerate deliberately (after an intentional semantic change) with:
    python -c "from tests.test_goldens import regenerate; regenerate()"
"""

import json
import os

from extract_ocr_spark.datagen import gen_doc
from extract_ocr_spark.kernels.extract import extract_doc

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "golden_spans_seed42.json")


def regenerate() -> None:
    golden = {}
    for i in range(25):
        d = gen_doc(i, seed=42)
        golden[d["doc_id"]] = extract_doc(d["doc_id"], d["spans"])
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1, ensure_ascii=False, sort_keys=True)


def test_kernel_matches_frozen_goldens():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert len(golden) == 25
    for i in range(25):
        d = gen_doc(i, seed=42)
        got = extract_doc(d["doc_id"], d["spans"])
        assert got == golden[d["doc_id"]], (
            f"kernel output drifted from frozen golden for doc {i}")
