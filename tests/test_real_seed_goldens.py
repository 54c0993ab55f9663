"""Golden tests over the reference's real browser-saved seed corpus
(/root/reference/docs/**/seeds/*.html — USPTO ODP pages, EndNote TOC).

These are the reference's de-facto golden inputs (SURVEY §5): real-world
malformed browser HTML, Angular SPA shells, 300 KB pages with huge inline
scripts. The frozen goldens record, per input file (keyed by content
hash), the extracted markdown's length and sha256 — regenerate with
``python tests/goldens/gen_real_seeds.py`` after an intentional kernel
change and review the diff.

PDF note: every ``*.pdf`` in the reference checkout (incl.
``EndNote 25/EndNote.ocr.pdf``) is a 132-byte git-lfs *pointer file*
("version https://git-lfs.github.com/spec/v1 ..."), not a PDF — the
binary fixtures are unavailable in this environment, so PDF parity
remains covered by the synthetic layout-text corpus only.

WAF note: extraction runs with ``waf_integration=False``, mirroring the
reference's local-seed ingest (cli.py:473-483): browser-saved SPA pages
are thin shells the anchor-count heuristic would misclassify as
interstitials (19 of the 71 real pages would be silently dropped
otherwise — found by running exactly this corpus).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterator

import pandas as pd
import pytest

from extract_ocr_spark.pipeline import extract_df
from extract_ocr_spark.schemas import DOCUMENTS_SCHEMA

SEEDS = "/root/reference/docs"
GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "real_seeds.json")


def seed_docs(spark):
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .option("recursiveFileLookup", "true")
        .load(SEEDS)
        .filter("path not rlike '_files/'")
        .select("path", "content")
    )

    def to_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, spans = [], []
            for content in pdf["content"]:
                raw = bytes(content)
                ids.append(hashlib.sha256(raw).hexdigest()[:12])
                spans.append([{
                    "kind": "html",
                    "text": raw.decode("utf-8", errors="replace"),
                    "media_ref": None, "offset": 0,
                }])
            yield pd.DataFrame({"doc_id": ids, "spans": spans})

    return files.mapInPandas(to_docs, schema=DOCUMENTS_SCHEMA)


def extract_goldens(spark) -> dict[str, dict]:
    out = extract_df(seed_docs(spark), waf_integration=False).collect()
    result = {}
    for r in out:
        spans = r["out_spans"]
        assert spans, f"seed {r['doc_id']} produced no spans"
        md = spans[0]["text"]
        result[r["doc_id"]] = {
            "n_spans": len(spans),
            "md_len": len(md),
            "md_sha": hashlib.sha256(md.encode("utf-8")).hexdigest()[:16],
        }
    return result


@pytest.mark.skipif(not os.path.isdir(SEEDS), reason="reference seeds absent")
def test_real_seed_goldens(spark):
    with open(GOLDEN) as f:
        golden = json.load(f)
    got = extract_goldens(spark)
    assert len(got) == len(golden) == 71
    mismatches = {
        k: (got.get(k), golden[k]) for k in golden if got.get(k) != golden[k]
    }
    assert not mismatches, f"{len(mismatches)} seed goldens changed: " \
        f"{dict(list(mismatches.items())[:3])}"
