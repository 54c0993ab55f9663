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


# -- E12 golden: the real EndNote left-panel TOC end-to-end ---------------------

ENDNOTE_TOC = os.path.join(
    SEEDS, "EndNote 25", "seeds", "endnote25_windows_leftpanel.html")
ENDNOTE_SEED_URL = (
    "https://docs.endnote.com/docs/endnote/2025/v1/windows/en/"
    "content/00endnote_libraries/00endnote_libraries_and_references.htm")


@pytest.mark.skipif(not os.path.exists(ENDNOTE_TOC),
                    reason="reference seed corpus not present")
def test_endnote_toc_golden_kernels():
    """Frozen golden over the real 89 KB EndNote left panel: the raw
    href filter (reference endnote25_windows.py:27-42) and the
    absolutize+normalize+first-seen stage (:46-55). 162 anchors, 106
    with href (all .htm), 100 unique absolute URLs."""
    from extract_ocr_spark.kernels.htmlkit import extract_toc_hrefs
    from extract_ocr_spark.kernels.urlkit import build_absolute_url_list

    html = open(ENDNOTE_TOC, encoding="utf-8", errors="replace").read()
    hrefs = extract_toc_hrefs(html)
    urls = build_absolute_url_list(hrefs, ENDNOTE_SEED_URL)
    assert len(hrefs) == 106
    assert len(urls) == 100
    assert hashlib.md5("\n".join(hrefs).encode()).hexdigest() == \
        "86c92df1d2dd027810c9c2cd9ee9af7f"
    assert hashlib.md5("\n".join(urls).encode()).hexdigest() == \
        "69435ee2c90b10b645f672914a21333c"
    # seed self-link first (the panel links the seed page itself)
    assert urls[0] == ENDNOTE_SEED_URL
    assert urls[-1].endswith("/14rtf/format_paper.htm")


@pytest.mark.skipif(not os.path.exists(ENDNOTE_TOC),
                    reason="reference seed corpus not present")
def test_endnote_toc_consolidated_index_end_to_end(spark):
    """Seed → TOC order → consolidated index (S13/E12): exported pages
    join in, unexported TOC slots render '(missing)' in place, output
    order equals TOC order."""
    from extract_ocr_spark.kernels.htmlkit import extract_toc_hrefs
    from extract_ocr_spark.kernels.urlkit import build_absolute_url_list
    from extract_ocr_spark.operators.export import toc_index_df

    html = open(ENDNOTE_TOC, encoding="utf-8", errors="replace").read()
    urls = build_absolute_url_list(extract_toc_hrefs(html), ENDNOTE_SEED_URL)
    # "export" every other page
    pages = spark.createDataFrame(
        [(u, f"Title {i}", f"pages/p{i}.md")
         for i, u in enumerate(urls) if i % 2 == 0],
        "url string, title string, path string")
    df = toc_index_df(html, ENDNOTE_SEED_URL, pages)
    out = df.collect()
    assert len(out) == 100
    assert [r["ord"] for r in out] == list(range(100))
    assert [r["url"] for r in out] == urls
    assert out[0]["toc_line"] == "- [Title 0](pages/p0.md)"
    assert out[1]["toc_line"] == f"- [(missing)]({urls[1]})"
    # plan: the tiny TOC side is broadcast, never shuffled (read the AQE
    # final plan — before execution it prints isFinalPlan=false stubs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
