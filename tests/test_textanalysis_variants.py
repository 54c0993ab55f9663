"""The applyInPandas grouped-map top-terms variant (API demo) must agree
with the native partial-aggregation scale path."""

from __future__ import annotations

from extract_ocr_spark.operators.textanalysis import (
    top_terms_per_source,
    top_terms_per_source_grouped_map,
)

SF = "/root/testdata/sf0.001"


def test_top_terms_variants_agree(spark):
    native = [tuple(r) for r in top_terms_per_source(spark, SF).collect()]
    demo = [tuple(r) for r in top_terms_per_source_grouped_map(spark, SF).collect()]
    assert native == demo
    assert len(native) > 0
