"""Query/operator registry: every implemented operator from SURVEY.md §2
plus the training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-equivalent ANSI SQL; omitted keys
get the driver's weaker rows-only check).
"""

from __future__ import annotations


def all_queries():
    from .. import multimodal
    from . import (
        curation,
        dedup,
        export,
        extraction,
        links,
        relational,
        reporting,
        robots,
        similarity,
        textanalysis,
    )

    queries = {}
    oracles = {}
    for mod in (relational, extraction, dedup, similarity, textanalysis,
                reporting, export, robots, links, curation):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    queries["media_features"] = multimodal.media_features_query
    oracles["media_features"] = multimodal.MEDIA_FEATURES_SQL
    queries["resize_media"] = multimodal.resize_media_query
    oracles["resize_media"] = multimodal.RESIZE_MEDIA_SQL
    queries["frame_sample"] = multimodal.frame_sample_query
    oracles["frame_sample"] = multimodal.FRAME_SAMPLE_SQL
    return queries, oracles
