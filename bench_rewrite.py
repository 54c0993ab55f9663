#!/usr/bin/env python
"""Corpus-scale markdown-link-rewrite benchmark (E13/J3 at scale): the
broadcast-map variant vs the explode/equi-join variant over a generated
100k-page / 1M-link corpus with a 1M-row url→path map (both variants run
— the map sits under the 2M-row broadcast guard), then a join-only point
with a 3M-row map, PAST the guard, where the broadcast variant refuses
by design and the join path keeps working.

Prints ONE JSON line mirroring bench.py's format; timing discipline is
shared with bench.py (min-of-3, per-run [wall, steal, foreign_busy,
idle_ok] tuples, clean = steal < 0.5% AND foreign busy < 2%).

Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REWRITE_PAGES
(default 100000).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BUSY_CLEAN, timed  # noqa: E402
from bench_scaling import STEAL_CLEAN  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_REWRITE_PAGES", "100000"))
LINKS_PER_PAGE = 10


def gen_rewrite_corpus(spark, n_pages: int, links_per_page: int,
                       map_mult: int = 10):
    """Deterministic synthetic rewrite corpus, generated natively (no
    driver data): ``n_pages`` markdown pages each carrying
    ``links_per_page`` absolute links into a url space of
    ``n_pages * map_mult`` mapped targets."""
    from pyspark.sql import functions as F

    m = n_pages * map_mult
    md = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(links_per_page)),
        lambda k: F.format_string(
            "see [l](https://corpus.example/p/%d.html)",
            (F.col("id") * 7 + k * 1327) % m),
    ))
    pages = spark.range(n_pages).select(
        F.col("id").alias("doc_id"),
        F.format_string("https://corpus.example/p/%d.html",
                        F.col("id")).alias("page_url"),
        md.alias("md"),
    )
    url_map = spark.range(m).select(
        F.format_string("https://corpus.example/p/%d.html",
                        F.col("id")).alias("url"),
        F.format_string("pages/%d.md", F.col("id")).alias("path"),
    )
    return pages, url_map


def main() -> None:
    from pyspark.sql import functions as F

    from extract_ocr_spark.operators.export import (
        rewrite_links_df,
        rewrite_links_join_df,
    )
    from extract_ocr_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="bench-rewrite",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    pages, url_map = gen_rewrite_corpus(spark, N_PAGES, LINKS_PER_PAGE)
    pages = pages.persist()
    url_map = url_map.persist()
    n_pages, n_map = pages.count(), url_map.count()

    def checksum(df):
        r = df.agg(F.sum(F.crc32(F.col("md_out"))).alias("crc"),
                   F.sum(F.length("md_out")).alias("len")).first()
        return (r["crc"], r["len"])

    sums: dict[str, tuple] = {}

    def run_broadcast() -> None:
        sums["broadcast"] = checksum(rewrite_links_df(pages, url_map))

    def run_join() -> None:
        sums["join"] = checksum(rewrite_links_join_df(pages, url_map))

    run_join()  # warm-up (Python worker pool, JIT)
    best_b, runs_b = timed(run_broadcast)
    best_j, runs_j = timed(run_join)
    parity = sums["broadcast"] == sums["join"]

    # past the broadcast guard: 3M-row map — broadcast refuses, join runs
    pages_big, map_big = gen_rewrite_corpus(spark, N_PAGES,
                                            LINKS_PER_PAGE, map_mult=30)
    # persist + materialize BOTH inputs so the timed runs measure the
    # rewrite, not corpus generation (the 1M-map runs read persisted pages)
    pages_big = pages_big.persist()
    pages_big.count()
    map_big = map_big.persist()
    n_map_big = map_big.count()
    guard_refused = False
    try:
        rewrite_links_df(pages_big, map_big)
    except ValueError:
        guard_refused = True

    def run_join_big() -> None:
        sums["join_big"] = checksum(rewrite_links_join_df(pages_big, map_big))

    best_jb, runs_jb = timed(run_join_big)

    print(json.dumps({
        "metric": "rewrite_corpus_wall_sec",
        "value": round(best_j, 3),
        "unit": "sec",
        "queries": {"rewrite_broadcast_1m_map": round(best_b, 3),
                    "rewrite_join_1m_map": round(best_j, 3),
                    "rewrite_join_3m_map": round(best_jb, 3)},
        "pages": n_pages,
        "links": n_pages * LINKS_PER_PAGE,
        "map_rows": n_map,
        "map_rows_big": n_map_big,
        "parity_broadcast_vs_join": parity,
        "broadcast_guard_refused_3m": guard_refused,
        "runs_sec_steal": {"rewrite_broadcast_1m_map": runs_b,
                           "rewrite_join_1m_map": runs_j,
                           "rewrite_join_3m_map": runs_jb},
        "steal_clean_threshold": STEAL_CLEAN,
        "busy_clean_threshold": BUSY_CLEAN,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
