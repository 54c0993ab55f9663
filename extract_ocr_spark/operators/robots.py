"""Robots-gate operator (P4 + J5 + O5): per-host rules broadcast-joined to
URLs, Allow-first matching (any matching Allow permits, regardless of
prefix length; else any matching Disallow blocks; else allowed).
Reference robots.py ``RobotsRules.can_fetch`` + crawl.py:691-709.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RULES = [
    # (host, rule, prefix)
    ("example.gov", "disallow", "/private"),
    ("example.gov", "allow", "/private/ok"),
    ("example.gov", "disallow", "/tmp"),
    ("docs.example.gov", "disallow", "/draft"),
    # Allow shorter than a matching Disallow: the reference still allows
    # (Allow-first), unlike RFC 9309 longest-match.
    ("docs.example.gov", "allow", "/d"),
]

PATHS = ["/private/x", "/private/ok/y", "/pub/z", "/tmp/q", "/draft/d"]
HOSTS = ["example.gov", "docs.example.gov", "open.example.gov"]


def robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.element_at(
        F.array(*[F.lit(h) for h in HOSTS]), (F.col("doc_id") % 3 + 1).cast("int"))
    path = F.element_at(
        F.array(*[F.lit(p) for p in PATHS]), (F.col("doc_id") % 5 + 1).cast("int"))
    urls = docs.select("doc_id", host.alias("host"), path.alias("path"))

    rules = spark.createDataFrame(RULES, "host string, rule string, prefix string")
    matched = urls.join(
        F.broadcast(rules),
        (urls.host == rules.host) & urls.path.startswith(rules.prefix),
        "left",
    ).drop(rules.host)
    # Allow-first (reference checks every Allow before any Disallow);
    # length desc within a rule kind for determinism only.
    w = Window.partitionBy("doc_id").orderBy(
        F.when(F.col("rule") == "allow", 0).otherwise(1),
        F.length("prefix").desc_nulls_last())
    decided = (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("allowed",
                    F.coalesce(F.col("rule") == "allow", F.lit(True)))
    )
    return decided.select("doc_id", "host", "path", "allowed").orderBy("doc_id")


ROBOTS_GATE_SQL = """
WITH u AS (
  SELECT doc_id,
         ['example.gov', 'docs.example.gov', 'open.example.gov'][(doc_id % 3) + 1] AS host,
         ['/private/x', '/private/ok/y', '/pub/z', '/tmp/q', '/draft/d'][(doc_id % 5) + 1] AS path
  FROM documents
), rules(host, rule, prefix) AS (
  VALUES ('example.gov', 'disallow', '/private'),
         ('example.gov', 'allow', '/private/ok'),
         ('example.gov', 'disallow', '/tmp'),
         ('docs.example.gov', 'disallow', '/draft'),
         ('docs.example.gov', 'allow', '/d')
), matched AS (
  SELECT u.doc_id, u.host, u.path, r.rule, r.prefix
  FROM u LEFT JOIN rules r
    ON u.host = r.host AND u.path LIKE r.prefix || '%'
), decided AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id
    ORDER BY CASE WHEN rule = 'allow' THEN 0 ELSE 1 END,
             length(prefix) DESC NULLS LAST) AS rn
  FROM matched
)
SELECT doc_id, host, path,
       coalesce(rule = 'allow', TRUE) AS allowed
FROM decided WHERE rn = 1 ORDER BY doc_id
"""

QUERIES = {"robots_gate": robots_gate}
ORACLES = {"robots_gate": ROBOTS_GATE_SQL}
