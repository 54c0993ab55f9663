"""Similarity search over the embeddings table.

- ``ann_topk``: brute-force exact cosine top-k — the correctness baseline,
  fully native (zip_with/aggregate inside whole-stage codegen; the query
  vector is a literal broadcast into the plan, no driver loop).
- ``ann_topk_lsh``: random-hyperplane LSH bucketing — the scale path. At
  10^9+ vectors the brute force scans everything per query; LSH probes only
  the query's bucket (plus multiprobe neighbors). Buckets are computed
  natively from literal hyperplanes (seeded, deterministic).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_K = 10
QUERY_VEC_ID = 0
_N_PLANES = 8
_DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")


def _cosine_to_lit(emb_col, qvec: list[float]):
    q = F.array(*[F.lit(float(v)) for v in qvec])
    dot = F.aggregate(F.zip_with(emb_col, q, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    ne = F.sqrt(F.aggregate(F.transform(emb_col, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nq = float(np.sqrt(np.dot(qvec, qvec)))
    return dot / (ne * F.lit(nq))


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _emb(spark, sf_dir).filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("emb").first()
    )
    return list(row["emb"])


def ann_topk(spark, sf_dir):
    """Exact cosine top-10 neighbors of vec_id=0 (excluded)."""
    qvec = _query_vector(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    c = _cosine_to_lit(F.col("emb"), qvec)
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", F.round(c, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


ANN_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb FROM e WHERE vec_id = {QUERY_VEC_ID})
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(e.emb, q.emb), 6) AS cosine
FROM e, q WHERE e.vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, e.vec_id
LIMIT {TOP_K}
"""


def _hyperplanes(seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(_N_PLANES, _DIM)


def _bucket_expr(emb_col):
    """Native LSH bucket id: sign bits of dot products with literal
    hyperplanes, packed into an int."""
    planes = _hyperplanes()
    bits = []
    for p in range(_N_PLANES):
        plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        dot = F.aggregate(F.zip_with(emb_col, plane, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_topk_lsh(spark, sf_dir):
    """Approximate top-10: probe only vectors in the query's LSH bucket or
    any bucket within Hamming distance 1 (multiprobe), then exact-rank the
    bucket. At 100 TB this turns a full scan into a partition-pruned probe
    (bucket as a partition column of the vectors table)."""
    qvec = _query_vector(spark, sf_dir)
    planes = _hyperplanes()
    qbits = sum((1 << p) for p in range(_N_PLANES)
                if float(np.dot(planes[p], qvec)) > 0)
    probe = [qbits] + [qbits ^ (1 << p) for p in range(_N_PLANES)]
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket_expr(F.col("emb")))
    c = _cosine_to_lit(F.col("emb"), qvec)
    return (
        emb.filter(F.col("bucket").isin(probe))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", F.round(c, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


QUERIES = {
    "ann_topk": ann_topk,
    "ann_topk_lsh": ann_topk_lsh,
}

ORACLES = {
    "ann_topk": ANN_TOPK_SQL,
}


def embedding_neardup_lsh(spark, sf_dir):
    """Scale path for embedding near-dup: candidate pairs share an LSH
    bucket (8 hyperplanes) or differ in exactly one bit (multiprobe band),
    verified exactly by cosine ≥ 0.4. At 10^9 vectors this joins within
    buckets instead of the O(n²) pair space. Approximate (rows-only check;
    the exact twin ``embedding_neardup_pairs`` is the oracle-checked one)."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket_expr(F.col("emb")))
    # multiprobe: each vector lands in its bucket plus the 8 single-bit
    # neighbors → any pair within Hamming distance 1 collides.
    probes = F.array(
        F.col("bucket"), *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(_N_PLANES)
        ])
    banded = emb.select("vec_id", "emb", F.explode(probes).alias("b"))
    a = banded.alias("a")
    b = banded.alias("b")
    c = _pair_cosine(F.col("a.emb"), F.col("b.emb"))
    return (
        a.join(b, (F.col("a.b") == F.col("b.b"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("a_id"),
                F.col("b.vec_id").alias("b_id"), c.alias("cosine"))
        .dropDuplicates(["a_id", "b_id"])
        .filter(F.col("cosine") >= 0.4)
        .select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("a_id", "b_id")
    )


def _pair_cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def ann_topk_ivf(spark, sf_dir):
    """IVF-style ANN: coarse-quantize vectors to the nearest of 16 seeded
    random centroids (a stand-in for trained k-means — deterministic, no
    training dependency), probe the query's 2 nearest cells, exact-rank
    within them. The cell id becomes a partition column at scale.
    Approximate → rows-only check."""
    rng = np.random.RandomState(11)
    cents = rng.randn(16, _DIM)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    def cell_expr(emb_col):
        # Linear expression: 16 dot products into one array, argmax via
        # array_position(max). (A chained when/otherwise would nest the
        # running best twice per step → exponential plan size.)
        dots = F.array(*[
            F.aggregate(
                F.zip_with(emb_col,
                           F.array(*[F.lit(float(v)) for v in cents[i]]),
                           lambda x, y: x * y),
                F.lit(0.0), lambda acc, v: acc + v)
            for i in range(16)
        ])
        return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")

    qvec = _query_vector(spark, sf_dir)
    qsims = cents @ np.asarray(qvec)
    probe_cells = [int(i) for i in np.argsort(-qsims)[:2]]

    emb = _emb(spark, sf_dir).withColumn("cell", cell_expr(F.col("emb")))
    c = _cosine_to_lit(F.col("emb"), qvec)
    return (
        emb.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", F.round(c, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


QUERIES["embedding_neardup_lsh"] = embedding_neardup_lsh
QUERIES["ann_topk_ivf"] = ann_topk_ivf
