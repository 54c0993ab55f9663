"""Data-layout operators: multi-dimension clustering keys and skew
diagnostics — the file-organization tools a 100 TB corpus needs before
any query runs.

``zorder_key`` is the Morton (Z-order) interleave used by Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order z-ordering: writing files
range-partitioned + sorted by the interleaved key keeps row-group min/max
ranges tight on EVERY participating dimension at once, so a predicate on
either column prunes files (a single-column sort only prunes its own
column; the other dimension spans the full domain in every file). The
key is pure JVM bit arithmetic — 32 shift/mask terms, whole-stage
codegen, no UDF — and ``tests/test_scale_layout.py`` proves the pruning
claim from real parquet footer statistics.

``partition_skew_report`` is the diagnosis half of the skew toolkit whose
mitigation half already exists (``salted_skew_join``): per-key cardinality
vs the median key, emitting the salt factor a salted repartition would
need. At cluster scale this runs over a cheap count-aggregate (one
map-side-combined shuffle on the key), never over the payload.

Reference analog: the reference engine has no layout layer at all (it
writes one file per page, `/root/reference/src/extract_ocr/crawl.py`
export paths); these operators exist because the Spark engine targets
parquet/Iceberg table layouts where file-level statistics are the first
line of scan pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BITS = 16  # 16 bits per dimension -> 32-bit Morton key


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def morton32(x, y):
    """Interleave the low 16 bits of two long columns into one 32-bit
    Z-order key: bit i of x lands at position 2i, bit i of y at 2i+1.
    The terms write disjoint bits, so plain addition assembles the key
    (stays inside whole-stage codegen; bitwiseOR would too, but `+`
    folds into a single Add tree)."""
    terms = []
    for i in range(_BITS):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    key = terms[0]
    for t in terms[1:]:
        key = key + t
    return key


def _morton32_sql(x: str, y: str) -> str:
    """The byte-identical DuckDB expression (same shifts, same adds)."""
    parts = []
    for i in range(_BITS):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(parts)


def zorder_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over events (user_id × event_id), the key a
    layout-optimizing rewrite sorts by before writing."""
    ev = _t(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(65535)).cast("long")
    y = F.col("event_id").bitwiseAND(F.lit(65535)).cast("long")
    return (
        ev.select("event_id", "user_id", morton32(x, y).alias("zkey"))
        .orderBy("event_id")
    )


ZORDER_KEY_SQL = f"""
SELECT event_id, user_id,
       {_morton32_sql('(user_id & 65535)', '(event_id & 65535)')} AS zkey
FROM events ORDER BY event_id
"""


def zorder_write(df: DataFrame, cols: tuple[str, str], path: str,
                 n_files: int) -> None:
    """OPTIMIZE ZORDER BY as a composition: compute the Morton key over
    the two clustering columns, range-partition + sort by it, drop the
    key, write. Each output file then covers one contiguous Z-range —
    a small axis-aligned rectangle-ish region of the (x, y) domain — so
    parquet min/max footer stats prune on BOTH columns."""
    x = F.col(cols[0]).bitwiseAND(F.lit(65535)).cast("long")
    y = F.col(cols[1]).bitwiseAND(F.lit(65535)).cast("long")
    (df.withColumn("_zkey", morton32(x, y))
       .repartitionByRange(n_files, "_zkey")
       .sortWithinPartitions("_zkey")
       .drop("_zkey")
       .write.mode("overwrite").parquet(path))


def partition_skew_report_query(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-key skew diagnosis over events.user_id: each key's row count,
    its ratio to the median key, and the salt factor a salted
    repartition/join would need to level it. The aggregate shuffles only
    (key, count) pairs; the single-row median frame is broadcast."""
    ev = _t(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    med = cnt.agg(
        (F.percentile(F.col("cnt"), F.lit(0.5)) * 2)
        .cast("long").alias("med2"))
    return (
        cnt.join(F.broadcast(med))
        .select(
            "user_id", "cnt",
            F.round(F.col("cnt") * 2 / F.col("med2"), 4)
            .alias("skew_ratio"),
            F.ceil(F.col("cnt") * 2 / F.col("med2")).cast("long")
            .alias("salt_factor"),
        )
        .orderBy("user_id")
    )


# med2 = 2 * median is always integral (linear interpolation between two
# integers lands on .0/.5), so both engines divide the same exact longs
# and the float results are bit-identical before round/ceil.
PARTITION_SKEW_REPORT_SQL = """
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
m AS (SELECT CAST(quantile_cont(cnt, 0.5) * 2 AS BIGINT) AS med2 FROM c)
SELECT user_id, cnt,
       round(cnt * 2 / med2, 4) AS skew_ratio,
       CAST(ceil(cnt * 2 / med2) AS BIGINT) AS salt_factor
FROM c, m ORDER BY user_id
"""


_HILBERT_BITS = 8  # 256 x 256 grid -> 16-bit Hilbert index


def hilbert_select(df: DataFrame, x, y, out: str = "hkey") -> DataFrame:
    """Hilbert curve index (xy2d) over two pre-masked 8-bit columns —
    Z-order's better-locality sibling (no quadrant-boundary jumps, so
    file regions are more compact for the same file count). The
    classic reflect-rotate recurrence is unrolled into one narrow
    ``select`` per bit level, each referencing the PREVIOUS level's
    columns by name, so the expression tree stays linear in the bit
    count (inlining the recurrence naively triples the tree per level).
    All integer CASE/shift arithmetic — whole-stage codegen, no UDF."""
    df = df.select("*", x.alias("_hx"), y.alias("_hy"),
                   F.lit(0).cast("long").alias("_hd"))
    for lvl in range(_HILBERT_BITS - 1, -1, -1):
        s = 1 << lvl
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0,
                    F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0,
                    F.lit(1)).otherwise(F.lit(0))
        d = (F.col("_hd")
             + F.lit(s * s).cast("long")
             * (rx * 3).bitwiseXOR(ry).cast("long"))
        # reflect when (rx, ry) == (1, 0), then swap x/y when ry == 0
        xr = F.when((rx == 1) & (ry == 0),
                    F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        yr = F.when((rx == 1) & (ry == 0),
                    F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        keep = [c for c in df.columns if c not in ("_hx", "_hy", "_hd")]
        df = df.select(
            *keep,
            F.when(ry == 0, yr).otherwise(F.col("_hx")).alias("_hx"),
            F.when(ry == 0, xr).otherwise(F.col("_hy")).alias("_hy"),
            d.alias("_hd"))
    return df.withColumnRenamed("_hd", out).drop("_hx", "_hy")


def _hilbert_sql(x: str, y: str, src: str) -> str:
    """The identical recurrence as a chain of CTEs (one per bit level),
    appended after ``src`` (a CTE exposing columns hx, hy plus payload)."""
    parts = [f"h{_HILBERT_BITS} AS (SELECT *, CAST(0 AS BIGINT) AS hd,"
             f" {x} AS hx, {y} AS hy FROM {src})"]
    for lvl in range(_HILBERT_BITS - 1, -1, -1):
        s = 1 << lvl
        prev, cur = f"h{lvl + 1}", f"h{lvl}"
        # every reference is p.-qualified so DuckDB's lateral column
        # aliasing can never capture a sibling alias defined earlier in
        # the same SELECT list
        parts.append(f"""{cur} AS (
  SELECT p.* EXCLUDE (hd, hx, hy),
    p.hd + {s * s} * xor(
        3 * (CASE WHEN (p.hx & {s}) > 0 THEN 1 ELSE 0 END),
        (CASE WHEN (p.hy & {s}) > 0 THEN 1 ELSE 0 END)) AS hd,
    CASE WHEN (p.hy & {s}) = 0 THEN
      CASE WHEN (p.hx & {s}) > 0 THEN {s - 1} - p.hy ELSE p.hy END
    ELSE p.hx END AS hx,
    CASE WHEN (p.hy & {s}) = 0 THEN
      CASE WHEN (p.hx & {s}) > 0 THEN {s - 1} - p.hx ELSE p.hx END
    ELSE p.hy END AS hy
  FROM {prev} p)""")
    return ",\n".join(parts)


def hilbert_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        hilbert_select(
            ev.select("event_id", "user_id"),
            F.col("user_id").bitwiseAND(F.lit(255)).cast("long"),
            F.col("event_id").bitwiseAND(F.lit(255)).cast("long"))
        .select("event_id", "user_id", "hkey")
        .orderBy("event_id")
    )


HILBERT_KEY_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, user_id & 255 AS bx, event_id & 255 AS by_
  FROM events
),
{_hilbert_sql('bx', 'by_', 'base')}
SELECT event_id, user_id, hd AS hkey FROM h0 ORDER BY event_id
"""


def hilbert_write(df: DataFrame, cols: tuple[str, str], path: str,
                  n_files: int) -> None:
    """``zorder_write``'s Hilbert twin: cluster files along the Hilbert
    curve instead of the Z curve."""
    keyed = hilbert_select(
        df,
        F.col(cols[0]).bitwiseAND(F.lit(255)).cast("long"),
        F.col(cols[1]).bitwiseAND(F.lit(255)).cast("long"),
        out="_hkey")
    (keyed.repartitionByRange(n_files, "_hkey")
     .sortWithinPartitions("_hkey")
     .drop("_hkey")
     .write.mode("overwrite").parquet(path))


QUERIES = {
    "zorder_key": zorder_key_query,
    "hilbert_key": hilbert_key_query,
    "partition_skew_report": partition_skew_report_query,
}
ORACLES = {
    "zorder_key": ZORDER_KEY_SQL,
    "hilbert_key": HILBERT_KEY_SQL,
    "partition_skew_report": PARTITION_SKEW_REPORT_SQL,
}
