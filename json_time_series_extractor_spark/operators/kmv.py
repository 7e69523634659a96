"""KMV (k-minimum-values) distinct sketch tier with set algebra.

The sketch per (series, bucket) is the k smallest DISTINCT 60-bit item
hashes. What it buys over the HLL tier (``operators/hll.py``):

- **Exact mergeability with closure under union**: the k smallest of a
  union equal the k smallest of the concatenated sketches, so a tier
  cascade (1h → 1d) reproduces the sketch built directly from raw —
  bit-for-bit, not just in expectation.
- **Set operations**: from two sketches alone, estimates of |A ∪ B|,
  Jaccard(A, B) = |K_k(A∪B) ∩ A ∩ B| / |K_k(A∪B)|, and therefore
  |A ∩ B| — the primitives behind audience-overlap / user-retention
  queries that HLL cannot answer without inclusion-exclusion noise.
- **Exact-below-k**: a sketch smaller than k IS the distinct hash set,
  so small groups report exact counts.

Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD 2007): with u = kth smallest hash
normalized to (0, 1], NDV ≈ (k-1) / u; below k the sketch size is the
exact count.

Hashing: 60-bit truncation of md5 (first 15 hex digits) — uniform,
engine-reproducible (DuckDB: ``CAST(concat('0x', substr(md5(x), 1, 15))
AS BIGINT)``), and small enough that every value, and every estimator
intermediate, is an exact BIGINT/double in both engines. An xxhash64
variant is deliberately NOT offered here: KMV correctness depends on
order statistics of the hash, and mixing differently-ordered hash
domains across tiers would silently break merge closure.

Scale shape: distinct-hash reduction is a hash aggregate on (series,
bucket, h) — map-side combinable, the same first-shuffle profile as
HLL register building. Min-k selection is a row_number window per
(series, bucket) over the DISTINCT hashes — partition sizes are
per-bucket NDV (the quantity being sketched), with no per-group array
materialization before the final k-bounded collect. Set-ops join on
the tier keys with k-bounded arrays (k ≤ a few hundred), so the
pairwise membership scan is O(k²) per row — constant, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Hash domain size: hashes are uniform in [0, 2**60).
HASH_SPACE = float(2 ** 60)


def kmv_hash60(col: Column) -> Column:
    """60-bit uniform item hash (top 15 hex digits of md5), exact in a
    signed BIGINT and reproducible in DuckDB."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("long")


def _min_k(hashed: DataFrame, k: int) -> DataFrame:
    """(series_key, bucket_ts, _h) -> (series_key, bucket_ts, kmv):
    distinct hashes, keep the k smallest, pack sorted ascending."""
    dedup = (hashed.where(F.col("_h").isNotNull())
             .groupBy("series_key", "bucket_ts", "_h")
             .agg(F.lit(1)))
    w = (Window.partitionBy("series_key", "bucket_ts")
         .orderBy(F.col("_h").asc()))
    return (dedup.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .groupBy("series_key", "bucket_ts")
            .agg(F.sort_array(F.collect_list("_h")).alias("kmv")))


def kmv_rollup(samples: DataFrame, tier: str = "1 hour", k: int = 128,
               *, key_col: str = "series_key", ts_col: str = "ts",
               item_col: str = "user_id") -> DataFrame:
    """KMV sketch of distinct ``item_col`` per (series, tier bucket).

    Output: (series_key, bucket_ts, kmv array<long> ascending)."""
    from json_time_series_extractor_spark.operators.rollup import _bucket

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = (samples
              .where(F.col(item_col).isNotNull())
              .select(F.col(key_col).alias("series_key"),
                      _bucket(ts_col, tier).alias("bucket_ts"),
                      kmv_hash60(F.col(item_col)).alias("_h")))
    return _min_k(hashed, k)


def kmv_cascade(child: DataFrame, tier: str, k: int) -> DataFrame:
    """Merge a finer KMV tier into a coarser one. EXACT: the k smallest
    distinct hashes of a day are each among their hour's k smallest, so
    re-selecting min-k over the exploded child sketches reproduces the
    from-raw day sketch bit-for-bit (the closure property HLL register
    maxima share but quantile sketches do not)."""
    from json_time_series_extractor_spark.operators.rollup import _bucket

    exploded = child.select(
        "series_key", _bucket("bucket_ts", tier).alias("bucket_ts"),
        F.explode("kmv").alias("_h"))
    return _min_k(exploded, k)


def kmv_estimate(kmv: Column, k: int) -> Column:
    """NDV estimate from a sketch array: exact size below k, else
    (k-1) / (kth_hash / 2^60). Two float ops — one division pair —
    so the value is engine-deterministic."""
    kth = F.element_at(kmv, k)
    return (F.when(F.size(kmv) < k, F.size(kmv).cast("double"))
            .otherwise(F.lit(float(k - 1))
                       / (kth.cast("double") / F.lit(HASH_SPACE))))


def kmv_set_ops(a: DataFrame, b: DataFrame, k: int, *,
                on=("series_key", "bucket_ts"),
                suffixes=("_a", "_b")) -> DataFrame:
    """Join two sketch tiers on ``on`` and estimate set algebra per row:

    - ``union_est``   — NDV of A ∪ B (KMV estimator over the merged
      sketch, which is itself a valid KMV sketch of the union),
    - ``jaccard_est`` — fraction of the union sketch's hashes present
      in BOTH input sketches (unbiased Jaccard estimator),
    - ``inter_est``   — jaccard_est × union_est,
    - ``m_both`` / ``k_union`` — the integer evidence behind jaccard.

    Inputs are the (series_key, bucket_ts, kmv) shape of
    :func:`kmv_rollup`; rows without a partner are dropped (inner join
    — a missing side has no sketch to compare)."""
    sa, sb = suffixes
    ka, kb = f"kmv{sa}", f"kmv{sb}"
    j = (a.withColumnRenamed("kmv", ka)
         .join(b.withColumnRenamed("kmv", kb), list(on), "inner"))
    union_kmv = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col(ka), F.col(kb)))),
        1, k)
    j = j.withColumn("_u", union_kmv)
    in_both = F.filter(
        F.col("_u"),
        lambda h: F.array_contains(F.col(ka), h)
        & F.array_contains(F.col(kb), h))
    j = (j.withColumn("m_both", F.size(in_both))
         .withColumn("k_union", F.size("_u")))
    union_est = kmv_estimate(F.col("_u"), k)
    jac = F.col("m_both").cast("double") / F.col("k_union")
    return (j.withColumn("union_est", union_est)
            .withColumn("jaccard_est", jac)
            .withColumn("inter_est", jac * F.col("union_est"))
            .drop("_u"))


def kmv_oracle_sql(table: str, *, unit: str = "hour",
                   series_expr: str = "event_type", ts_col: str = "ts",
                   item_expr: str = "user_id", k: int = 128) -> str:
    """DuckDB replay of :func:`kmv_rollup` at one tier: distinct 60-bit
    md5 hashes, row_number min-k, sketch packed as a sorted list (the
    compare unpacks client-side)."""
    return f"""
WITH h AS (
    SELECT DISTINCT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           CAST(concat('0x', substr(md5(CAST({item_expr} AS VARCHAR)),
                                    1, 15)) AS BIGINT) AS h
    FROM {table} WHERE {item_expr} IS NOT NULL),
r AS (
    SELECT series_key, bucket_ts, h,
           row_number() OVER (PARTITION BY series_key, bucket_ts
                              ORDER BY h) AS rn
    FROM h)
SELECT series_key, bucket_ts, list_sort(list(h)) AS kmv
FROM r WHERE rn <= {k}
GROUP BY 1, 2
"""
