"""Deterministic corpus sampling for training-data pipelines.

Downsampling a 100 TB corpus must be (a) reproducible run-to-run and
across cluster sizes, (b) partition-layout-independent, and (c) cheap.
``df.sample()`` is none of these (it seeds per partition, so a
repartition changes the sample). These operators derive the sampling
decision from a HASH of a stable key instead:

- :func:`deterministic_sample` — Bernoulli(fraction) per row, keyed:
  rank(key, seed) < fraction. Map-only, no shuffle, no state; the same
  row is in or out regardless of partitioning, executor count, or run.
- :func:`sample_per_group` — a seeded uniform n-per-group sample
  (per-language / per-domain caps): rows ranked inside each group by the
  key hash, ``n`` smallest kept. One shuffle on the group columns with
  bounded window partitions (group sizes bound the task, same analysis
  as every per-series window here).

The rank hash is the high 32 bits of md5(key || ':' || seed) — md5, not
xxhash64, so a DuckDB oracle recomputes the EXACT sample (the same
trade the SimHash oracle makes; see ``dedup._token_hash64``). At 100 TB
the md5-vs-xxhash64 delta is noise next to the scan; a fleet that cares
can swap ``hash_fn`` the same way simhash does.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_rank(key: Column, seed: int = 7) -> Column:
    """Deterministic uniform rank in [0, 1): high-32-of-md5 of
    ``key:seed`` scaled by 2^-32. Pure expression, SQL-reproducible."""
    hx = F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))
    return (F.conv(F.substring(hx, 1, 8), 16, 10).cast("double")
            / F.lit(4294967296.0))


def deterministic_sample(df: DataFrame, fraction: float, *,
                         key_col: str = "doc_id",
                         seed: int = 7) -> DataFrame:
    """Keyed Bernoulli sample: keep rows with rank(key, seed) < fraction.

    Reproducible and partition-agnostic (unlike ``df.sample``); sampling
    the same keys with the same seed in ANY job selects the same rows,
    so derived tables stay aligned (e.g. sample documents and their
    embeddings by the shared id)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_rank(F.col(key_col), seed) < F.lit(fraction))


def sample_per_group(df: DataFrame, group_cols: Sequence[str], n: int, *,
                     key_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """Seeded uniform sample of ``n`` rows per group (stratified cap).

    Rank = (hash_rank(key, seed), key) — the key tie-break makes the
    order total, so the selected set is exactly reproducible. The window
    partitions on the group columns; group size bounds the task."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = (Window.partitionBy(*group_cols)
         .orderBy(hash_rank(F.col(key_col), seed), F.col(key_col)))
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n)
            .drop("_rn"))
