"""Bloom-filter membership tier — mergeable, oracle-checkable.

Fifth member of the mergeable-sketch family (SURVEY.md §2.4):
histogram = distribution, t-digest = quantiles, HLL = distinct count,
Count-Min = frequency, Bloom = MEMBERSHIP. Per tumbling window and
series, a k-hash / m-bit filter (Bloom, "Space/time trade-offs in hash
coding with allowable errors", CACM 1970) answers "was key x seen?"
with NO false negatives and a false-positive probability of about
(1 - e^(-k*n/m))^k. Registers are the SET of set bit positions and
merge by UNION (distinct — associative, commutative, idempotent), so
tiers cascade raw -> 1m -> 1h -> 1d on sketch rows only, the exact
contract of every other tier here.

The corpus-scale use is the incremental-dedup prefilter: a Bloom tier
built over a reference corpus's fingerprints is a few MB per window —
broadcastable — and :func:`bloom_probe` prunes the new-batch side to
the rows that MIGHT be duplicates before the exact banded join in
``dedup.dedup_incremental`` runs. No false negatives means the
prefilter can never drop a true duplicate.

Oracle verifiability (house rule): bit positions are the low log2(m)
bits of md5hi64("<j>|<key>") — the SAME construction as the Count-Min
row hashes, so one oracle recipe family covers both — and register
rows are DISTINCT integer tuples. The whole bit matrix and every probe
verdict is exactly recomputable in SQL; the sketch is deterministic,
so even the false positives are value-stable and visible in the oracle
rows.

Scale: one shuffle per tier on (series, bucket, bit) with map-side
partial dedup (hot keys collapse before the exchange); a group
materializes at most min(k * distinct_keys, m) register rows. Pure
Column expressions end to end — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from json_time_series_extractor_spark.operators.cmsketch import _cm_bucket
from json_time_series_extractor_spark.operators.rollup import _bucket

BLOOM_REGISTER_SCHEMA = ("series_key string, bucket_ts timestamp, "
                         "bit int")


def _check_params(k: int, m: int) -> None:
    if not 1 <= k <= 8:
        raise ValueError(f"k must be 1..8, got {k}")
    if m < 64 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 64, got {m}")


def _bits_array(key_col: str, k: int, m: int) -> Column:
    """The k bit positions of `key_col` as ONE parsed SQL array
    (r8 — the dot_flat_sql pattern; see cmsketch._cm_bucket_sql): the
    identical md5hi64-and-mask recipe per bit, ~15x fewer py4j round
    trips per plan build. Value-equality is test-asserted against
    :func:`_bloom_bit`."""
    from json_time_series_extractor_spark.operators.cmsketch import (
        _cm_bucket_sql)

    qk = f"`{key_col}`"
    return F.expr("array(" + ",".join(
        _cm_bucket_sql(qk, j, m) for j in range(k)) + ")")


def _bloom_bit(key: Column, j: int, m: int) -> Column:
    """Bit position of hash j for *key* — md5hi64("<j>|<key>") masked
    to the power-of-two filter size, the Count-Min bucket construction
    verbatim (``cmsketch._cm_bucket``) so the two sketches share one
    oracle hash recipe."""
    return _cm_bucket(key, j, m)


def _stamp_params(bit: Column, k: int, m: int) -> Column:
    """Tag the bit column with the build parameters so
    :func:`bloom_probe` can reject a mismatched probe (wrong k or m
    silently turns "no false negatives" into arbitrary misses)."""
    return bit.alias("bit", metadata={"bloom_k": k, "bloom_m": m})


def _read_params(registers: DataFrame) -> tuple:
    md = registers.schema["bit"].metadata if "bit" in registers.columns \
        else {}
    return md.get("bloom_k"), md.get("bloom_m")


def bloom_rollup(df: DataFrame, tier: str, *, key_col: str,
                 series_col: str = "series_key", ts_col: str = "ts",
                 k: int = 4, m: int = 1 << 16) -> DataFrame:
    """(series, ts, key) rows -> Bloom bit rows per tumbling window:
    (series_key, bucket_ts, bit), distinct. Absent bits are implicitly
    zero, so state stays sparse when a window sees few keys.

    NULL keys are dropped (a NULL is not a member), matching the other
    sketch tiers. The (k, m) build parameters are stamped as column
    metadata on ``bit``.
    """
    _check_params(k, m)
    key = F.col(key_col)
    bits = _bits_array(key_col, k, m)
    out = (df.where(key.isNotNull())
           .select(F.col(series_col).alias("series_key"),
                   _bucket(ts_col, tier).alias("bucket_ts"),
                   F.explode(bits).alias("bit"))
           .distinct())
    return out.withColumn("bit", _stamp_params(F.col("bit"), k, m))


def bloom_cascade(registers: DataFrame, tier: str) -> DataFrame:
    """Merge a finer tier's bit rows into a coarser tumbling window.
    UNION (distinct) is associative/commutative/idempotent, so any
    cascade chain equals a direct build — the same contract and test
    strategy as every other tier. Propagates the parameter stamp."""
    k, m = _read_params(registers)
    merged = (registers
              .select("series_key",
                      _bucket("bucket_ts", tier).alias("bucket_ts"),
                      "bit")
              .distinct())
    if k is not None:
        merged = merged.withColumn(
            "bit", _stamp_params(F.col("bit"), k, m))
    return merged


def bloom_probe(registers: DataFrame, keys: DataFrame, *,
                key_col: str = "key", k: int = 4,
                m: int = 1 << 16) -> DataFrame:
    """Membership probe: for each row of *keys* (series_key, bucket_ts,
    key, ...), ``maybe_present`` is true iff ALL k bit positions are
    set in that window's filter. One-sided: a key the window saw is
    always flagged (no false negatives); an unseen key is flagged with
    probability ~(1 - e^(-k*n/m))^k.

    If *registers* carries the (k, m) metadata stamp written by
    :func:`bloom_rollup`, mismatched probe parameters raise.

    Plan shape: explode k probe coordinates, LEFT equi-join the bit
    rows on (series, bucket, bit), then one hash aggregate counting
    hits per key row — broadcastable register side when the filter is
    small, skew-immune keys (bit space), no crossing of raw data.
    """
    _check_params(k, m)
    bk, bm = _read_params(registers)
    if bk is not None and (bk, bm) != (k, m):
        raise ValueError(
            f"probe parameters (k={k}, m={m}) do not match the "
            f"registers' build parameters (k={bk}, m={bm})")
    key = F.col(key_col)
    bits = _bits_array(key_col, k, m)
    probes = (keys
              .withColumn("_pb", F.explode(bits)))
    regs = registers.select("series_key", "bucket_ts",
                            F.col("bit").alias("_pb"),
                            F.lit(1).alias("_hit"))
    joined = probes.join(regs, ["series_key", "bucket_ts", "_pb"],
                         "left")
    group_cols = [c for c in keys.columns]
    return (joined
            .groupBy(*group_cols)
            .agg((F.count("_hit") == k).alias("maybe_present")))


def bloom_prefilter(new_df: DataFrame, registers: DataFrame, *,
                    key_col: str, k: int = 4,
                    m: int = 1 << 16) -> DataFrame:
    """Incremental-dedup prefilter: keep only the rows of *new_df*
    whose ``key_col`` MIGHT be in the reference filter (the window
    dimension collapsed — registers from any tier, distinct bits).

    No false negatives: every true duplicate survives the prefilter,
    so a downstream exact join sees a superset of the real matches and
    the final result is unchanged while the join's probe side shrinks
    by ~the non-duplicate fraction. Row multiplicity is preserved (the
    verdict is computed per DISTINCT key, then applied with a
    left-semi join); NULL-keyed rows are dropped — they cannot be
    duplicates, matching the other dedup operators."""
    _check_params(k, m)
    bk, bm = _read_params(registers)
    if bk is not None and (bk, bm) != (k, m):
        raise ValueError(
            f"prefilter parameters (k={k}, m={m}) do not match the "
            f"registers' build parameters (k={bk}, m={bm})")
    key = F.col(key_col)
    bits = _bits_array(key_col, k, m)
    flat = registers.select(F.col("bit").alias("_pb")).distinct()
    candidates = (new_df
                  .where(key.isNotNull())
                  .select(key_col).distinct()
                  .withColumn("_pb", F.explode(bits))
                  .join(flat, "_pb")
                  .groupBy(key_col)
                  .agg(F.count(F.lit(1)).alias("_hits"))
                  .where(F.col("_hits") == k)
                  .select(key_col))
    return new_df.join(candidates, key_col, "left_semi")


def _bloom_probes_sql(table: str, *, key_expr: str, series_expr: str,
                      ts_col: str, unit: str, k: int, m: int) -> str:
    """Shared DuckDB probe-row CTE body: every input row exploded into
    its k bit positions via the same md5hi hashes and power-of-two
    masking as the Spark expressions (the Count-Min recipe)."""
    hu = (f"CAST(CAST(concat('0x', substr(md5(CAST({{j}} AS VARCHAR) "
          f"|| '|' || {key_expr}), 1, 8)) AS BIGINT) AS HUGEINT) "
          f"* 4294967296 "
          f"+ CAST(concat('0x', substr(md5(CAST({{j}} AS VARCHAR) "
          f"|| '|' || {key_expr}), 9, 8)) AS BIGINT)")
    return "\nUNION ALL\n".join(
        f"SELECT {series_expr} AS series_key, "
        f"date_trunc('{unit}', {ts_col}) AS bucket_ts, "
        f"{key_expr} AS key, "
        f"CAST(({hu.format(j=j)}) % {m} AS INT) AS bit "
        f"FROM {table} WHERE {key_expr} IS NOT NULL"
        for j in range(k))


def bloom_registers_oracle_sql(table: str, *, key_expr: str,
                               series_expr: str, ts_col: str = "ts",
                               unit: str = "hour", k: int = 4,
                               m: int = 1 << 16) -> str:
    """DuckDB recomputation of the bit matrix alone — used directly as
    the streaming-Bloom oracle (streamed bits are definitionally batch
    bits) and as the base of :func:`bloom_oracle_sql`."""
    _check_params(k, m)
    probe_rows = _bloom_probes_sql(table, key_expr=key_expr,
                                   series_expr=series_expr,
                                   ts_col=ts_col, unit=unit, k=k, m=m)
    return f"""
WITH probes AS (
{probe_rows})
SELECT DISTINCT series_key, bucket_ts, bit
FROM probes
"""


def bloom_oracle_sql(table: str, *, key_expr: str, series_expr: str,
                     ts_col: str = "ts", unit: str = "hour",
                     k: int = 4, m: int = 1 << 16) -> str:
    """DuckDB recomputation of build + probe: the bit matrix from the
    same hashes, then for every distinct (series, window, key) BOTH a
    present-key probe (one-sided contract: always true) and an
    absent-twin probe (key || '#absent') whose verdict exposes the
    filter's actual false positives value-stably."""
    _check_params(k, m)
    regs = _bloom_probes_sql(table, key_expr=key_expr,
                             series_expr=series_expr, ts_col=ts_col,
                             unit=unit, k=k, m=m)
    hu = ("CAST(CAST(concat('0x', substr(md5(CAST({j} AS VARCHAR) "
          "|| '|' || p.key), 1, 8)) AS BIGINT) AS HUGEINT) "
          "* 4294967296 "
          "+ CAST(concat('0x', substr(md5(CAST({j} AS VARCHAR) "
          "|| '|' || p.key), 9, 8)) AS BIGINT)")
    probe_bits = "\nUNION ALL\n".join(
        f"SELECT p.series_key, p.bucket_ts, p.key, p.expected, "
        f"CAST(({hu.format(j=j)}) % {m} AS INT) AS bit "
        f"FROM probe_keys p"
        for j in range(k))
    return f"""
WITH raw_probes AS (
{regs}),
regs AS (
    SELECT DISTINCT series_key, bucket_ts, bit FROM raw_probes),
seen AS (
    SELECT DISTINCT series_key, bucket_ts, key FROM raw_probes),
probe_keys AS (
    SELECT series_key, bucket_ts, key, TRUE AS expected FROM seen
    UNION ALL
    SELECT series_key, bucket_ts, key || '#absent', FALSE FROM seen),
probe_bits AS (
{probe_bits})
SELECT pb.series_key, pb.bucket_ts, pb.key, pb.expected,
       (count(r.bit) = {k}) AS maybe_present
FROM probe_bits pb
LEFT JOIN regs r
  ON r.series_key = pb.series_key AND r.bucket_ts = pb.bucket_ts
 AND r.bit = pb.bit
GROUP BY 1, 2, 3, 4
"""
