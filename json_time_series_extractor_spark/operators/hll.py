"""HyperLogLog distinct-count rollup tier — mergeable, oracle-checkable.

The third mergeable sketch next to the histogram and t-digest tiers
(SURVEY.md §2.4): approximate COUNT(DISTINCT key) per tumbling window
(distinct URLs/users per hour per series at corpus scale), with the
same cascade contract as every other tier — registers merge with MAX,
so raw -> 1m -> 1h -> 1d re-aggregates sketches, never raw data.

Design for oracle verifiability (the house rule: every operator a SQL
engine can recompute):

* The hash is the high 64 bits of md5 (``md5hi`` — same construction as
  the SimHash oracle path in :mod:`.dedup`), because DuckDB has md5 but
  not xxhash64. All register math is integer-exact in both engines.
* The rank is **trailing**-zero-count + 1 of the low ``64-b`` bits
  (geometrically distributed exactly like the canonical leading-zero
  rank), because ``tz(v) = log2(v & -v)`` is exact double math both
  engines share, while a leading-zero count needs bit-length, which SQL
  can only approximate through lossy ``log2`` on non-powers-of-two.
* The harmonic sum is fixed-point: ``inv_fp40 = Σ 2^(40-rank)`` as a
  BIGINT (ranks beyond 40 contribute 0 — a deliberate, documented
  truncation at the 2^-40 term, far below the sketch's standard error).
  Cross-engine float summation order can differ in the last ulp; an
  integer sum cannot.

Scale: one shuffle per tier on (series, bucket, register) with map-side
partial MAX; a group materializes at most ``2^register_bits`` register
rows (b=9 -> 512 rows, ~12 KB), so a 10^12-row day collapses to
(series x windows x 512) — the same "tiny mergeable state" contract the
t-digest tier documents. Pure Column expressions end to end: no Python,
no UDF, whole-stage codegen throughout.

64-bit hash => no large-range correction is needed (the canonical 32-bit
correction exists only for hash-collision saturation); the small-range
linear-counting correction is applied per the original HLL paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from json_time_series_extractor_spark.operators.rollup import _bucket

#: fixed-point precision of the harmonic sum (bits below 1.0).
_FP = 40

HLL_REGISTER_SCHEMA = ("series_key string, bucket_ts timestamp, "
                       "reg int, max_rank int")


def _md5hi64(col: Column) -> Column:
    """High 64 bits of md5 as a signed int64 (sign bit wraps via
    shift+or), identical to the SimHash ``md5hi`` token hash so one
    oracle recipe covers both."""
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def _alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (Flajolet et al.)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_reg_rank(key: Column, register_bits: int) -> tuple:
    """(register index, rank) expressions for *key* — shared by the
    batch tier and the streaming tier so streamed registers are
    definitionally identical to batch registers."""
    if not 4 <= register_bits <= 14:
        raise ValueError(f"register_bits must be 4..14, got {register_bits}")
    low = 64 - register_bits
    h = _md5hi64(key.cast("string"))
    v = h.bitwiseAND(F.lit((1 << low) - 1))
    reg = F.shiftright(h, low).bitwiseAND(F.lit((1 << register_bits) - 1))
    # Rank = trailing zeros + 1; v == 0 (probability 2^-low) saturates.
    rank = F.when(v == 0, F.lit(low + 1)).otherwise(
        (F.log2(v.bitwiseAND(-v).cast("double")) + 1).cast("int"))
    return reg, rank


def hll_rollup(df: DataFrame, tier: str, *, key_col: str,
               series_col: str = "series_key", ts_col: str = "ts",
               register_bits: int = 9) -> DataFrame:
    """(series, ts, key) rows -> HLL registers per tumbling window.

    Output: (series_key, bucket_ts, reg, max_rank); absent registers are
    implicitly rank 0 (``hll_estimate`` accounts for them), so the state
    stays sparse when windows see few keys.

    NULL keys are dropped (a NULL is not a distinct value): md5(NULL)
    would otherwise emit a phantom (reg=NULL, max_rank=NULL) register
    row that inflates ``_present`` in :func:`hll_estimate` — and the
    streaming tier (streaming/stream.py) already filters them, so batch
    and streamed registers stay definitionally identical.
    """
    reg, rank = hll_reg_rank(F.col(key_col), register_bits)
    return (df.where(F.col(key_col).isNotNull())
            .select(F.col(series_col).alias("series_key"),
                      _bucket(ts_col, tier).alias("bucket_ts"),
                      reg.cast("int").alias("reg"), rank.alias("rank"))
            .groupBy("series_key", "bucket_ts", "reg")
            .agg(F.max("rank").alias("max_rank")))


def hll_cascade(registers: DataFrame, tier: str) -> DataFrame:
    """Merge a finer tier's registers into a coarser tumbling window.
    MAX is associative/commutative/idempotent, so cascading through any
    chain of tiers yields registers identical to a direct build — the
    same contract (and test strategy) as ``rollup_cascade``."""
    return (registers
            .groupBy("series_key",
                     _bucket("bucket_ts", tier).alias("bucket_ts"), "reg")
            .agg(F.max("max_rank").alias("max_rank")))


def hll_estimate(registers: DataFrame, *,
                 register_bits: int = 9,
                 carry: tuple = ()) -> DataFrame:
    """Registers -> per-(series, window) distinct-count estimate.

    Output: (series_key, bucket_ts, n_zero, inv_fp40, ndv_est) where
    ``inv_fp40`` is the integer fixed-point harmonic sum (the oracle
    compares it exactly) and ``ndv_est`` applies the standard
    small-range linear-counting correction.

    *carry* names extra register columns functionally dependent on
    (series_key, bucket_ts) — e.g. ``n_buckets`` from
    :func:`hll_over_time` — appended to the output after the estimate
    columns. They join the aggregate's group keys (same groups, no new
    distinctions), saving the caller a re-join against the register
    frame (round-8 optimization, guide §2.4).
    """
    m = 1 << register_bits
    carry = tuple(carry)
    term = F.when(F.col("max_rank") <= _FP,
                  F.pow(F.lit(2.0), _FP - F.col("max_rank"))
                  .cast("long")).otherwise(F.lit(0))
    grouped = (registers
               .groupBy("series_key", "bucket_ts", *carry)
               .agg(F.count(F.lit(1)).alias("_present"),
                    F.sum(term).alias("_inv_present")))
    n_zero = (F.lit(m) - F.col("_present")).cast("int")
    inv = (F.col("_inv_present")
           + n_zero.cast("long") * F.lit(1 << _FP)).cast("long")
    raw = (F.lit(_alpha(m) * m * m * float(1 << _FP))
           / inv.cast("double"))
    # Small-range correction: linear counting while empty registers
    # remain and the raw estimate is below 2.5m (HLL paper §4).
    est = F.when((n_zero > 0) & (raw <= F.lit(2.5 * m)),
                 F.lit(float(m)) * F.log(F.lit(float(m))
                                         / n_zero.cast("double"))) \
        .otherwise(raw)
    return grouped.select(
        "series_key", "bucket_ts", n_zero.alias("n_zero"),
        inv.alias("inv_fp40"), est.alias("ndv_est"), *carry)


def hll_registers_oracle_sql(table: str, *, key_expr: str,
                             series_expr: str, ts_col: str = "ts",
                             unit: str = "hour",
                             register_bits: int = 9) -> str:
    """ANSI-SQL (DuckDB) recomputation of the REGISTER matrix alone —
    md5 via HUGEINT (unsigned 64-bit), integer register/rank math.
    Used directly as the streaming-HLL oracle (streamed registers are
    definitionally batch registers) and as the base of
    :func:`hll_oracle_sql`."""
    low = 64 - register_bits
    return f"""
WITH h AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           CAST(CAST(concat('0x', substr(md5({key_expr}), 1, 8))
                     AS BIGINT) AS HUGEINT) * 4294967296
           + CAST(concat('0x', substr(md5({key_expr}), 9, 8))
                  AS BIGINT) AS hu
    FROM {table}
    WHERE {key_expr} IS NOT NULL),
r AS (
    SELECT series_key, bucket_ts,
           CAST(hu // {1 << low} AS INT) AS reg,
           CAST(hu % {1 << low} AS BIGINT) AS v
    FROM h)
SELECT series_key, bucket_ts, reg,
       MAX(CASE WHEN v = 0 THEN {low + 1}
           ELSE CAST(log2(CAST(v & (-v) AS DOUBLE)) AS INT) + 1
           END) AS max_rank
FROM r GROUP BY 1, 2, 3
"""


def hll_oracle_sql(table: str, *, key_expr: str, series_expr: str,
                   ts_col: str = "ts", unit: str = "hour",
                   register_bits: int = 9) -> str:
    """ANSI-SQL (DuckDB) recomputation of the full register + estimate
    pipeline — the md5 hash via HUGEINT (unsigned 64-bit semantics),
    integer register/rank math, the exact fixed-point harmonic sum, and
    the identical correction branch. Generated here so the driver
    oracle and any ad-hoc verification share one recipe."""
    m = 1 << register_bits
    # One pre-multiplied double literal, computed in Python exactly like
    # the Spark side's F.lit(...) — and CAST AS DOUBLE everywhere,
    # because DuckDB types bare decimal literals as DECIMAL (which both
    # overflows on multiplication and rounds differently than IEEE).
    numer = _alpha(m) * m * m * float(1 << _FP)
    regs = hll_registers_oracle_sql(
        table, key_expr=key_expr, series_expr=series_expr, ts_col=ts_col,
        unit=unit, register_bits=register_bits)
    return f"""
WITH rk AS ({regs}),
g AS (
    SELECT series_key, bucket_ts,
           CAST({m} - count(*) AS INT) AS n_zero,
           CAST(CAST(sum(CASE WHEN max_rank <= {_FP}
                         THEN CAST(power(2.0, {_FP} - max_rank) AS BIGINT)
                         ELSE 0 END) AS BIGINT)
                + CAST({m} - count(*) AS BIGINT)
                  * CAST({1 << _FP} AS BIGINT) AS BIGINT) AS inv_fp40
    FROM rk GROUP BY 1, 2)
SELECT series_key, bucket_ts, n_zero, inv_fp40,
       CASE WHEN n_zero > 0
                 AND CAST({numer!r} AS DOUBLE)
                     / CAST(inv_fp40 AS DOUBLE)
                     <= CAST({2.5 * m!r} AS DOUBLE)
            THEN CAST({float(m)!r} AS DOUBLE)
                 * ln(CAST({float(m)!r} AS DOUBLE) / n_zero)
            ELSE CAST({numer!r} AS DOUBLE) / CAST(inv_fp40 AS DOUBLE)
       END AS ndv_est
FROM g
"""


def hll_over_time(registers: DataFrame, k_buckets: int, *,
                  min_buckets: int = 1) -> DataFrame:
    """Sliding-window distinct: per (series, bucket), the union of the
    trailing ``k_buckets`` PRESENT buckets' HLL registers — "unique
    users over the last 24h, hourly" from 24 sketch rows per register,
    raw data never re-read (the sliding complement of the tumbling
    :func:`hll_cascade`).

    Window semantics match ``tdigest_over_time``: trailing PRESENT
    buckets of the series (gaps skipped), ``n_buckets`` attached for a
    ``min_buckets`` gate. Registers can be sparse per bucket, so the
    frame is computed in present-BUCKET index space (a per-register
    ROWS frame would silently reach past the window wherever a register
    is absent from an intermediate bucket): index the series' present
    buckets, fan each register row out to the <= k later bucket indices
    it influences, and MAX-merge per (series, target bucket, register).

    Scale shape: the fan-out multiplies REGISTER rows (<= 2^b per
    bucket, ~512) by k — sketch-sized, never raw-sized; one shuffle for
    the merge groupBy with map-side partial MAX.
    Output: (series_key, bucket_ts, reg, max_rank, n_buckets) — feed to
    :func:`hll_estimate` (it ignores the extra column).
    """
    if k_buckets < 1:
        raise ValueError(f"k_buckets must be >= 1, got {k_buckets}")
    if min_buckets < 1:
        raise ValueError(f"min_buckets must be >= 1, got {min_buckets}")
    from pyspark.sql import Window

    from json_time_series_extractor_spark.operators._persist import (
        materialize_eager)

    # Registers feed both the present-bucket index and the fan-out;
    # materialize once (eager — see _persist.py for why a lazy persist
    # loses here) so the register-build subtree never plans twice.
    registers = materialize_eager(registers)
    b = (registers.select("series_key", "bucket_ts").distinct()
         .withColumn("_i", F.row_number().over(
             Window.partitionBy("series_key").orderBy("bucket_ts"))))
    fan = (registers.join(b, ["series_key", "bucket_ts"])
           .select("series_key", "reg", "max_rank",
                   F.explode(F.sequence(
                       F.col("_i"),
                       F.col("_i") + F.lit(k_buckets - 1))).alias("_ti")))
    tgt = b.select("series_key", F.col("bucket_ts").alias("_tbt"),
                   F.col("_i").alias("_ti"),
                   F.least(F.col("_i"), F.lit(k_buckets))
                   .alias("n_buckets"))
    return (fan.join(tgt, ["series_key", "_ti"])
            .where(F.col("n_buckets") >= min_buckets)
            .groupBy("series_key", F.col("_tbt").alias("bucket_ts"),
                     "reg", "n_buckets")
            .agg(F.max("max_rank").alias("max_rank"))
            .select("series_key", "bucket_ts", "reg", "max_rank",
                    "n_buckets"))


def hll_over_time_oracle_sql(table: str, *, key_expr: str,
                             series_expr: str, k_buckets: int,
                             ts_col: str = "ts", unit: str = "hour",
                             register_bits: int = 9) -> str:
    """DuckDB replay of the sliding union + estimate: from-raw
    registers, the same present-bucket index fan-out, MAX merge, and
    the exact fixed-point estimate arithmetic of ``hll_oracle_sql``."""
    m = 1 << register_bits
    numer = _alpha(m) * m * m * float(1 << _FP)
    regs = hll_registers_oracle_sql(
        table, key_expr=key_expr, series_expr=series_expr, ts_col=ts_col,
        unit=unit, register_bits=register_bits)
    return f"""
WITH rk AS ({regs}),
b AS (
    SELECT series_key, bucket_ts,
           row_number() OVER (PARTITION BY series_key
                              ORDER BY bucket_ts) AS i
    FROM (SELECT DISTINCT series_key, bucket_ts FROM rk)),
fan AS (
    SELECT rk.series_key, rk.reg, rk.max_rank, b.i + t.range AS ti
    FROM rk JOIN b USING (series_key, bucket_ts)
    CROSS JOIN range(0, {k_buckets}) t),
merged AS (
    SELECT f.series_key, b2.bucket_ts, f.reg,
           CAST(least(b2.i, {k_buckets}) AS INT) AS n_buckets,
           MAX(f.max_rank) AS max_rank
    FROM fan f JOIN b b2 ON b2.series_key = f.series_key
                         AND b2.i = f.ti
    GROUP BY 1, 2, 3, 4),
g AS (
    SELECT series_key, bucket_ts, n_buckets,
           CAST({m} - count(*) AS INT) AS n_zero,
           CAST(CAST(sum(CASE WHEN max_rank <= {_FP}
                         THEN CAST(power(2.0, {_FP} - max_rank) AS BIGINT)
                         ELSE 0 END) AS BIGINT)
                + CAST({m} - count(*) AS BIGINT)
                  * CAST({1 << _FP} AS BIGINT) AS BIGINT) AS inv_fp40
    FROM merged GROUP BY 1, 2, 3)
SELECT series_key, bucket_ts, n_buckets, n_zero, inv_fp40,
       CASE WHEN n_zero > 0
                 AND CAST({numer!r} AS DOUBLE)
                     / CAST(inv_fp40 AS DOUBLE)
                     <= CAST({2.5 * m!r} AS DOUBLE)
            THEN CAST({float(m)!r} AS DOUBLE)
                 * ln(CAST({float(m)!r} AS DOUBLE) / n_zero)
            ELSE CAST({numer!r} AS DOUBLE) / CAST(inv_fp40 AS DOUBLE)
       END AS ndv_est
FROM g
"""
