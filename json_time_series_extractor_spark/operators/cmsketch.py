"""Count-Min frequency sketch tier — mergeable, oracle-checkable.

Completes the mergeable-sketch family (SURVEY.md §2.4): histogram =
distribution, t-digest = quantiles, HLL = distinct count, Count-Min =
per-key FREQUENCY. Per tumbling window and series, a depth x width
counter matrix (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms
2005) answers "how often did key k occur?" with one-sided error:
estimate >= truth, over-count <= e/width * total with probability
1 - (1/2)^depth. Registers merge by elementwise SUM, so tiers cascade
raw -> 1m -> 1h -> 1d on sketch rows only — the exact contract of
every other tier here.

Oracle verifiability (house rule): row hashes are md5-high-64 of
"<row>|<key>" (the [[oracle-typing-rules]] md5hi construction), the
width is a power of two so bucket = low log2(width) hash bits in both
engines (signed int64 masking == unsigned modulo), and counters are
integer SUMs — the whole register matrix and every min-estimate is
exactly recomputable in SQL. Pure Column expressions; one partial/
final hash aggregate per tier (hot keys collapse map-side).

State size: depth x width counters per (series, window) stored as
sparse rows — at most depth x distinct-keys rows when the window sees
fewer keys than the width.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from json_time_series_extractor_spark.operators.hll import _md5hi64
from json_time_series_extractor_spark.operators.rollup import _bucket

CM_REGISTER_SCHEMA = ("series_key string, bucket_ts timestamp, "
                      "cm_row int, cm_bucket int, cnt bigint")


def _check_params(depth: int, width: int) -> None:
    if not 1 <= depth <= 8:
        raise ValueError(f"depth must be 1..8, got {depth}")
    if width < 16 or width & (width - 1):
        raise ValueError(f"width must be a power of two >= 16, "
                         f"got {width}")


def _cm_bucket(key: Column, row: int, width: int) -> Column:
    """Row-``row`` counter index for *key*: low bits of the md5hi64 of
    '<row>|<key>' (power-of-two width makes the signed mask identical
    to the oracle's unsigned modulo)."""
    h = _md5hi64(F.concat(F.lit(f"{row}|"), key.cast("string")))
    return h.bitwiseAND(F.lit(width - 1)).cast("int")


def _cm_bucket_sql(key_sql: str, row: int, width: int) -> str:
    """:func:`_cm_bucket` as a SQL fragment (r8 — the ``dot_flat_sql``
    pattern): the identical md5hi64-and-mask recipe, but the whole
    coordinate array parses in ONE py4j call instead of ~15 per
    coordinate (measured 38ms -> 0.4ms per 4-row array build;
    value-equality asserted in tests across widths and unicode/pipe/
    empty keys). ``key_sql`` is a SQL-resolvable reference."""
    g = f"md5(concat('{row}|', CAST({key_sql} AS STRING)))"
    hi = f"CAST(conv(substring({g}, 1, 8), 16, 10) AS BIGINT)"
    lo = f"CAST(conv(substring({g}, 9, 8), 16, 10) AS BIGINT)"
    return f"CAST(((shiftleft({hi}, 32) | {lo}) & {width - 1}) AS INT)"


def _rb_array(key_col: str, depth: int, width: int) -> Column:
    """The per-row (cm_row, cm_bucket) coordinate array as one parsed
    expression — see :func:`_cm_bucket_sql`."""
    qk = f"`{key_col}`"
    return F.expr("array(" + ",".join(
        f"struct({j} AS r, {_cm_bucket_sql(qk, j, width)} AS b)"
        for j in range(depth)) + ")")


def _stamp_params(cnt: Column, depth: int, width: int) -> Column:
    """Tag the counter column with the sketch's build parameters so
    :func:`cm_estimate` can detect a probe-side depth/width mismatch
    (a wrong width silently misses every bucket and breaks the
    one-sided guarantee)."""
    return cnt.alias("cnt", metadata={"cm_depth": depth,
                                      "cm_width": width})


def _read_params(registers: DataFrame) -> tuple:
    md = registers.schema["cnt"].metadata if "cnt" in registers.columns \
        else {}
    return md.get("cm_depth"), md.get("cm_width")


def cm_rollup(df: DataFrame, tier: str, *, key_col: str,
              series_col: str = "series_key", ts_col: str = "ts",
              depth: int = 4, width: int = 1024) -> DataFrame:
    """(series, ts, key) rows -> sparse Count-Min registers per window:
    (series_key, bucket_ts, cm_row, cm_bucket, cnt). Absent counters
    are implicitly zero.

    NULL keys are dropped (a NULL contributes no frequency): md5(NULL)
    would otherwise produce NULL-bucket register rows unreachable by
    any probe, and the generated DuckDB oracle cannot hash NULL at all.

    The build (depth, width) are stamped as column metadata on ``cnt``
    so :func:`cm_estimate` rejects mismatched probe parameters.
    """
    _check_params(depth, width)
    key = F.col(key_col)
    rows = _rb_array(key_col, depth, width)
    out = (df.where(key.isNotNull())
           .select(F.col(series_col).alias("series_key"),
                   _bucket(ts_col, tier).alias("bucket_ts"),
                   F.explode(rows).alias("_rb"))
           .groupBy("series_key", "bucket_ts",
                    F.col("_rb.r").alias("cm_row"),
                    F.col("_rb.b").alias("cm_bucket"))
           .agg(F.count(F.lit(1)).alias("cnt")))
    return out.withColumn(
        "cnt", _stamp_params(F.col("cnt"), depth, width))


def cm_cascade(registers: DataFrame, tier: str) -> DataFrame:
    """Merge registers into a coarser window: elementwise SUM —
    associative/commutative, so any cascade chain equals a direct
    build (same contract and test strategy as the other tiers).
    Propagates the (depth, width) metadata stamp when present."""
    depth, width = _read_params(registers)
    merged = (registers
              .groupBy("series_key",
                       _bucket("bucket_ts", tier).alias("bucket_ts"),
                       "cm_row", "cm_bucket")
              .agg(F.sum("cnt").alias("cnt")))
    if depth is not None:
        merged = merged.withColumn(
            "cnt", _stamp_params(F.col("cnt"), depth, width))
    return merged


def cm_estimate(registers: DataFrame, keys: DataFrame, *,
                key_col: str = "key", depth: int = 4,
                width: int = 1024,
                carry: tuple = ()) -> DataFrame:
    """Point-query the sketch: for every (series_key, bucket_ts, key)
    row of *keys*, the Count-Min estimate min over rows of that key's
    counter (missing counter = 0). Output: keys columns + ``cm_est``
    (one-sided: cm_est >= true count whenever the sketch saw the same
    stream).

    If *registers* carries the (depth, width) metadata stamp written by
    :func:`cm_rollup` / :func:`cm_cascade`, a probe-side mismatch
    raises instead of silently returning non-one-sided estimates (the
    bucket indices would simply miss). NULL probe keys are dropped,
    mirroring the build side.

    *carry* names extra columns of *keys* that are functionally
    dependent on (series_key, bucket_ts, key) — e.g. the exact count
    the caller wants next to the estimate. They ride through the probe
    fan-out and the final aggregate as additional group keys (same
    groups, since they add no distinctions), which saves the caller a
    re-join of the estimate frame against *keys* (one shuffle per
    avoided join; round-8 optimization, guide §2.4).
    """
    _check_params(depth, width)
    built_depth, built_width = _read_params(registers)
    if built_depth is not None and (built_depth, built_width) != (depth,
                                                                  width):
        raise ValueError(
            f"cm_estimate(depth={depth}, width={width}) does not match "
            f"the registers' build parameters (depth={built_depth}, "
            f"width={built_width}); estimates would silently lose the "
            f"one-sided guarantee")
    key = F.col(key_col)
    keys = keys.where(key.isNotNull())
    carry = tuple(carry)
    probes = keys.select(
        "series_key", "bucket_ts", key.alias(key_col), *carry,
        F.explode(_rb_array(key_col, depth, width)).alias("_rb")) \
        .select("series_key", "bucket_ts", key_col, *carry,
                F.col("_rb.r").alias("cm_row"),
                F.col("_rb.b").alias("cm_bucket"))
    joined = probes.join(
        registers, ["series_key", "bucket_ts", "cm_row", "cm_bucket"],
        "left")
    return (joined
            .groupBy("series_key", "bucket_ts", key_col, *carry)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cm_est")))


def _cm_probes_sql(table: str, *, key_expr: str, series_expr: str,
                   ts_col: str, unit: str, depth: int,
                   width: int) -> str:
    """Shared DuckDB probe-row CTE body: every input row exploded into
    its *depth* (cm_row, cm_bucket) coordinates via the same md5hi row
    hashes and power-of-two masking as the Spark expressions."""
    hu = (f"CAST(CAST(concat('0x', substr(md5(CAST({{j}} AS VARCHAR) "
          f"|| '|' || {key_expr}), 1, 8)) AS BIGINT) AS HUGEINT) "
          f"* 4294967296 "
          f"+ CAST(concat('0x', substr(md5(CAST({{j}} AS VARCHAR) "
          f"|| '|' || {key_expr}), 9, 8)) AS BIGINT)")
    return "\nUNION ALL\n".join(
        f"SELECT {series_expr} AS series_key, "
        f"date_trunc('{unit}', {ts_col}) AS bucket_ts, "
        f"{key_expr} AS key, {j} AS cm_row, "
        f"CAST(({hu.format(j=j)}) % {width} AS INT) AS cm_bucket "
        f"FROM {table} WHERE {key_expr} IS NOT NULL"
        for j in range(depth))


def cm_registers_oracle_sql(table: str, *, key_expr: str,
                            series_expr: str, ts_col: str = "ts",
                            unit: str = "hour", depth: int = 4,
                            width: int = 1024) -> str:
    """DuckDB recomputation of the REGISTER matrix alone — used
    directly as the streaming-CM oracle (streamed registers are
    definitionally batch registers) and as the base of
    :func:`cm_oracle_sql`."""
    _check_params(depth, width)
    probe_rows = _cm_probes_sql(table, key_expr=key_expr,
                                series_expr=series_expr, ts_col=ts_col,
                                unit=unit, depth=depth, width=width)
    return f"""
WITH probes AS (
{probe_rows})
SELECT series_key, bucket_ts, cm_row, cm_bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM probes GROUP BY 1, 2, 3, 4
"""


def cm_oracle_sql(table: str, *, key_expr: str, series_expr: str,
                  ts_col: str = "ts", unit: str = "hour",
                  depth: int = 4, width: int = 1024) -> str:
    """DuckDB recomputation of build + estimate for every distinct
    (series, window, key): registers from the same md5hi row hashes and
    power-of-two masking, estimates as the min over rows, plus the
    exact count so the one-sided bound is visible in the oracle row."""
    _check_params(depth, width)
    probe_rows = _cm_probes_sql(table, key_expr=key_expr,
                                series_expr=series_expr, ts_col=ts_col,
                                unit=unit, depth=depth, width=width)
    return f"""
WITH probes AS (
{probe_rows}),
regs AS (
    SELECT series_key, bucket_ts, cm_row, cm_bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM probes GROUP BY 1, 2, 3, 4),
keyrows AS (
    SELECT DISTINCT series_key, bucket_ts, key, cm_row, cm_bucket
    FROM probes),
est AS (
    SELECT k.series_key, k.bucket_ts, k.key,
           CAST(MIN(r.cnt) AS BIGINT) AS cm_est
    FROM keyrows k
    JOIN regs r USING (series_key, bucket_ts, cm_row, cm_bucket)
    GROUP BY 1, 2, 3),
exact AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           {key_expr} AS key, CAST(count(*) AS BIGINT) AS exact_cnt
    FROM {table} WHERE {key_expr} IS NOT NULL GROUP BY 1, 2, 3)
SELECT e.series_key, e.bucket_ts, e.key, e.cm_est, x.exact_cnt,
       e.cm_est >= x.exact_cnt AS one_sided_ok
FROM est e JOIN exact x USING (series_key, bucket_ts, key)
"""


def cm_over_time(registers: DataFrame, k_buckets: int, *,
                 min_buckets: int = 1) -> DataFrame:
    """Sliding-window frequency: per (series, bucket), the elementwise
    SUM of the trailing ``k_buckets`` PRESENT buckets' Count-Min
    registers — "how often did key X appear over the last k hours,
    hourly" from sketch rows alone; completes the sliding-sketch trio
    next to :func:`~.tdigest.tdigest_over_time` (quantiles) and
    :func:`~.hll.hll_over_time` (distincts), with the same
    present-bucket-index window semantics and ``n_buckets`` gate.

    Same fan-out shape as ``hll_over_time``: registers (bounded at
    depth x width rows per bucket) are fanned to the <= k later present
    bucket indices and SUM-merged — sketch-sized rows only; the
    one-sided guarantee is preserved because SUM over a window of
    one-sided sketches is one-sided for that window's stream. The
    (depth, width) metadata stamp propagates so ``cm_estimate``
    keeps rejecting mismatched probes.
    Output: CM_REGISTER_SCHEMA + ``n_buckets``.
    """
    if k_buckets < 1:
        raise ValueError(f"k_buckets must be >= 1, got {k_buckets}")
    if min_buckets < 1:
        raise ValueError(f"min_buckets must be >= 1, got {min_buckets}")
    from pyspark.sql import Window

    from json_time_series_extractor_spark.operators._persist import (
        materialize_eager)

    depth, width = _read_params(registers)
    # The register frame feeds BOTH the present-bucket index and the
    # fan-out below; without materialization the whole build subtree
    # plans twice (and whether AQE's runtime exchange reuse dedups it
    # is a stage race — round 7/8 measured the plan bimodal because of
    # it). Registers are sketch-sized (<= depth x width rows per
    # series/bucket), so one eager pass is the cheap side of the trade;
    # see operators/_persist.py::materialize_eager for why eager, not
    # a lazy persist.
    registers = materialize_eager(registers)
    b = (registers.select("series_key", "bucket_ts").distinct()
         .withColumn("_i", F.row_number().over(
             Window.partitionBy("series_key").orderBy("bucket_ts"))))
    fan = (registers.join(b, ["series_key", "bucket_ts"])
           .select("series_key", "cm_row", "cm_bucket", "cnt",
                   F.explode(F.sequence(
                       F.col("_i"),
                       F.col("_i") + F.lit(k_buckets - 1))).alias("_ti")))
    tgt = b.select("series_key", F.col("bucket_ts").alias("_tbt"),
                   F.col("_i").alias("_ti"),
                   F.least(F.col("_i"), F.lit(k_buckets))
                   .alias("n_buckets"))
    out = (fan.join(tgt, ["series_key", "_ti"])
           .where(F.col("n_buckets") >= min_buckets)
           .groupBy("series_key", F.col("_tbt").alias("bucket_ts"),
                    "cm_row", "cm_bucket", "n_buckets")
           .agg(F.sum("cnt").alias("cnt")))
    if depth is not None:
        out = out.withColumn(
            "cnt", _stamp_params(F.col("cnt"), depth, width))
    return out.select("series_key", "bucket_ts", "cm_row", "cm_bucket",
                      "cnt", "n_buckets")


def cm_over_time_oracle_sql(table: str, *, key_expr: str,
                            series_expr: str, k_buckets: int,
                            ts_col: str = "ts", unit: str = "hour",
                            depth: int = 4, width: int = 1024) -> str:
    """DuckDB replay of the sliding frequency pipeline: from-raw
    registers, the same present-bucket-index fan-out and SUM merge,
    min-over-rows estimates for every key seen in each window, and the
    window-exact count so the one-sided bound stays visible per row."""
    _check_params(depth, width)
    probe_rows = _cm_probes_sql(table, key_expr=key_expr,
                                series_expr=series_expr, ts_col=ts_col,
                                unit=unit, depth=depth, width=width)
    return f"""
WITH probes AS (
{probe_rows}),
regs AS (
    SELECT series_key, bucket_ts, cm_row, cm_bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM probes GROUP BY 1, 2, 3, 4),
b AS (
    SELECT series_key, bucket_ts,
           row_number() OVER (PARTITION BY series_key
                              ORDER BY bucket_ts) AS i
    FROM (SELECT DISTINCT series_key, bucket_ts FROM regs)),
merged AS (
    SELECT f.series_key, b2.bucket_ts, f.cm_row, f.cm_bucket,
           CAST(least(b2.i, {k_buckets}) AS INT) AS n_buckets,
           CAST(SUM(f.cnt) AS BIGINT) AS cnt
    FROM (SELECT r.*, br.i + t.range AS ti
          FROM regs r JOIN b br USING (series_key, bucket_ts)
          CROSS JOIN range(0, {k_buckets}) t) f
    JOIN b b2 ON b2.series_key = f.series_key AND b2.i = f.ti
    GROUP BY 1, 2, 3, 4, 5),
kwin AS (
    SELECT DISTINCT f.series_key, b2.bucket_ts, f.key, f.cm_row,
                    f.cm_bucket
    FROM (SELECT p.*, br.i + t.range AS ti
          FROM (SELECT DISTINCT series_key, bucket_ts, key, cm_row,
                       cm_bucket FROM probes) p
          JOIN b br USING (series_key, bucket_ts)
          CROSS JOIN range(0, {k_buckets}) t) f
    JOIN b b2 ON b2.series_key = f.series_key AND b2.i = f.ti),
est AS (
    SELECT k.series_key, k.bucket_ts, k.key,
           CAST(MIN(m.cnt) AS BIGINT) AS cm_est,
           CAST(MIN(m.n_buckets) AS INT) AS n_buckets
    FROM kwin k
    JOIN merged m USING (series_key, bucket_ts, cm_row, cm_bucket)
    GROUP BY 1, 2, 3),
exact0 AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           {key_expr} AS key, CAST(count(*) AS BIGINT) AS exact_cnt
    FROM {table} WHERE {key_expr} IS NOT NULL GROUP BY 1, 2, 3),
exwin AS (
    SELECT f.series_key, b2.bucket_ts, f.key,
           CAST(SUM(f.exact_cnt) AS BIGINT) AS exact_cnt
    FROM (SELECT x.*, br.i + t.range AS ti
          FROM exact0 x JOIN b br USING (series_key, bucket_ts)
          CROSS JOIN range(0, {k_buckets}) t) f
    JOIN b b2 ON b2.series_key = f.series_key AND b2.i = f.ti
    GROUP BY 1, 2, 3)
SELECT e.series_key, e.bucket_ts, e.key, e.cm_est, e.n_buckets,
       x.exact_cnt, e.cm_est >= x.exact_cnt AS one_sided_ok
FROM est e JOIN exwin x USING (series_key, bucket_ts, key)
"""
