"""Tiered continuous-aggregate rollups (raw -> 1m -> 1h -> 1d).

TimescaleDB-style continuous aggregates expressed as stock Catalyst
aggregations — everything here is JVM-side whole-stage codegen; no Python.

Mergeability across tiers (the cascade re-aggregates the child tier, never
the raw data):

- ``min``/``max``: min of mins / max of maxes,
- ``count``: sum of counts,
- ``sum``: sum of sums — kept so ``mean`` = sum/count stays exact,
- ``last``: ``max_by(value, ts)`` — value at the greatest timestamp. In the
  cascade this is always deterministic (child buckets have distinct
  ``last_ts``). In the raw rollup, ties on *exactly equal* timestamps within
  one (key, window) are implementation-defined; pass
  ``deterministic_last=True`` to break ties by value via
  ``max(struct(ts, value))`` instead — exact for oracle comparison and
  resume idempotency, but it forces a SortAggregate (struct-typed buffers
  are not hash-aggregable), so the fast hash-agg path is the default.

Scale notes: the 1m rollup is the first shuffle of the pipeline, hash
partitioned on (series_key, window). Hot keys are handled by the salted
two-phase variant (:func:`rollup_salted`): partial aggregate per
(key, salt, window) — a manual map-side combine for the pathological case —
then a final merge over the tiny partial table. Tier cascades shuffle
progressively less data (1m -> 1h is a 60x reduction).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Canonical tier windows, child -> parent.
TIERS = ("1 minute", "1 hour", "1 day")

#: Output schema of :func:`rollup` / :func:`rollup_cascade` (DDL string) —
#: callers reading tier tables back should pass it explicitly so empty
#: (fully-expired) directories read as empty DataFrames instead of failing
#: schema inference.
ROLLUP_SCHEMA = (
    "series_key string, bucket_ts timestamp, min double, max double, "
    "sum double, count bigint, mean double, last double, last_ts timestamp"
)


def _bucket(ts_col: str, tier: str) -> Column:
    """Tumbling-window bucket start. Epoch-aligned, identical to
    ``date_trunc`` for the canonical tiers (minute/hour/day)."""
    return F.window(ts_col, tier)["start"]


def _last_agg(ts_col: Column, v: Column, deterministic: bool) -> Column:
    if deterministic:
        return F.max(F.struct(ts_col.alias("t"), v.alias("v")))["v"]
    return F.max_by(v, ts_col)


def rollup(
    samples: DataFrame,
    tier: str = "1 minute",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    deterministic_last: bool = False,
) -> DataFrame:
    """Aggregate raw samples into one tier:
    (series_key, bucket_ts, min, max, sum, count, mean, last, last_ts).

    Null values (non-numeric samples) are excluded, like an aggregate over
    a measure column in SQL.
    """
    v = F.col(value_col)
    return (
        samples
        .where(v.isNotNull())
        .groupBy(F.col(key_col).alias("series_key"),
                 _bucket(ts_col, tier).alias("bucket_ts"))
        .agg(
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.sum(v).alias("sum"),
            F.count(v).alias("count"),
            (F.sum(v) / F.count(v)).alias("mean"),
            _last_agg(F.col(ts_col), v, deterministic_last).alias("last"),
            F.max(ts_col).alias("last_ts"),
        )
    )


def rollup_cascade(child: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one using only mergeable
    state (never touches raw data). ``max_by(last, last_ts)`` is
    deterministic here: child buckets have pairwise-distinct ``last_ts``."""
    return (
        child
        .groupBy("series_key", _bucket("bucket_ts", tier).alias("bucket_ts"))
        .agg(
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("sum").alias("sum"),
            F.sum("count").alias("count"),
            (F.sum("sum") / F.sum("count")).alias("mean"),
            F.max_by("last", "last_ts").alias("last"),
            F.max("last_ts").alias("last_ts"),
        )
    )


#: Calendar units rollup_calendar_cascade accepts (variable-length
#: periods F.window cannot express; week excluded — ISO week vs
#: date_trunc('week') conventions differ across engines).
CALENDAR_UNITS = ("month", "quarter", "year")


def rollup_calendar_cascade(child: DataFrame,
                            unit: str = "month") -> DataFrame:
    """Calendar-aligned coarse tiers — the TimescaleDB
    ``time_bucket('1 month', ...)`` feature Spark's fixed-width
    ``F.window`` cannot express (months/quarters/years vary in
    length): re-bucket a finer tier by ``date_trunc``. Merge algebra
    is identical to :func:`rollup_cascade` (mergeable state only —
    never touches raw data), so month tiers cascade exactly from the
    day tier a retention policy already keeps. Epoch alignment is
    irrelevant here: calendar boundaries ARE date_trunc boundaries in
    both engines.
    """
    if unit not in CALENDAR_UNITS:
        raise ValueError(
            f"unit must be one of {CALENDAR_UNITS}, got {unit!r}")
    return (
        child
        .groupBy("series_key",
                 F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts"))
        .agg(
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("sum").alias("sum"),
            F.sum("count").alias("count"),
            (F.sum("sum") / F.sum("count")).alias("mean"),
            F.max_by("last", "last_ts").alias("last"),
            F.max("last_ts").alias("last_ts"),
        )
    )


def rollup_percentiles(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    qs: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact percentile tier: (series_key, bucket_ts, p50, p95, p99, cnt).

    The canonical latency-rollup shape (the north-star pages carry fetch
    latency). Uses Spark's EXACT ``percentile`` (linear interpolation on
    the sorted bucket) — deliberately NOT mergeable: exact percentiles
    cannot cascade from tier state, so this is a terminal aggregate over
    raw samples at whatever tiers are needed (the group sizes are bucket-
    bounded, so the sort-based aggregate stays partition-local; for
    cascading percentiles use :mod:`.tdigest` — the mergeable t-digest
    sketch tier built in round 3)."""
    v = F.col(value_col)

    def label(q: float) -> str:
        # p50 / p95 / p99_9 — int truncation would collide 0.99 and 0.999.
        return "p" + f"{q * 100:g}".replace(".", "_")

    names = [label(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile labels from qs={qs}")
    aggs = [F.percentile(v, q).alias(n) for q, n in zip(qs, names)]
    return (samples
            .where(v.isNotNull())
            .groupBy(F.col(key_col).alias("series_key"),
                     _bucket(ts_col, tier).alias("bucket_ts"))
            .agg(*aggs, F.count(v).alias("cnt")))


def rollup_histogram(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    bounds: tuple,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Explicit-bounds histogram per bucket — the MERGEABLE answer to
    percentiles at scale (Prometheus classic-histogram shape).

    ``bounds = (b0, .., b_{n-1})`` defines n+1 bins: (-inf, b0), [b0, b1),
    .., [b_{n-1}, inf). Output: (series_key, bucket_ts, hist array<long>,
    cnt). Unlike :func:`rollup_percentiles`, histogram state merges
    exactly across tiers (elementwise sum — :func:`histogram_cascade`),
    so coarse tiers never touch raw data and quantiles are estimable at
    any tier from the bin counts.
    """
    v = F.col(value_col)
    # The bin index below counts bounds <= v, which is only a valid bin
    # number when bounds are strictly increasing; unsorted or duplicate
    # bounds would silently misbin every value.
    bl = list(bounds)
    if not bl or bl != sorted(bl) or len(set(bl)) != len(bl):
        raise ValueError(
            f"histogram bounds must be non-empty and strictly "
            f"increasing, got {bl}")
    n_bins = len(bounds) + 1
    # Bin index = number of bounds <= v (bounds is a literal sorted array).
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    idx = F.size(F.filter(barr, lambda b: v >= b))
    hist = F.array(*[
        F.sum(F.when(idx == i, F.lit(1)).otherwise(F.lit(0)))
        .cast("long") for i in range(n_bins)])
    return (samples
            .where(v.isNotNull())
            .groupBy(F.col(key_col).alias("series_key"),
                     _bucket(ts_col, tier).alias("bucket_ts"))
            .agg(hist.alias("hist"), F.count(v).alias("cnt")))


def histogram_rebin(hist_df: DataFrame, *, bounds: tuple,
                    coarse_bounds: tuple) -> DataFrame:
    """Re-bin an explicit-bounds histogram tier to a coarser bound set
    — EXACT when ``coarse_bounds`` ⊆ ``bounds`` (every coarse bin is a
    union of whole fine bins; Prometheus applies the same subset rule
    when collapsing classic-histogram ``le`` labels). Lets one stored
    fine-grained tier serve dashboards at any coarser resolution
    without touching raw data.

    Map-only: the fine→coarse bin mapping is computed from the two
    static bound lists and compiled into per-coarse-bin sums of
    ``element_at`` expressions — no shuffle, no Python.
    """
    import bisect

    bl, cl = list(bounds), list(coarse_bounds)
    if not cl or cl != sorted(cl) or len(set(cl)) != len(cl):
        raise ValueError(f"coarse bounds must be non-empty and strictly "
                         f"increasing, got {cl}")
    missing = [c for c in cl if c not in bl]
    if missing:
        raise ValueError(
            f"coarse bounds must be a subset of the fine bounds "
            f"(splitting a fine bin is not exact); not in fine: "
            f"{missing}")
    groups: list = [[] for _ in range(len(cl) + 1)]
    for i in range(len(bl) + 1):
        lower = None if i == 0 else bl[i - 1]
        j = 0 if lower is None else bisect.bisect_right(cl, lower)
        groups[j].append(i)
    def _sum(idxs):
        col = F.element_at("hist", idxs[0] + 1)
        for i in idxs[1:]:
            col = col + F.element_at("hist", i + 1)
        return col
    coarse = F.array(*[_sum(g) for g in groups])
    return hist_df.select("series_key", "bucket_ts",
                          coarse.alias("hist"), "cnt")


def histogram_cascade(child: DataFrame, tier: str, *,
                      n_bins: int) -> DataFrame:
    """Merge a finer histogram tier into a coarser one: elementwise sum of
    the bin-count arrays (exact — histograms are fully mergeable state).
    ``n_bins`` = len(bounds) + 1 from the producing :func:`rollup_histogram`.

    Shaped as n flat ``sum`` aggregates over unpacked bins (hash-agg,
    map-side combinable) rather than a list fold — same reasoning as the
    minhash/simhash aggregates."""
    sums = [F.sum(F.element_at("hist", i + 1)).alias(f"_h{i}")
            for i in range(n_bins)]
    agg = (child
           .groupBy("series_key", _bucket("bucket_ts", tier)
                    .alias("bucket_ts"))
           .agg(*sums, F.sum("cnt").alias("cnt")))
    return agg.select(
        "series_key", "bucket_ts",
        F.array(*[F.col(f"_h{i}") for i in range(n_bins)]).alias("hist"),
        "cnt")


def top_k_series(
    samples: DataFrame,
    tier: str = "1 day",
    k: int = 3,
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Exact heavy hitters per bucket: the k series with the most samples
    in each tier window — (bucket_ts, series_key, n, rank). One hash
    aggregate + a row_number window PARTITIONED BY BUCKET (never a global
    sort); the window input is one row per (bucket, series), so partition
    sizes are series-cardinality-bounded regardless of row count.
    Deterministic tie-break: (n desc, series_key asc). Integer counts, so
    the ranking is engine-exact (no float-ordering hazards)."""
    counts = (samples
              .where(F.col(value_col).isNotNull())
              .groupBy(_bucket(ts_col, tier).alias("bucket_ts"),
                       F.col(key_col).alias("series_key"))
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("bucket_ts").orderBy(
        F.col("n").desc(), F.col("series_key").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def detect_hot_keys(
    samples: DataFrame,
    *,
    key_col: str = "series_key",
    min_share: float = 0.01,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """Heavy-hitter detection for :func:`rollup_salted`'s ``hot_keys``.

    Counts keys on a deterministic Bernoulli sample (one map-side pass +
    a tiny shuffle of per-partition partials) and returns the keys whose
    sampled share exceeds ``min_share`` — at 10^12 rows a 1% sample still
    sees every key that matters for skew, and the output is small enough
    to broadcast. Run it once per input partition-range and reuse; skew
    profiles shift slowly relative to job cadence.
    """
    counts = (samples.sample(fraction=sample_fraction, seed=seed)
              .groupBy(key_col).count())
    # One scan of the input: the grouped result (one row per key) is tiny,
    # so the total comes from a window over it rather than a second pass.
    total_w = Window.partitionBy()
    return (counts
            .withColumn("_total", F.sum("count").over(total_w))
            .where(F.col("count")
                   >= F.greatest(F.lit(1), (F.col("_total")
                                            * min_share).cast("long")))
            .select(key_col))


def rollup_salted(
    samples: DataFrame,
    tier: str = "1 minute",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    salt_buckets: int = 16,
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """Skew-safe two-phase rollup.

    Phase 1 aggregates per (key, window, salt) — the salt spreads a hot
    (key, window) over ``salt_buckets`` reducers; phase 2 merges the salted
    partials (tiny) into final buckets. With ``hot_keys`` (a one-column
    DataFrame of known-heavy keys, broadcast) only hot keys are salted and
    cold keys keep salt 0, so the second shuffle stays minimal.

    Results are identical to :func:`rollup` (all aggregates are mergeable).
    """
    v = F.col(value_col)
    salt = F.pmod(F.xxhash64(ts_col, F.lit(7)), F.lit(salt_buckets))
    if hot_keys is not None:
        hot = F.broadcast(
            hot_keys.select(F.col(hot_keys.columns[0]).alias(key_col))
            .withColumn("_hot", F.lit(True)))
        samples = samples.join(hot, on=key_col, how="left")
        salt = F.when(F.col("_hot").isNotNull(), salt).otherwise(F.lit(0))

    partial = (
        samples
        .where(v.isNotNull())
        .groupBy(F.col(key_col).alias("series_key"),
                 _bucket(ts_col, tier).alias("bucket_ts"),
                 salt.alias("_salt"))
        .agg(
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.sum(v).alias("sum"),
            F.count(v).alias("count"),
            F.max_by(v, ts_col).alias("last"),
            F.max(ts_col).alias("last_ts"),
        )
    )
    return (
        partial
        .groupBy("series_key", "bucket_ts")
        .agg(
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("sum").alias("sum"),
            F.sum("count").alias("count"),
            (F.sum("sum") / F.sum("count")).alias("mean"),
            F.max_by("last", "last_ts").alias("last"),
            F.max("last_ts").alias("last_ts"),
        )
    )


def rolling_over_time(rollup_df: DataFrame, k_buckets: int, *,
                      value_col: str = "mean",
                      aggs: tuple = ("avg", "min", "max", "sum"),
                      min_buckets: int = 1) -> DataFrame:
    """PromQL range-vector aggregates (``avg_over_time`` family) over a
    rollup tier: for every (series, bucket) row, aggregate *value_col*
    across the trailing ``k_buckets`` PRESENT rows of that series (the
    smoothing behind alert rules and dashboards).

    Output: input columns + ``<agg>_over_time`` per requested agg +
    ``buckets_in_window``; rows with fewer than ``min_buckets`` trailing
    rows emit null aggregates (PromQL returns nothing for an empty
    range — the count column lets callers apply stricter policies).

    Scale shape: one window per series ordered by bucket with a
    BOUNDED row frame (k-1 preceding .. current). The window partition
    is a series' ROLLUP rows (one per bucket — days/years of buckets,
    not raw samples), the same summary-sized partitions every other
    tier-level window here uses; gap-fill first if empty buckets must
    participate.
    """
    if k_buckets < 1:
        raise ValueError(f"k_buckets must be >= 1, got {k_buckets}")
    allowed = {"avg", "min", "max", "sum", "count"}
    bad = set(aggs) - allowed
    if bad:
        raise ValueError(f"unknown aggs {sorted(bad)}; allowed {allowed}")
    w = (Window.partitionBy("series_key").orderBy("bucket_ts")
         .rowsBetween(-(k_buckets - 1), 0))
    v = F.col(value_col)
    n = F.count(v).over(w)
    out = rollup_df.withColumn("buckets_in_window", n)
    gate = n >= min_buckets
    fns = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
           "count": F.count}
    for a in aggs:
        out = out.withColumn(f"{a}_over_time",
                             F.when(gate, fns[a](v).over(w)))
    return out


def histogram_quantile(hist_df: DataFrame, qs, *, bounds,
                       hist_col: str = "hist",
                       cnt_col: str = "cnt",
                       names: Optional[tuple] = None) -> DataFrame:
    """PromQL ``histogram_quantile`` over the mergeable histogram tier
    (:func:`rollup_histogram` / :func:`histogram_cascade` output): the
    q-quantile estimated from explicit-bounds bin counts by linear
    interpolation inside the target bin. Because histogram state merges
    exactly across tiers, this yields quantile estimates at ANY tier
    without touching raw data — the scale counterpart to
    :func:`rollup_percentiles` (exact, but unmergeable).

    Semantics per (row, q), with bins (-inf,b0), [b0,b1), ..
    [b_{n-1},inf) and rank = q * cnt:

    - target bin = first whose cumulative count >= rank;
    - first bin: returns ``b0`` (no finite lower edge to interpolate
      from — PromQL's clamp-to-lowest-bound behavior);
    - last bin: returns ``b_{n-1}`` (PromQL clamps at the highest
      finite bound rather than extrapolating into the open tail);
    - interior bin j: ``b_{j-1} + (b_j - b_{j-1}) * (rank -
      cum_{j-1}) / hist_j`` — the classic cumulative-histogram
      interpolation;
    - ``cnt = 0`` rows emit NULL.

    The arithmetic is rational over integer bin counts and literal
    bounds (bin widths are pre-computed Python floats so both engines
    of an oracle comparison see one identical literal), so the result
    is engine-deterministic given the same bins.

    Scale shape: pure per-row expressions over tier rows (one row per
    series-bucket) — no shuffle, no window, embarrassingly parallel.
    """
    bl = [float(b) for b in bounds]
    if not bl or bl != sorted(bl) or len(set(bl)) != len(bl):
        raise ValueError(
            f"histogram bounds must be non-empty and strictly "
            f"increasing, got {bl}")
    qlist = [float(q) for q in qs]
    if any(not (0.0 < q <= 1.0) for q in qlist):
        raise ValueError(f"quantiles must be in (0, 1], got {qlist}")
    if names is None:
        names = tuple(f"p{q * 100:g}".replace(".", "_") for q in qlist)
    if len(names) != len(qlist):
        raise ValueError("names must align with qs")
    n_bins = len(bl) + 1
    # Cumulative bin counts c0..c_{n-1}; c_{n-1} == cnt by construction.
    elems = [F.element_at(hist_col, i + 1) for i in range(n_bins)]
    cums = []
    acc = None
    for e in elems:
        acc = e if acc is None else acc + e
        cums.append(acc)
    out = hist_df
    for q, name in zip(qlist, names):
        rank = F.lit(q) * F.col(cnt_col)
        # First-match-wins bin selection; the last bin is the otherwise
        # branch (its cumulative count always reaches rank).
        expr = F.when(cums[0] >= rank, F.lit(bl[0]))
        for j in range(1, n_bins - 1):
            lo, width = bl[j - 1], bl[j] - bl[j - 1]
            expr = expr.when(
                cums[j] >= rank,
                F.lit(lo) + F.lit(width) * (rank - cums[j - 1])
                / elems[j])
        expr = expr.otherwise(F.lit(bl[-1]))
        out = out.withColumn(name,
                             F.when(F.col(cnt_col) > 0, expr))
    return out


def histogram_fraction(hist_df: DataFrame, thresholds, *, bounds,
                       hist_col: str = "hist",
                       cnt_col: str = "cnt",
                       names: Optional[tuple] = None) -> DataFrame:
    """PromQL ``histogram_fraction``'s one-sided form over the
    mergeable histogram tier: for each literal threshold x, the
    estimated fraction of observations <= x, linearly interpolated
    inside x's bin — :func:`histogram_quantile` inverted, and like it
    answerable at ANY tier without touching raw data.

    Because thresholds are literals, the containing bin is resolved
    in PYTHON at plan time — each output column is one branch-free
    expression ``(cum_{j-1} + hist_j · w) / cnt`` whose interpolation
    weight w = (x − lo)/width is a single pre-computed float literal
    (identical on the oracle side). Conventions (mirroring the
    quantile's clamps): x must lie in [bounds[0], bounds[-1]];
    x == bounds[0] yields the whole first bin's mass (its lower edge
    is open); x == bounds[-1] yields the mass strictly below it (the
    tail bin cannot be interpolated). ``cnt = 0`` rows emit NULL.

    Scale shape: pure per-row expressions over tier rows — no shuffle,
    no window.
    """
    bl = [float(b) for b in bounds]
    if not bl or bl != sorted(bl) or len(set(bl)) != len(bl):
        raise ValueError(
            f"histogram bounds must be non-empty and strictly "
            f"increasing, got {bl}")
    xs = [float(x) for x in thresholds]
    if any(not bl[0] <= x <= bl[-1] for x in xs):
        raise ValueError(
            f"thresholds must lie within [{bl[0]}, {bl[-1]}], got {xs}")
    if names is None:
        names = tuple(f"frac_le_{x:g}".replace(".", "_") for x in xs)
    if len(names) != len(xs):
        raise ValueError("names must align with thresholds")
    n_bins = len(bl) + 1
    elems = [F.element_at(hist_col, i + 1) for i in range(n_bins)]
    cums = []
    acc = None
    for e in elems:
        acc = e if acc is None else acc + e
        cums.append(acc)
    out = hist_df
    cnt = F.col(cnt_col)
    for x, name in zip(xs, names):
        if x == bl[0]:
            num = cums[0].cast("double")
        elif x == bl[-1]:
            num = cums[-2].cast("double")   # c_{n-2}: mass below the top bound
        else:
            j = next(i for i in range(1, len(bl)) if x < bl[i])
            w = (x - bl[j - 1]) / (bl[j] - bl[j - 1])
            num = (cums[j - 1] + elems[j] * F.lit(w)).cast("double")
        frac = F.when(cnt > 0, num / cnt.cast("double"))
        out = out.withColumn(name, frac)
    return out
