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
  (per-language / per-domain caps), TWO-PHASE so no task ever sorts a
  whole group: a hash-threshold pre-filter shrinks each group to
  ~``safety * n`` survivor rows (map-only after a broadcast of per-group
  counts), and only the survivors are window-ranked. An exact fallback
  re-windows the (astronomically rare) groups whose survivor count fell
  below ``n``, so the selected set is bit-identical to the naive full
  window — same hash, same order, same rows.

The rank hash is the high 32 bits of md5(key || ':' || seed) — md5, not
xxhash64, so a DuckDB oracle recomputes the EXACT sample (the same
trade the SimHash oracle makes; see ``dedup._token_hash64``). At 100 TB
the md5-vs-xxhash64 delta is noise next to the scan; a fleet that cares
can swap ``hash_fn`` the same way simhash does.
"""

from __future__ import annotations

import functools
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
                     key_col: str = "doc_id", seed: int = 7,
                     safety: float = 4.0) -> DataFrame:
    """Seeded uniform sample of ``n`` rows per group (stratified cap).

    Rank = (hash_rank(key, seed), key) — the key tie-break makes the
    order total, so the selected set is exactly reproducible.

    Scale design (two-phase exact). The naive plan —
    ``row_number().over(Window.partitionBy(group))`` — sorts each whole
    group in ONE task; when the group IS the stratum (per-language caps),
    English at corpus scale is a single-task sort of ~half the corpus to
    keep ``n`` rows. Instead:

    1. Count each group (map-side-combined agg, one tiny row per group)
       and broadcast the counts back.
    2. Pre-filter: keep rows with ``hash_rank < t`` where
       ``t = min(1, safety * n / group_count)``. Map-only; the expected
       survivor count per group is ``safety * n`` regardless of group
       size, so the window input is bounded.
    3. Window-rank ONLY the survivors and keep ``_rn <= n``.
    4. Exact fallback: any group whose threshold actually filtered
       (``t < 1``) but yielded fewer than ``n`` survivors (probability
       ~exp(-n(safety-1)²/2·safety) per group by Chernoff — for
       n=20, safety=4 that is ~1e-10) is re-windowed over its full rows.

    Bit-identical to the naive plan: if a group has >= n survivors under
    threshold ``t``, its n smallest ranks are all < ``t`` and hence all
    survive the pre-filter, so ranking survivors selects exactly the
    same rows; otherwise the fallback ranks the full group. The cost of
    exactness is extra map-only passes over the input (counts + filter),
    which parallelize perfectly — the straggler sort is gone.

    Null semantics match the naive window too: a NULL group value is its
    own stratum (groupBy already treats it so; every join here is
    null-safe ``<=>``, so null groups flow through the count/pre-filter/
    fallback machinery like any other), and a NULL ``key_col`` yields a
    NULL rank which the window's default ``asc_nulls_first`` ordering
    places ahead of every real rank — so null-key rows unconditionally
    survive the pre-filter (they are the group's smallest ranks by
    definition) and are selected exactly as the naive plan selects
    them."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    counts = (df.groupBy(*group_cols)
              .agg(F.count(F.lit(1)).alias("_gcnt"),
                   F.lit(int(n)).cast("long").alias("_q")))
    return _quota_sample(df, list(group_cols), counts,
                         key_col=key_col, seed=seed, safety=safety)


def sample_by_quota(df: DataFrame, group_cols: Sequence[str],
                    quotas: DataFrame, *, quota_col: str = "quota",
                    key_col: str = "doc_id", seed: int = 7,
                    safety: float = 4.0,
                    broadcast_groups: bool = True) -> DataFrame:
    """:func:`sample_per_group` with a PER-GROUP cap: ``quotas`` maps
    ``group_cols`` → ``quota_col`` (how many rows to keep from that
    group). Groups absent from ``quotas`` or with quota <= 0 are
    dropped entirely. Selection, exactness and the two-phase scale
    design are identical to :func:`sample_per_group` — the shared core
    below — so the selected set for any group equals the naive
    full-group hash-rank window with ``n = quota``.

    ``broadcast_groups``: the per-group summary frames are hinted
    broadcast by default (strata like language are few); a FULL-web
    per-DOMAIN stratification (~10^8 groups) outgrows a driver
    broadcast — pass False there and the joins shuffle on the group
    key (AQE still broadcasts when the summary turns out small)."""
    gcols = list(group_cols)
    q_r = quotas.select(
        *[F.col(g).alias(f"_g_{i}") for i, g in enumerate(gcols)],
        F.col(quota_col).cast("long").alias("_q"))
    on = functools.reduce(
        lambda a, b: a & b,
        [df[g].eqNullSafe(q_r[f"_g_{i}"]) for i, g in enumerate(gcols)])
    # r8 (ADVICE): respect broadcast_groups here too — the ~1e8-group
    # per-domain case must not force a driver broadcast of the quota
    # frame; with False the join shuffles on the group key (AQE still
    # broadcasts when the frame turns out small).
    q_r_j = F.broadcast(q_r) if broadcast_groups else q_r
    counts = (df.join(q_r_j, on, "inner")
              .groupBy(*[df[g] for g in gcols])
              .agg(F.count(F.lit(1)).alias("_gcnt"),
                   F.first("_q").alias("_q"))
              .where(F.col("_q") > 0))
    return _quota_sample(df, gcols, counts,
                         key_col=key_col, seed=seed, safety=safety,
                         broadcast_groups=broadcast_groups)


def _quota_sample(df: DataFrame, gcols: list, counts: DataFrame, *,
                  key_col: str, seed: int, safety: float,
                  broadcast_groups: bool = True) -> DataFrame:
    """Shared two-phase exact core: ``counts`` is one row per surviving
    group with ``_gcnt`` (group size) and ``_q`` (rows to keep)."""
    if safety <= 1.0:
        raise ValueError(f"safety must be > 1, got {safety}")
    rank = hash_rank(F.col(key_col), seed)
    out_cols = df.columns

    def nullsafe_on(right: DataFrame) -> Column:
        """Join condition `df.g <=> right._g_i` for every group col —
        plain `=` would silently drop null-group rows from the join."""
        return functools.reduce(
            lambda a, b: a & b,
            [df[g].eqNullSafe(right[f"_g_{i}"])
             for i, g in enumerate(gcols)])

    def g_renamed(frame: DataFrame, extra: Sequence[str] = ()) -> DataFrame:
        return frame.select(
            *[F.col(g).alias(f"_g_{i}") for i, g in enumerate(gcols)],
            *[F.col(c) for c in extra])

    # One row per group — materialize it (localCheckpoint) so the three
    # downstream references cost lookups, not three re-aggregations of
    # the input.
    counts = (counts
              .withColumn("_thr", F.least(
                  F.lit(1.0),
                  F.lit(float(safety)) * F.col("_q") / F.col("_gcnt")))
              .localCheckpoint(eager=True))
    counts_r = g_renamed(counts, ["_thr", "_q"])
    _maybe_b = F.broadcast if broadcast_groups else (lambda x: x)
    survivors = (df.join(_maybe_b(counts_r), nullsafe_on(counts_r),
                         "inner")
                 .drop(*[f"_g_{i}" for i in range(len(gcols))])
                 .where(rank.isNull() | (rank < F.col("_thr"))))

    # Both window functions share the group partitioning (one shuffle of
    # the ~safety*q survivors per group): the rank, and the group's
    # survivor count used to prove the pre-filter kept enough rows.
    w = (Window.partitionBy(*gcols)
         .orderBy(hash_rank(F.col(key_col), seed), F.col(key_col)))
    wc = Window.partitionBy(*gcols)
    ranked = (survivors
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_scnt", F.count(F.lit(1)).over(wc)))

    # Satisfied groups: enough survivors, or the threshold never
    # filtered (t >= 1 keeps the whole group). Everything else —
    # including the zero-survivor corner, absent from `ranked` entirely
    # — is re-windowed over its full rows by the fallback, whose input
    # scan AQE skips when the broadcast `bad` side is empty (the
    # ~always case: P(starved group) ~ exp(-q(safety-1)^2/2*safety)).
    good_rows = (ranked
                 .where((F.col("_rn") <= F.col("_q"))
                        & ((F.col("_scnt") >= F.col("_q"))
                           | (F.col("_thr") >= 1.0)))
                 .select(*out_cols))
    satisfied = g_renamed(ranked.where((F.col("_rn") == 1)
                                       & (F.col("_scnt") >= F.col("_q"))))
    anti_on = functools.reduce(
        lambda a, b: a & b,
        [counts[g].eqNullSafe(satisfied[f"_g_{i}"])
         for i, g in enumerate(gcols)])
    bad = g_renamed(counts.where(F.col("_thr") < 1.0)
                    .join(satisfied, anti_on, "left_anti")
                    .select(*gcols, "_q"), ["_q"])
    bad_rows = (df.join(_maybe_b(bad), nullsafe_on(bad), "inner")
                .drop(*[f"_g_{i}" for i in range(len(gcols))])
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= F.col("_q"))
                .select(*out_cols))
    return good_rows.unionByName(bad_rows)


def exemplar_samples(samples: DataFrame, tier: str = "1 hour",
                     k: int = 2, *, key_col: str = "series_key",
                     ts_col: str = "ts",
                     value_col: str = "value_double",
                     seed: int = 7) -> DataFrame:
    """Prometheus-exemplar analog: keep ``k`` deterministic RAW samples
    per (series, tier bucket) next to the aggregated tiers, so a spike
    in a rollup can be drilled down to concrete observations after the
    raw tier has been expired by retention.

    Selection is the house keyed-hash sample over a stable composite
    key (series : microsecond ts : 1e-6-quantized value) — reproducible
    across runs, partitionings and cluster sizes, and cheap: the
    two-phase :func:`sample_per_group` machinery means no task ever
    window-sorts a whole bucket's raw rows. Identical (series, ts,
    value) duplicates are interchangeable, so the output MULTISET is
    deterministic even under key ties.
    Output: (series_key, bucket_ts, ts, value_double).
    """
    from json_time_series_extractor_spark.operators.rollup import _bucket

    v = F.col(value_col)
    b = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        _bucket(ts_col, tier).alias("bucket_ts"),
        F.col(ts_col).alias("ts"),
        v.alias("value_double"),
        F.concat_ws(
            ":", F.col(key_col).cast("string"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).cast("string"),
            F.floor(v * 1e6 + 0.5).cast("long").cast("string"),
        ).alias("_ek"))
    return sample_per_group(b, ["series_key", "bucket_ts"], k,
                            key_col="_ek", seed=seed).drop("_ek")


def exemplar_oracle_sql(samples_sql: str, unit: str, k: int,
                        seed: int = 7) -> str:
    """DuckDB replay of the exact exemplar selection: same composite
    key, same md5 rank, same key tie-break. Kept beside the impl."""
    ek = ("series_key || ':' || CAST(epoch_us(ts) AS VARCHAR) || ':' "
          "|| CAST(CAST(floor(value * 1000000 + 0.5) AS BIGINT) "
          "AS VARCHAR)")
    return f"""
WITH s AS (
    SELECT series_key, date_trunc('{unit}', ts) AS bucket_ts, ts, value,
           {ek} AS ek
    FROM ({samples_sql})),
r AS (
    SELECT series_key, bucket_ts, ts, value,
           row_number() OVER (
               PARTITION BY series_key, bucket_ts
               ORDER BY CAST(concat('0x', substr(md5(ek || ':{seed}'),
                                                 1, 8))
                             AS BIGINT) / 4294967296.0, ek) AS rn
    FROM s)
SELECT series_key, bucket_ts, ts,
       CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_double
FROM r WHERE rn <= {k}
"""


def domain_mix_sample(df: DataFrame, target_total: int, *,
                      domain_col: str = "domain",
                      key_col: str = "doc_id", seed: int = 7,
                      safety: float = 4.0,
                      broadcast_groups: bool = True) -> DataFrame:
    """Temperature-weighted domain mixing: rebalance a crawl so no
    domain dominates the training mix.

    The standard pretraining recipe (GPT-3's dataset weighting, UniMax)
    samples domain d proportionally to count_d^α with α < 1 —
    sub-linear, so the head flattens and the tail survives. α is fixed
    at 0.5 here because √ is the one exponent that is EXACTLY
    reproducible across engines (IEEE sqrt is correctly rounded;
    arbitrary pow is not), which keeps the whole allocation integral:

        w_d   = floor(√count_d · 1e6 + 0.5)          (fp6 int)
        quota = (target_total · w_d) DIV Σw          (exact int)

    The Σ-remainder (< #domains rows) is deliberately dropped rather
    than redistributed — largest-remainder tie-breaks are exactly the
    kind of cross-engine ambiguity this repo bans. Selection within a
    domain is the house keyed-hash rank via :func:`sample_by_quota`,
    so the chosen SET is deterministic across runs, partitionings and
    cluster sizes, and any derived table sampled by the same key stays
    aligned.

    Scale shape: one summary hash agg (domain counts), one broadcast
    scalar (Σw via a 1-row cross join — no collect), then the shared
    two-phase quota sampler: map-only pre-filter + bounded windows.
    decimal(38,0) holds target_total·w_d up to ~1e38 (ANSI fails
    loudly beyond); the DuckDB oracle mirrors it in HUGEINT.
    """
    if target_total < 1:
        raise ValueError(
            f"target_total must be >= 1, got {target_total}")
    cnts = (df.groupBy(F.col(domain_col).alias("_dom"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_w", F.floor(F.sqrt(F.col("_cnt")) * 1e6
                                      + F.lit(0.5)).cast("long")))
    wsum = cnts.agg(F.sum(F.col("_w").cast("decimal(38,0)"))
                    .alias("_wsum"))
    quotas = (cnts.crossJoin(F.broadcast(wsum))
              .select(F.col("_dom").alias(domain_col),
                      F.expr(f"CAST((CAST({int(target_total)} AS "
                             f"DECIMAL(38,0)) * CAST(_w AS "
                             f"DECIMAL(38,0))) DIV _wsum AS BIGINT)")
                      .alias("quota")))
    return sample_by_quota(df, [domain_col], quotas,
                           key_col=key_col, seed=seed, safety=safety,
                           broadcast_groups=broadcast_groups)


def domain_mix_oracle_sql(docs_sql: str, target_total: int, *,
                          domain_col: str = "domain",
                          key_col: str = "doc_id",
                          seed: int = 7) -> str:
    """DuckDB replay of the exact :func:`domain_mix_sample` selection:
    identical √-fp6 weights, HUGEINT quota allocation, md5 rank and
    key tie-break. ``docs_sql`` yields at least (key_col,
    domain_col)."""
    return f"""
WITH d AS ({docs_sql}),
c AS (
    SELECT {domain_col}, count(*) AS cnt,
           CAST(CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6 + 0.5)
                AS BIGINT) AS HUGEINT) AS w
    FROM d GROUP BY 1),
q AS (
    SELECT {domain_col},
           CAST({int(target_total)} AS HUGEINT) * w
               // (SELECT sum(w) FROM c) AS quota
    FROM c),
r AS (
    SELECT d.*,
           row_number() OVER (
               PARTITION BY d.{domain_col}
               ORDER BY CAST(concat('0x',
                        substr(md5(CAST(d.{key_col} AS VARCHAR)
                                   || ':{seed}'), 1, 8))
                        AS BIGINT) / 4294967296.0,
                        d.{key_col}) AS rn
    FROM d)
SELECT r.* EXCLUDE (rn)
FROM r JOIN q USING ({domain_col})
WHERE r.rn <= q.quota
"""


def assign_splits(df: DataFrame, weights, *, key_col: str = "doc_id",
                  split_col: str = "split", seed: int = 7) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets exactly
    one split by where its keyed hash rank falls in the cumulative
    weight intervals — [0, w1) → first split, [w1, w1+w2) → second, …
    (the last interval absorbs rounding up to 1.0).

    The properties a training pipeline actually needs, by
    construction: DISJOINT (one rank, one interval), EXHAUSTIVE,
    reproducible across runs/partitionings/cluster sizes, and STABLE
    under corpus growth — a document's split never changes when other
    documents are added, because the decision depends only on its own
    key (the reason hash-interval splits beat any shuffle-and-slice
    scheme at 100 TB, where "the" corpus is never finished).

    ``weights`` is an ordered mapping name → positive weight, summing
    to <= 1.0 (a shortfall leaves unassigned rows labelled NULL —
    useful for held-back pools). Map-only; no shuffle, no state.
    """
    items = list(weights.items())
    if not items:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for _, w in items):
        raise ValueError(f"weights must be positive, got {items}")
    total = sum(w for _, w in items)
    if total > 1.0 + 1e-12:
        raise ValueError(f"weights sum to {total} > 1")
    rank = hash_rank(F.col(key_col), seed)
    expr = None
    cum = 0.0
    for name, w in items:
        cum += w
        cond = rank < F.lit(float(cum))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    return df.withColumn(split_col, expr)


def assign_splits_oracle_expr(key_sql: str, weights, seed: int = 7) -> str:
    """DuckDB CASE expression mirroring :func:`assign_splits` exactly:
    same md5 rank, same cumulative float literals in the same order."""
    rank = (f"(CAST(concat('0x', substr(md5(CAST({key_sql} AS VARCHAR)"
            f" || ':{seed}'), 1, 8)) AS BIGINT) / 4294967296.0)")
    branches = []
    cum = 0.0
    for name, w in list(weights.items()):
        cum += w
        branches.append(f"WHEN {rank} < CAST({float(cum)!r} AS DOUBLE) "
                        f"THEN '{name}'")
    return "CASE " + " ".join(branches) + " END"


def sample_by_token_budget(df: DataFrame, group_cols: Sequence[str],
                           budget: int, *, weight_col: str,
                           key_col: str = "doc_id", seed: int = 7,
                           safety: float = 1.5,
                           broadcast_groups: bool = True) -> DataFrame:
    """Budgeted sampling in WEIGHT units (tokens / chars / bytes) — the
    unit training budgets are actually set in, where
    :func:`sample_by_quota` caps ROW counts.

    Keep rule (deterministic, partition-agnostic, SQL-replayable): rank
    each group's rows by ``(hash_rank(key), key)``; a row is kept iff
    the cumulative weight of all earlier-ranked rows in its group is
    strictly below ``budget``. The boundary row that crosses the budget
    is KEPT (so a group whose first document alone exceeds the budget
    still contributes it), everything after is dropped; kept weight is
    therefore < budget + max_row_weight, and the kept set is a PREFIX
    of the group's hash order — re-running with a larger budget only
    ever adds rows (growth-stable, like :func:`assign_splits`).

    Two-phase scale design (the :func:`sample_per_group` doctrine): a
    first aggregate takes each group's total weight; groups whose total
    fits the budget pass through whole with no window at all; otherwise
    a rank prefilter ``rank < safety * budget / total_weight`` bounds
    the windowed rows to ~safety × the budget's share — because the
    prefilter keeps a rank-PREFIX, cumulative sums over it equal the
    full-group ones for every surviving row, so the result is exact
    whenever the survivors' weight covers the budget; the (Chernoff-
    rare) starved groups fall back to a full-group window. One shuffle
    of ~budget-sized survivor sets, never of whole groups.

    ``weight_col`` must be non-negative; NULL weights count as 0.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if safety <= 1.0:
        raise ValueError(f"safety must be > 1, got {safety}")
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty (budget the whole "
                         "corpus by adding a constant group column)")
    out_cols = df.columns
    rank = hash_rank(F.col(key_col), seed)
    w_val = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))

    totals = (df.groupBy(*gcols)
              .agg(F.sum(w_val).alias("_tok"))
              .withColumn("_thr", F.when(
                  F.col("_tok") <= F.lit(budget), F.lit(1.0)).otherwise(
                  F.least(F.lit(1.0),
                          F.lit(float(safety)) * F.lit(float(budget))
                          / F.col("_tok"))))
              .localCheckpoint(eager=True))

    def renamed(frame: DataFrame, extra: Sequence[str]) -> DataFrame:
        return frame.select(
            *[F.col(g).alias(f"_g_{i}") for i, g in enumerate(gcols)],
            *[F.col(c) for c in extra])

    def on_cond(right: DataFrame) -> Column:
        return functools.reduce(
            lambda a, b: a & b,
            [df[g].eqNullSafe(right[f"_g_{i}"])
             for i, g in enumerate(gcols)])

    _maybe_b = F.broadcast if broadcast_groups else (lambda x: x)
    t_r = renamed(totals, ["_thr", "_tok"])
    joined = (df.join(_maybe_b(t_r), on_cond(t_r), "inner")
              .drop(*[f"_g_{i}" for i in range(len(gcols))]))
    # whole-group fast path: total fits the budget -> every row kept,
    # no window touches these rows at all
    whole = joined.where(F.col("_tok") <= F.lit(budget)) \
        .select(*out_cols)
    survivors = joined.where(
        (F.col("_tok") > F.lit(budget))
        & (rank.isNull() | (rank < F.col("_thr"))))

    def budget_prefix(rows: DataFrame) -> DataFrame:
        order = Window.partitionBy(*gcols).orderBy(
            hash_rank(F.col(key_col), seed), F.col(key_col))
        cum_before = F.coalesce(
            F.sum(w_val).over(order.rowsBetween(
                Window.unboundedPreceding, -1)), F.lit(0))
        return (rows
                .withColumn("_cb", cum_before)
                .withColumn("_stok", F.sum(w_val).over(
                    Window.partitionBy(*gcols))))

    ranked = budget_prefix(survivors)
    good = ranked.where(F.col("_stok") >= F.lit(budget)) \
        .where(F.col("_cb") < F.lit(budget)).select(*out_cols)
    # starved groups: the prefilter kept less weight than the budget
    # while filtering (thr < 1) — derived as filtered-groups ANTI
    # satisfied-groups (NOT from `ranked`: a group whose every row the
    # prefilter dropped is absent from it entirely). Recomputed from
    # full rows; the broadcast side is ~always empty and AQE skips the
    # scan.
    satisfied = renamed(
        ranked.where(F.col("_stok") >= F.lit(budget))
        .select(*gcols).distinct(), [])
    anti_on = functools.reduce(
        lambda a, b: a & b,
        [totals[g].eqNullSafe(satisfied[f"_g_{i}"])
         for i, g in enumerate(gcols)])
    bad = renamed(
        totals.where((F.col("_tok") > F.lit(budget))
                     & (F.col("_thr") < 1.0))
        .join(satisfied, anti_on, "left_anti").select(*gcols), [])
    fallback_rows = df.join(F.broadcast(bad), on_cond(bad), "left_semi")
    fallback = budget_prefix(fallback_rows) \
        .where(F.col("_cb") < F.lit(budget)).select(*out_cols)
    return whole.unionByName(good).unionByName(fallback)


def token_budget_oracle_sql(docs_sql: str, group_expr: str, budget: int, *,
                            weight_expr: str, key_sql: str = "doc_id",
                            seed: int = 7) -> str:
    """DuckDB ground truth for :func:`sample_by_token_budget`: the naive
    full-group hash-order cumulative window — same rank, same boundary
    rule. Kept beside the impl."""
    return f"""
WITH src AS ({docs_sql}),
r AS (
    SELECT *,
           CAST(concat('0x', substr(md5(CAST({key_sql} AS VARCHAR)
                                        || ':{seed}'), 1, 8)) AS BIGINT)
               / 4294967296.0 AS _rk,
           COALESCE(CAST({weight_expr} AS BIGINT), 0) AS _w
    FROM src),
c AS (
    SELECT *, COALESCE(sum(_w) OVER (
        PARTITION BY {group_expr} ORDER BY _rk, {key_sql}
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _cb
    FROM r)
SELECT * EXCLUDE (_rk, _w, _cb) FROM c WHERE _cb < {budget}
"""
