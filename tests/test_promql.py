"""PromQL frontend tests: parser unit tests (no Spark) + compile
equivalence against the oracled operators and brute-force Python.

The compiler's contract (plans/promql.py module docstring): every vector
lives on the tumbling ``step`` grid; instant value = deterministic last
sample per bucket; ``_over_time`` aggregates trailing wall-clock R via
RANGE frames over rollup partials; rate-family == the engine's oracled
per-bucket operators.
"""

from __future__ import annotations

import math

from datetime import datetime, timedelta

import pytest

from json_time_series_extractor_spark.plans.promql import (
    Agg,
    Binary,
    Call,
    Matcher,
    Num,
    PromQLCompileError,
    PromQLCompiler,
    PromQLSyntaxError,
    Selector,
    Unary,
    duration_seconds,
    parse,
    promql,
)

T0 = datetime(2026, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


#: (series_key, minutes-from-T0, value) — series "a" dense over 4 hours,
#: "b" sparse with a 2-hour gap, "c" a monotonic counter with one reset.
ROWS = [
    ("a", 5, 1.0), ("a", 25, 3.0), ("a", 55, 2.0),
    ("a", 65, 4.0), ("a", 95, 6.0),
    ("a", 130, 5.0), ("a", 185, 7.0), ("a", 215, 9.0),
    ("b", 10, 10.0), ("b", 50, 30.0),
    ("b", 190, 20.0), ("b", 230, 40.0),
    ("c", 0, 0.0), ("c", 20, 5.0), ("c", 40, 3.0), ("c", 50, 9.0),
]


@pytest.fixture(scope="module")
def samples(spark):
    return spark.createDataFrame(
        [(k, _ts(m), v) for k, m, v in ROWS],
        "series_key string, ts timestamp, value_double double",
    ).cache()


def _collect(df):
    return {(r.series_key, r.bucket_ts): r.value
            for r in df.collect()}


def _bucket_minutes(minutes, step_min=60):
    return (minutes // step_min) * step_min


def _instant_expected(keys=("a", "b", "c")):
    """last sample (ties by value) per (series, hour bucket)."""
    out = {}
    for k, m, v in ROWS:
        if k not in keys:
            continue
        b = _bucket_minutes(m)
        cur = out.get((k, b))
        if cur is None or (m, v) > cur:
            out[(k, b)] = (m, v)
    return {(k, _ts(b)): v for (k, b), (_, v) in out.items()}


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_duration_seconds():
    assert duration_seconds("90m") == 5400
    assert duration_seconds("1h") == 3600
    assert duration_seconds("2w") == 2 * 604800
    with pytest.raises(PromQLSyntaxError):
        duration_seconds("10ms")
    with pytest.raises(PromQLSyntaxError):
        duration_seconds("1h30m")


def test_parse_precedence():
    node = parse("a + b * c")
    assert isinstance(node, Binary) and node.op == "+"
    assert isinstance(node.rhs, Binary) and node.rhs.op == "*"

    # ^ binds tighter than unary minus: -x^2 == -(x^2)
    node = parse("-x ^ 2")
    assert isinstance(node, Unary) and node.op == "-"
    assert isinstance(node.expr, Binary) and node.expr.op == "^"

    # comparisons bind looser than arithmetic
    node = parse("a + 1 > b")
    assert node.op == ">" and node.lhs.op == "+"

    # and binds tighter than or
    node = parse("a or b and c")
    assert node.op == "or" and node.rhs.op == "and"


def test_parse_selector():
    node = parse('http_requests{series_key=~"a|b", series_key!="c"}[5m] '
                 "offset 1h")
    assert node == Selector(
        "http_requests",
        (Matcher("series_key", "=~", "a|b"),
         Matcher("series_key", "!=", "c")),
        300, 3600)
    # bare matcher-only selector
    node = parse('{series_key="a"}')
    assert node.name is None and node.matchers[0].value == "a"
    with pytest.raises(PromQLSyntaxError):
        parse("{}")


def test_parse_call_and_agg():
    node = parse("sum by (series_key) (rate(m[1h]))")
    assert isinstance(node, Agg) and node.op == "sum"
    assert node.by == ("series_key",)
    assert isinstance(node.expr, Call) and node.expr.func == "rate"
    assert node.expr.args[0].range_s == 3600

    # trailing grouping position also accepted
    node = parse("sum (m) by (series_key)")
    assert node.by == ("series_key",)

    node = parse("topk(3, m)")
    assert node.op == "topk" and node.param == Num(3.0)

    node = parse('count_values("v", m)')
    assert node.op == "count_values"


def test_parse_errors():
    for bad in ("m[", "m + ", "nosuchfn(m)", "sum(m", "m{key~\"x\"}",
                "1.2.3", "m)", "", "m[1h] extra"):
        with pytest.raises(PromQLSyntaxError):
            parse(bad)


# ---------------------------------------------------------------------------
# compile: selectors + instant vectors
# ---------------------------------------------------------------------------

def test_instant_selector(spark, samples):
    got = _collect(promql(samples, '{series_key=~"a|b|c"}', "1 hour"))
    assert got == _instant_expected()


def test_name_and_matcher_filters(spark, samples):
    got = _collect(promql(samples, "a", "1 hour"))
    assert got == _instant_expected(keys=("a",))
    got = _collect(promql(samples, '{series_key!="a"}', "1 hour"))
    assert got == _instant_expected(keys=("b", "c"))
    got = _collect(promql(samples, '{series_key!~"a|c"}', "1 hour"))
    assert got == _instant_expected(keys=("b",))


def test_offset(spark, samples):
    base = _instant_expected(keys=("a",))
    got = _collect(promql(samples, "a offset 1h", "1 hour"))
    assert got == {(k, t + timedelta(hours=1)): v for (k, t), v in
                   base.items()}
    with pytest.raises(PromQLCompileError):
        promql(samples, "a offset 90m", "1 hour")


# ---------------------------------------------------------------------------
# compile: rate family == the oracled operators
# ---------------------------------------------------------------------------

def test_rate_matches_operator(spark, samples):
    from json_time_series_extractor_spark.operators.rate import (
        rate_extrapolated,
    )
    got = _collect(promql(samples, "rate(c[1h])", "1 hour"))
    direct = {(r.series_key, r.bucket_ts): r.rate
              for r in rate_extrapolated(
                  samples.where("series_key = 'c'"), "1 hour").collect()
              if r.rate is not None}
    assert got == direct
    assert got  # non-empty: c has a >=2-sample bucket


def test_rate_requires_step_range(spark, samples):
    with pytest.raises(PromQLCompileError):
        promql(samples, "rate(c[30m])", "1 hour")
    with pytest.raises(PromQLCompileError):
        promql(samples, "rate(c)", "1 hour")


def test_resets_and_delta(spark, samples):
    got = _collect(promql(samples, "resets(c[1h])", "1 hour"))
    # c: 0,5,3,9 in hour 0 -> one negative delta
    assert got[("c", _ts(0))] == 1.0
    got = _collect(promql(samples, "delta(b[1h])", "1 hour"))
    assert got[("b", _ts(0))] == 20.0      # 30 - 10
    assert got[("b", _ts(180))] == 20.0    # 40 - 20


# ---------------------------------------------------------------------------
# compile: _over_time via RANGE frames (wall clock, not present rows)
# ---------------------------------------------------------------------------

def _over_time_expected(key, fn, k_hours):
    """brute force: for each present bucket t of `key`, aggregate raw
    samples whose bucket is within [t - (k-1)h, t]."""
    buckets = sorted({_bucket_minutes(m) for kk, m, _ in ROWS if kk == key})
    out = {}
    for b in buckets:
        vals = [v for kk, m, v in ROWS
                if kk == key and b - (k_hours - 1) * 60
                <= _bucket_minutes(m) <= b]
        out[(key, _ts(b))] = fn(vals)
    return out


def test_avg_over_time_wall_clock(spark, samples):
    got = _collect(promql(samples, "avg_over_time(b[3h])", "1 hour"))
    exp = _over_time_expected("b", lambda v: sum(v) / len(v), 3)
    assert got == pytest.approx(exp)
    # the gap matters: bucket 180 sees only hour-3 samples (20, 40) ->
    # 30.0; a PRESENT-rows trailing-3 window (rolling_over_time's
    # contract) would have included the hour-0 samples across the gap.
    assert got[("b", _ts(180))] == 30.0


def test_minmax_sum_count_last_over_time(spark, samples):
    for fn_name, fn in [("min_over_time", min), ("max_over_time", max),
                        ("sum_over_time", sum),
                        ("count_over_time", lambda v: float(len(v)))]:
        got = _collect(promql(samples, f"{fn_name}(a[2h])", "1 hour"))
        assert got == pytest.approx(_over_time_expected("a", fn, 2)), fn_name
    got = _collect(promql(samples, "last_over_time(a[2h])", "1 hour"))
    assert got[("a", _ts(120))] == 5.0


def test_over_time_requires_multiple(spark, samples):
    with pytest.raises(PromQLCompileError):
        promql(samples, "avg_over_time(a[90m])", "1 hour")


# ---------------------------------------------------------------------------
# compile: binary / set / comparison operators
# ---------------------------------------------------------------------------

def test_vector_scalar_arith(spark, samples):
    base = _instant_expected(keys=("a",))
    got = _collect(promql(samples, "a * 2 + 1", "1 hour"))
    assert got == {k: v * 2 + 1 for k, v in base.items()}
    got = _collect(promql(samples, "1 - a", "1 hour"))
    assert got == {k: 1 - v for k, v in base.items()}
    got = _collect(promql(samples, "a ^ 2", "1 hour"))
    assert got == {k: v * v for k, v in base.items()}
    got = _collect(promql(samples, "a % 2", "1 hour"))
    assert got == {k: math.fmod(v, 2) for k, v in base.items()}
    with pytest.raises(PromQLCompileError):
        promql(samples, "a ^ 0.5", "1 hour")


def test_vector_vector_join(spark, samples):
    a = _instant_expected(keys=("a",))
    b = _instant_expected(keys=("b",))
    # same series_key required for 1:1 matching -> a/a is the identity
    got = _collect(promql(samples, "a / a", "1 hour"))
    assert got == {k: 1.0 for k in a}
    # a + b matches nothing (different series_key label values)
    assert _collect(promql(samples, "a + b", "1 hour")) == {}
    assert b  # fixture sanity


def test_comparison_filter_and_bool(spark, samples):
    base = _instant_expected(keys=("a",))
    got = _collect(promql(samples, "a > 4", "1 hour"))
    assert got == {k: v for k, v in base.items() if v > 4}
    got = _collect(promql(samples, "a > bool 4", "1 hour"))
    assert got == {k: float(v > 4) for k, v in base.items()}


def test_set_ops(spark, samples):
    every = _instant_expected()
    a = {k: v for k, v in every.items() if k[0] == "a"}
    # and: keep a's rows where the >4 filter has a row
    got = _collect(promql(samples, "a and (a > 4)", "1 hour"))
    assert got == {k: v for k, v in a.items() if v > 4}
    # unless: the complement
    got = _collect(promql(samples, "a unless (a > 4)", "1 hour"))
    assert got == {k: v for k, v in a.items() if v <= 4}
    # or: left wins on overlap
    got = _collect(promql(samples, '(a * 100) or {series_key=~"a|b"}',
                          "1 hour"))
    exp = {k: v * 100 for k, v in a.items()}
    exp.update({k: v for k, v in every.items()
                if k[0] == "b" and k not in exp})
    assert got == exp


# ---------------------------------------------------------------------------
# compile: aggregations
# ---------------------------------------------------------------------------

def test_sum_by_and_global(spark, samples):
    every = _instant_expected()
    got = _collect(promql(samples, 'sum by (series_key) '
                          '({series_key=~"a|b|c"})', "1 hour"))
    assert got == every  # per-series sum of one row each == identity
    got = _collect(promql(samples, 'sum({series_key=~"a|b|c"})', "1 hour"))
    exp = {}
    for (k, t), v in every.items():
        exp[("", t)] = exp.get(("", t), 0.0) + v
    assert got == pytest.approx(exp)


def test_topk_bottomk(spark, samples):
    got = _collect(promql(samples, 'topk(1, {series_key=~"a|b"})', "1 hour"))
    every = _instant_expected(keys=("a", "b"))
    by_bucket = {}
    for (k, t), v in every.items():
        # max by (value, series_key) — the compiler's deterministic order
        cur = by_bucket.get(t)
        if cur is None or (v, k) > (cur[1], cur[0]):
            by_bucket[t] = (k, v)
    assert got == {(k, t): v for t, (k, v) in by_bucket.items()}
    got = _collect(promql(samples, 'bottomk(1, {series_key=~"a|b"})',
                          "1 hour"))
    assert all(v == min(vv for (kk, tt), vv in every.items() if tt == t)
               for (k, t), v in got.items())


def test_quantile_and_count_values(spark, samples):
    got = _collect(promql(samples, 'quantile(0.5, {series_key=~"a|b|c"})',
                          "1 hour"))
    every = _instant_expected()
    import statistics
    for (k, t), v in got.items():
        vals = [vv for (kk, tt), vv in every.items() if tt == t]
        assert v == pytest.approx(statistics.median(vals))
    got = _collect(promql(samples, 'count_values("v", '
                          '{series_key=~"a|b|c"})', "1 hour"))
    # hour 3: a=9.0 b=20.0 -> two singleton value-groups
    assert got[("9.0", _ts(180))] == 1.0


# ---------------------------------------------------------------------------
# compile: functions, unary, errors, fp6 mode
# ---------------------------------------------------------------------------

def test_simple_fns_and_unary(spark, samples):
    base = _instant_expected(keys=("a",))
    got = _collect(promql(samples, "abs(-a)", "1 hour"))
    assert got == base
    got = _collect(promql(samples, "clamp(a, 3, 6)", "1 hour"))
    assert got == {k: min(max(v, 3.0), 6.0) for k, v in base.items()}
    got = _collect(promql(samples, "clamp_min(a, 5)", "1 hour"))
    assert got == {k: max(v, 5.0) for k, v in base.items()}
    got = _collect(promql(samples, "floor(a / 2)", "1 hour"))
    assert got == {k: float(math.floor(v / 2)) for k, v in base.items()}
    got = _collect(promql(samples, "sgn(a - 4)", "1 hour"))
    assert got == {k: float((v > 4) - (v < 4)) for k, v in base.items()}


def test_compile_errors(spark, samples):
    with pytest.raises(PromQLCompileError):
        promql(samples, "1 + 2", "1 hour")          # top-level scalar
    with pytest.raises(PromQLCompileError):
        promql(samples, "a[1h]", "1 hour")          # bare range selector
    with pytest.raises(PromQLCompileError):
        promql(samples, '{nolabel="x"}', "1 hour")  # unknown label
    with pytest.raises(PromQLCompileError):
        promql(samples, "sum by (host) (a)", "1 hour")
    with pytest.raises(PromQLCompileError):
        promql(samples, "topk(0, a)", "1 hour")
    with pytest.raises(PromQLCompileError):
        promql(samples, "rate(a) + rate(a)", "1 hour")


def test_fp6_mode_exact(spark, samples):
    """fp6 cross-series mode: sum() accumulates 1e-6 ints -> the result is
    the quantized sum descaled, independent of accumulation order."""
    got = _collect(promql(samples, 'sum({series_key=~"a|b|c"})', "1 hour",
                          fp6_cross_series=True))
    every = _instant_expected()
    exp = {}
    for (k, t), v in every.items():
        exp[("", t)] = exp.get(("", t), 0) + math.floor(v * 1e6 + 0.5)
    assert got == {k: v / 1e6 for k, v in exp.items()}


def test_absent_and_absent_over_time(spark, samples):
    # b is present in hours 0 and 3 only -> hours 1, 2 are absent
    # (grid spans the series' own observed [min, max] bucket).
    got = _collect(promql(samples, "absent(b)", "1 hour"))
    assert got == {("b", _ts(60)): 1.0, ("b", _ts(120)): 1.0}
    # absent over 2h = 2 consecutive trailing absents -> only hour 2
    got = _collect(promql(samples, "absent_over_time(b[2h])", "1 hour"))
    assert got == {("b", _ts(120)): 1.0}
    # a is present every hour -> nothing absent
    assert _collect(promql(samples, "absent(a)", "1 hour")) == {}
    with pytest.raises(PromQLCompileError):
        promql(samples, "absent(b[1h])", "1 hour")


def test_histogram_quantile_lowering(spark, samples):
    from json_time_series_extractor_spark.operators.rollup import (
        histogram_quantile,
        rollup_histogram,
    )
    bounds = (2.0, 5.0, 8.0)
    got = _collect(promql(samples, "histogram_quantile(0.5, a)", "1 hour",
                          histogram_bounds={"a": bounds}))
    direct = {
        (r.series_key, r.bucket_ts): r.value
        for r in histogram_quantile(
            rollup_histogram(samples.where("series_key = 'a'"), "1 hour",
                             bounds=bounds),
            [0.5], bounds=bounds, names=("value",))
        .select("series_key", "bucket_ts", "value").collect()}
    assert got == direct and got
    with pytest.raises(PromQLCompileError):
        promql(samples, "histogram_quantile(0.5, b)", "1 hour",
               histogram_bounds={"a": bounds})
    with pytest.raises(PromQLCompileError):
        promql(samples, "histogram_quantile(a, a)", "1 hour",
               histogram_bounds={"a": bounds})


def test_subquery_parse_shapes():
    from json_time_series_extractor_spark.plans.promql import Subquery

    n = parse("max_over_time(rate(m[1h])[6h:1h])")
    assert isinstance(n, Call) and n.func == "max_over_time"
    sub = n.args[0]
    assert isinstance(sub, Subquery)
    assert sub.range_s == 21600 and sub.step_s == 3600
    assert isinstance(sub.expr, Call) and sub.expr.func == "rate"
    # default step [R:]
    sub = parse("avg_over_time(m[3h:])").args[0]
    assert sub.range_s == 10800 and sub.step_s is None
    # subquery directly over an instant selector, and over an agg/paren
    assert isinstance(parse("last_over_time(m[2h:1h])").args[0], Subquery)
    assert isinstance(parse("sum_over_time(sum(m)[2h:1h])").args[0],
                      Subquery)
    assert isinstance(parse("min_over_time((m + 1)[2h:1h])").args[0],
                      Subquery)
    with pytest.raises(PromQLSyntaxError):
        parse("max_over_time(rate(m[1h])[6h])")  # plain range on expr


def test_subquery_over_instant_vs_raw_range(spark, samples):
    """The Prometheus subquery distinction: avg_over_time(a[2h:1h])
    averages the per-bucket INSTANT values (deterministic last per
    bucket), not the raw samples — so it differs from avg_over_time
    (a[2h]) wherever a bucket holds >1 sample."""
    # instant values for a: h0->2.0 (last of 1,3,2), h1->6.0, h2->5.0,
    # h3->9.0 (last of 7,9)
    got = _collect(promql(samples, "avg_over_time(a[2h:1h])", "1 hour"))
    assert got == {("a", _ts(0)): 2.0, ("a", _ts(60)): 4.0,
                   ("a", _ts(120)): 5.5, ("a", _ts(180)): 7.0}
    raw = _collect(promql(samples, "avg_over_time(a[2h])", "1 hour"))
    assert raw[("a", _ts(60))] == (1.0 + 3.0 + 2.0 + 4.0 + 6.0) / 5
    assert got[("a", _ts(60))] != raw[("a", _ts(60))]


def test_subquery_over_computed_vector(spark, samples):
    """max_over_time(rate(c[1h])[2h:1h]) == trailing 2-bucket max of
    the already-tested rate vector."""
    rate = _collect(promql(samples, "rate(c[1h])", "1 hour"))
    got = _collect(promql(samples, "max_over_time(rate(c[1h])[2h:1h])",
                          "1 hour"))
    assert set(got) == set(rate)
    for (k, ts), v in got.items():
        prev = rate.get((k, ts - timedelta(hours=1)), -math.inf)
        assert v == max(rate[(k, ts)], prev), (k, ts)
    # gaps widen, never shrink: series b's hour-3 window reaches back
    # only 2h of WALL CLOCK, so the hour-0 instant (30.0) stays out and
    # the sum is just hour 3's own instant (40.0, the last of 20/40)
    sub = _collect(promql(samples, "sum_over_time(b[2h:1h])", "1 hour"))
    assert sub == {("b", _ts(0)): 30.0, ("b", _ts(180)): 40.0}


def test_subquery_count_last_and_default_step(spark, samples):
    got = _collect(promql(samples, "count_over_time(b[4h:])", "1 hour"))
    assert got == {("b", _ts(0)): 1.0, ("b", _ts(180)): 2.0}
    got = _collect(promql(samples, "last_over_time(b[4h:1h])", "1 hour"))
    assert got == {("b", _ts(0)): 30.0, ("b", _ts(180)): 40.0}


def test_subquery_errors(spark, samples):
    with pytest.raises(PromQLCompileError):      # step != eval step
        promql(samples, "avg_over_time(a[2h:30m])", "1 hour")
    with pytest.raises(PromQLCompileError):      # range not multiple
        promql(samples, "avg_over_time(a[90m:1h])", "1 hour")
    with pytest.raises(PromQLCompileError):      # bare subquery
        promql(samples, "a[2h:1h]", "1 hour")
    with pytest.raises(PromQLCompileError):      # rate over subquery
        promql(samples, "rate(sum(a)[2h:1h])", "1 hour")
    with pytest.raises(PromQLCompileError):      # absent over subquery
        promql(samples, "absent_over_time(sum(a)[2h:1h])", "1 hour")


def test_subquery_fp6_mode(spark, samples):
    """fp6 quantizes the inner instant values before the frame sum."""
    got = _collect(promql(samples, "sum_over_time(a[2h:1h])", "1 hour",
                          fp6_cross_series=True))
    plain = _collect(promql(samples, "sum_over_time(a[2h:1h])",
                            "1 hour"))
    assert got == plain   # exact halves: quantization is identity here


def test_tier_routing_serves_from_materialized_tiers(spark, samples):
    """With a materialized tier declared, instant/_over_time/absent
    queries must NOT read raw samples: raw is passed EMPTY, so any
    answer at all proves routing, and the values must equal the
    from-raw evaluation. Covers the exact-step tier, the cascade from a
    finer dividing tier, matchers, offset, subqueries, and the raw-only
    rate family falling back."""
    from json_time_series_extractor_spark.operators.rollup import rollup

    empty = spark.createDataFrame(
        [], "series_key string, ts timestamp, value_double double")
    t1m = rollup(samples, "1 minute", deterministic_last=True)
    t1h = rollup(samples, "1 hour", deterministic_last=True)
    for tiers in ({"1 hour": t1h}, {"1 minute": t1m},
                  {"1 minute": t1m, "1 hour": t1h}):
        for q in ("a", "max_over_time({series_key=~\"a|b\"}[2h])",
                  "count_over_time(b[3h])", "absent(b)",
                  "last_over_time(a[2h] offset 1h)",
                  "topk(1, max_over_time({series_key=~\".+\"}[2h]))",
                  "max_over_time(sum(a)[3h:1h])"):
            want = _collect(promql(samples, q, "1 hour"))
            got = _collect(promql(empty, q, "1 hour", tiers=tiers))
            assert got == want and want, (tiers.keys(), q)
    # rate always reads raw: with empty raw it yields nothing even
    # though a tier is declared
    assert _collect(promql(empty, "rate(c[1h])", "1 hour",
                           tiers={"1 hour": t1h})) == {}
    # a coarser-than-step tier cannot serve and raw is used
    t1d = rollup(samples, "1 day", deterministic_last=True)
    assert _collect(promql(samples, "a", "1 hour",
                           tiers={"1 day": t1d})) == \
        _collect(promql(samples, "a", "1 hour"))


def test_compiler_instance_reuse(spark, samples):
    c = PromQLCompiler(samples, "1 hour")
    a = _collect(c.compile("a"))
    b = _collect(c.compile(parse("a * 1")))
    assert a == b
