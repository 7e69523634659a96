"""PromQL-subset query frontend: parse -> AST -> compile onto the engine.

The reference library has no query language — its ``TimeSeriesExtractorOptions``
object IS its query surface (``/root/reference/src/JsonTimeSeriesExtractor/
TimeSeriesExtractorOptions.cs:13-410``). This module gives the rollup engine a
real one: a hand-rolled recursive-descent parser for a documented subset of
PromQL (the lingua franca of time-series querying) and a compiler that lowers
every expression onto the operators this engine already oracles — the rate
family (``operators/rate.py``), tier rollups (``operators/rollup.py``) and
pure Column arithmetic. Nothing here executes Python per row: every compiled
plan is stock Catalyst (hash aggregates, bounded windows, equi-joins).

Evaluation model (the documented deviation from Prometheus)
-----------------------------------------------------------
Prometheus evaluates an instant vector at arbitrary step timestamps with a
sliding range window. A batch engine over 10^12 documents evaluates on the
TUMBLING bucket grid instead:

- every vector lives on the ``step`` grid: one row per (series_key,
  bucket_ts) where bucket_ts is the epoch-aligned tumbling-window start;
- a plain selector's instant value at a bucket is the LAST raw sample inside
  that bucket (deterministic tie-break by value — ``rollup`` semantics);
  there is no staleness lookback carry: absent buckets are absent rows
  (``gapfill_locf_stale`` is this engine's materialization of the PromQL
  5m-lookback rule when a carried grid is wanted);
- ``<fn>_over_time(sel[R])`` requires R = k*step and aggregates the trailing
  R of WALL CLOCK via a RANGE frame over the per-step rollup partials —
  mergeable-state re-aggregation (sum of sums, min of mins), never a rescan
  of raw samples;
- the rate family (``rate``/``increase``/``irate``/``delta``/``resets``/
  ``changes``) requires R == step and evaluates per tumbling R bucket —
  exactly the engine's oracled per-bucket operators. ``rate``/``increase``
  use the full Prometheus boundary extrapolation
  (:func:`~..operators.rate.rate_extrapolated`);
- tier routing: pass ``tiers={'1 minute': rollup(...)}`` and instant /
  ``*_over_time`` / ``absent*`` selectors serve from the materialized
  tier (exact-step, or a cascade from the coarsest dividing tier)
  instead of rescanning raw samples — the 100 TB read path; the rate
  family and ``histogram_quantile`` always read raw (per-sample facts);
- subqueries ``expr[R:S]`` (S must equal the evaluation step; ``[R:]``
  defaults it): the inner expression evaluates on the step grid and the
  outer ``*_over_time`` re-aggregates its INSTANT values over a trailing
  wall-clock RANGE frame — e.g. ``max_over_time(rate(m[1h])[6h:1h])``;
  output rows exist only at the inner vector's present buckets;
- ``absent(m)`` / ``absent_over_time(m[R])`` lower onto
  :func:`~..operators.gapfill.absent_buckets` (grid bounded by each
  series' own observed span); ``histogram_quantile(phi, m)`` lowers onto
  the mergeable histogram tier using per-metric declared bin bounds
  (``histogram_bounds={name: (b0, ...)}``), the engine's analog of
  Prometheus' per-metric ``le`` bucket layout.

Label model: the engine's series identity is the single ``series_key``
column, so that is the one label. A bare metric name matches it exactly;
``{series_key=~"..."}`` matchers give =, !=, =~, !~ (regexes are fully
anchored, as in PromQL).

Scale shape of every lowering:
- selector            -> one hash aggregate (the step rollup);
- _over_time          -> + one bounded RANGE window over TIER rows (one row
                        per bucket — summary-sized partitions, never raw);
- rate family         -> the oracled operators' own shapes (bucket-bounded
                        lag windows + one hash agg);
- vector (op) vector  -> one equi-join on (series_key, bucket_ts);
- and/or/unless       -> left-semi / union-anti / left-anti equi-joins;
- sum/avg/... by ()   -> one hash aggregate per bucket;
- topk/bottomk        -> per-BUCKET bounded rank window (never global);
- scalar arithmetic   -> pure Column expressions (whole-stage codegen).

Cross-engine exactness: pass ``fp6_cross_series=True`` to quantize values to
1e-6 integers BEFORE any cross-series float accumulation (sum/avg/quantile),
the repo-wide oracle doctrine (quantize-then-sum keeps DuckDB and Spark
bit-identical regardless of accumulation order); identity-preserving
aggregates (min/max/count/topk/bool) never need it. ``x ^ n`` with a
non-negative integer literal exponent lowers to chained multiplication (an
exact IEEE shape both engines share); non-integer exponents are rejected
rather than silently diverging across libm implementations.
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field
from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..operators.gapfill import _interval_seconds
from ..operators.rate import (
    counter_irate,
    counter_resets,
    gauge_changes,
    gauge_delta,
    rate_extrapolated,
)
from ..operators.rollup import rollup, rollup_cascade


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

#: PromQL duration: 1h, 90m, 1d, 2w, 30s (single unit; compounds like
#: "1h30m" are rejected — keep the accepted grammar explicit).
_DURATION_RE = re.compile(r"^(\d+)(ms|s|m|h|d|w|y)$")

_DURATION_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400,
                     "w": 604800, "y": 31536000}


def duration_seconds(text: str) -> int:
    """'90m' -> 5400. Raises on 'ms' (sub-second grids are out of scope
    for a batch tier engine) and on malformed durations."""
    m = _DURATION_RE.match(text)
    if not m or m.group(2) == "ms":
        raise PromQLSyntaxError(f"bad duration {text!r}")
    return int(m.group(1)) * _DURATION_SECONDS[m.group(2)]


@dataclass(frozen=True)
class Token:
    kind: str          # NUM IDENT STRING DUR OP LPAREN RPAREN LBRACE ...
    text: str
    pos: int


class PromQLSyntaxError(ValueError):
    pass


_TOKEN_SPEC = [
    ("WS", r"\s+"),
    ("NUM", r"(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"),
    ("STRING", r'"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\''),
    ("IDENT", r"[A-Za-z_:][A-Za-z0-9_:]*"),
    ("OP", r"=~|!~|==|!=|>=|<=|[-+*/%^><=]"),
    ("LPAREN", r"\("), ("RPAREN", r"\)"),
    ("LBRACE", r"\{"), ("RBRACE", r"\}"),
    ("LBRACK", r"\["), ("RBRACK", r"\]"),
    ("COMMA", r","),
]
_TOKEN_RE = re.compile("|".join(f"(?P<{k}>{p})" for k, p in _TOKEN_SPEC))


def tokenize(src: str) -> list[Token]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise PromQLSyntaxError(f"unexpected character {src[i]!r} at {i}")
        kind = m.lastgroup
        if kind != "WS":
            text = m.group()
            # a NUM immediately followed by a duration unit inside [...] is
            # re-lexed by the parser; the lexer stays context-free.
            out.append(Token(kind, text, i))
        i = m.end()
    out.append(Token("EOF", "", len(src)))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Num:
    value: float


@dataclass(frozen=True)
class Matcher:
    label: str
    op: str            # = != =~ !~
    value: str


@dataclass(frozen=True)
class Selector:
    name: Optional[str]
    matchers: tuple = ()
    range_s: Optional[int] = None      # [R] in seconds
    offset_s: int = 0


@dataclass(frozen=True)
class Subquery:
    """``expr[R:S]`` — evaluate ``expr`` per step bucket, expose the
    per-bucket instant values as a range vector of R wall-clock.
    ``step_s=None`` means the default (the compiler's evaluation
    step), i.e. ``expr[R:]``."""
    expr: "Node"
    range_s: int
    step_s: Optional[int] = None


@dataclass(frozen=True)
class Call:
    func: str
    args: tuple


@dataclass(frozen=True)
class Agg:
    op: str                            # sum min max avg count topk ...
    expr: "Node"
    param: Optional["Node"] = None     # k for topk, phi for quantile
    by: Optional[tuple] = None         # None = drop all labels
    without: Optional[tuple] = None


@dataclass(frozen=True)
class Binary:
    op: str
    lhs: "Node"
    rhs: "Node"
    bool_mod: bool = False


@dataclass(frozen=True)
class Unary:
    op: str
    expr: "Node"


Node = Union[Num, Selector, Subquery, Call, Agg, Binary, Unary]

_AGG_OPS = {"sum", "min", "max", "avg", "count", "topk", "bottomk",
            "quantile", "count_values"}
_PARAM_AGGS = {"topk", "bottomk", "quantile", "count_values"}

#: range-vector functions -> lowering kind
_RANGE_FNS = {"rate", "increase", "irate", "delta", "resets", "changes",
              "avg_over_time", "min_over_time", "max_over_time",
              "sum_over_time", "count_over_time", "last_over_time",
              "absent_over_time"}

#: instant-vector scalar-shape functions (pure Column lowerings)
_SIMPLE_FNS = {"abs", "ceil", "floor", "sgn", "clamp", "clamp_min",
               "clamp_max"}

#: functions with bespoke lowerings onto engine operators
_SPECIAL_FNS = {"histogram_quantile", "absent"}

_CMP_OPS = {"==", "!=", ">", "<", ">=", "<="}
_SET_OPS = {"and", "or", "unless"}


class Parser:
    """Recursive descent with PromQL's precedence ladder:
    ``^`` (right-assoc, tighter than unary) > unary ``-`` > ``* / %`` >
    ``+ -`` > comparisons > ``and``/``unless`` > ``or``."""

    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers ----------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: Optional[str] = None) -> Token:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise PromQLSyntaxError(
                f"expected {text or kind}, got {t.text!r} at {t.pos}")
        return t

    def accept(self, kind: str, text: Optional[str] = None) -> Optional[Token]:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    # -- grammar ----------------------------------------------------------
    def parse(self) -> Node:
        node = self.or_expr()
        t = self.peek()
        if t.kind != "EOF":
            raise PromQLSyntaxError(f"trailing input {t.text!r} at {t.pos}")
        return node

    def or_expr(self) -> Node:
        node = self.and_expr()
        while self.peek().kind == "IDENT" and self.peek().text == "or":
            self.next()
            node = Binary("or", node, self.and_expr())
        return node

    def and_expr(self) -> Node:
        node = self.cmp_expr()
        while (self.peek().kind == "IDENT"
               and self.peek().text in ("and", "unless")):
            op = self.next().text
            node = Binary(op, node, self.cmp_expr())
        return node

    def cmp_expr(self) -> Node:
        node = self.add_expr()
        while self.peek().kind == "OP" and self.peek().text in _CMP_OPS:
            op = self.next().text
            bool_mod = bool(self.accept("IDENT", "bool"))
            node = Binary(op, node, self.add_expr(), bool_mod)
        return node

    def add_expr(self) -> Node:
        node = self.mul_expr()
        while self.peek().kind == "OP" and self.peek().text in ("+", "-"):
            op = self.next().text
            node = Binary(op, node, self.mul_expr())
        return node

    def mul_expr(self) -> Node:
        node = self.unary()
        while self.peek().kind == "OP" and self.peek().text in ("*", "/", "%"):
            op = self.next().text
            node = Binary(op, node, self.unary())
        return node

    def unary(self) -> Node:
        if self.peek().kind == "OP" and self.peek().text == "-":
            self.next()
            return Unary("-", self.unary())
        return self.pow_expr()

    def pow_expr(self) -> Node:
        node = self.atom()
        if self.peek().kind == "OP" and self.peek().text == "^":
            self.next()
            # right-assoc; ^ binds tighter than unary minus (PromQL):
            # -x^2 parses as -(x^2) because unary() recurses above atom.
            node = Binary("^", node, self.unary())
        return node

    def atom(self) -> Node:
        t = self.peek()
        if t.kind == "NUM":
            self.next()
            return Num(float(t.text))
        if t.kind == "LPAREN":
            self.next()
            node = self.or_expr()
            self.expect("RPAREN")
            return self._maybe_postfix_subquery(node)
        if t.kind == "LBRACE":
            return self.selector(None)
        if t.kind == "IDENT":
            name = self.next().text
            if name in _AGG_OPS:
                return self._maybe_postfix_subquery(self.agg_expr(name))
            if self.peek().kind == "LPAREN":
                return self._maybe_postfix_subquery(self.func_call(name))
            return self.selector(name)
        raise PromQLSyntaxError(f"unexpected {t.text!r} at {t.pos}")

    def _bracket_range(self):
        """Inside ``[...]``: ``1h`` -> (3600, None, False);
        ``1h:5m`` / ``1h:`` -> (3600, step|None, True). The lexer is
        context-free, so ``h:5m`` arrives as ONE ident — split it here
        (the re-lex the tokenizer comment promises)."""
        num = self.expect("NUM").text
        unit = self.expect("IDENT").text
        if ":" in unit:
            u, _, rest = unit.partition(":")
            rng = duration_seconds(num + u)
            step = duration_seconds(rest) if rest else None
            self.expect("RBRACK")
            return rng, step, True
        self.expect("RBRACK")
        return duration_seconds(num + unit), None, False

    def _maybe_postfix_subquery(self, node: Node) -> Node:
        """``(expr)[R:S]`` / ``fn(...)[R:S]`` / ``agg(...)[R:S]`` —
        a bracket after a non-selector expression must be a subquery
        (plain ranges attach to selectors only)."""
        if self.peek().kind != "LBRACK":
            return node
        pos = self.next().pos
        rng, step, is_sub = self._bracket_range()
        if not is_sub:
            raise PromQLSyntaxError(
                f"plain range at {pos} attaches to a selector; a range "
                f"over an expression needs a subquery [R:S]")
        return Subquery(node, rng, step)

    def func_call(self, name: str) -> Node:
        if (name not in _RANGE_FNS and name not in _SIMPLE_FNS
                and name not in _SPECIAL_FNS):
            raise PromQLSyntaxError(f"unknown function {name!r}")
        self.expect("LPAREN")
        args = [self.or_expr()]
        while self.accept("COMMA"):
            args.append(self.or_expr())
        self.expect("RPAREN")
        return Call(name, tuple(args))

    def agg_expr(self, op: str) -> Node:
        by = without = None
        if self.peek().kind == "IDENT" and self.peek().text in ("by",
                                                                "without"):
            by, without = self.grouping()
        self.expect("LPAREN")
        param = None
        if op == "count_values":
            # count_values("label", expr) — the label name is parsed and
            # checked but the engine's one output label is series_key.
            s = self.expect("STRING").text
            param = Num(0.0)
            self._count_values_label = s[1:-1]
            self.expect("COMMA")
        elif op in _PARAM_AGGS:
            param = self.or_expr()
            self.expect("COMMA")
        expr = self.or_expr()
        self.expect("RPAREN")
        if by is None and without is None and self.peek().kind == "IDENT" \
                and self.peek().text in ("by", "without"):
            by, without = self.grouping()
        return Agg(op, expr, param, by, without)

    def grouping(self):
        word = self.next().text
        self.expect("LPAREN")
        labels = []
        if self.peek().kind == "IDENT":
            labels.append(self.next().text)
            while self.accept("COMMA"):
                labels.append(self.expect("IDENT").text)
        self.expect("RPAREN")
        if word == "by":
            return tuple(labels), None
        return None, tuple(labels)

    def selector(self, name: Optional[str]) -> Node:
        matchers = []
        if self.accept("LBRACE"):
            if self.peek().kind != "RBRACE":
                matchers.append(self.matcher())
                while self.accept("COMMA"):
                    matchers.append(self.matcher())
            self.expect("RBRACE")
        if name is None and not matchers:
            raise PromQLSyntaxError("selector needs a name or matchers")
        range_s = None
        sub = None
        if self.accept("LBRACK"):
            rng, step, is_sub = self._bracket_range()
            if is_sub:
                sub = (rng, step)           # m[R:S] — subquery over m
            else:
                range_s = rng
        offset_s = 0
        if self.peek().kind == "IDENT" and self.peek().text == "offset":
            self.next()
            offset_s = duration_seconds(self.duration_text())
        node = Selector(name, tuple(matchers), range_s, offset_s)
        if sub is not None:
            # offset on the inner selector == offset on the subquery:
            # shifting the data shifts every trailing window identically.
            return Subquery(node, sub[0], sub[1])
        return node

    def duration_text(self) -> str:
        """Durations lex as NUM + IDENT ('1' 'h'); re-join them."""
        num = self.expect("NUM").text
        unit = self.expect("IDENT").text
        return num + unit

    def matcher(self) -> Matcher:
        label = self.expect("IDENT").text
        t = self.next()
        if t.kind != "OP" or t.text not in ("=", "!=", "=~", "!~"):
            raise PromQLSyntaxError(f"bad matcher op {t.text!r} at {t.pos}")
        s = self.expect("STRING").text
        raw = s[1:-1]
        # r8 (ADVICE): decode ONLY the escape sequences — the previous
        # encode()/decode('unicode_escape') round-trip latin-1-mangled
        # any non-ASCII label value (e.g. {series_key="café"}). Each
        # escape pair is pure ASCII, so decoding it in isolation is
        # safe and identical to the old behavior for ASCII strings.
        if "\\" in raw:
            import codecs
            value = re.sub(
                r"\\(?:u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}"
                r"|x[0-9a-fA-F]{2}|.)",
                lambda m: codecs.decode(m.group(0), "unicode_escape"),
                raw)
        else:
            value = raw
        return Matcher(label, t.text, value)


def parse(src: str) -> Node:
    """Parse one PromQL expression into the AST."""
    return Parser(src).parse()


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------

@dataclass
class _Vec:
    """A compiled instant vector: DataFrame(series_key, bucket_ts, value)."""
    df: DataFrame


_Scalar = float


class PromQLCompileError(ValueError):
    pass


class PromQLCompiler:
    """Lower an AST onto a raw-sample DataFrame.

    Parameters
    ----------
    samples : DataFrame with (key_col, ts_col, value_col) — the engine's
        canonical raw sample stream (e.g. the extraction output).
    step : the evaluation grid, e.g. '1 hour'. Every vector in the query
        lives on this tumbling grid (module docstring).
    fp6_cross_series : quantize to 1e-6 integers before cross-series float
        accumulation (sum/avg/quantile) so a SQL oracle replays the value
        bit-for-bit regardless of accumulation order.
    """

    def __init__(self, samples: DataFrame, step: str = "1 hour", *,
                 key_col: str = "series_key", ts_col: str = "ts",
                 value_col: str = "value_double",
                 fp6_cross_series: bool = False,
                 histogram_bounds: Optional[dict] = None,
                 tiers: Optional[dict] = None):
        self.samples = samples
        self.step = step
        self.step_s = _interval_seconds(step)
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        self.fp6 = fp6_cross_series
        #: metric name -> explicit histogram bin bounds; a
        #: histogram_quantile() over that name lowers onto the mergeable
        #: histogram tier (this engine declares bins per metric, the
        #: analog of Prometheus' per-metric `le` bucket layout).
        self.histogram_bounds = dict(histogram_bounds or {})
        #: {interval spec: materialized rollup() tier DataFrame (built
        #: with deterministic_last=True)} — instant/_over_time/absent
        #: selectors serve from these instead of rescanning raw samples
        #: (see :meth:`_routed_tier`).
        self.tiers = {_interval_seconds(k): v
                      for k, v in (tiers or {}).items()}

    # -- public -----------------------------------------------------------
    def compile(self, node_or_src: Union[Node, str]) -> DataFrame:
        node = (parse(node_or_src) if isinstance(node_or_src, str)
                else node_or_src)
        out = self._eval(node)
        if isinstance(out, _Scalar):
            raise PromQLCompileError(
                "top-level expression is a scalar; query a vector")
        return out.df.select("series_key", "bucket_ts", "value")

    # -- selector lowering --------------------------------------------------
    def _apply_matchers(self, df: DataFrame, sel: Selector,
                        key: Column) -> DataFrame:
        if sel.name is not None:
            df = df.where(key == sel.name)
        for m in sel.matchers:
            if m.label != self.key_col and m.label != "__name__":
                raise PromQLCompileError(
                    f"unknown label {m.label!r}; the engine's one label is "
                    f"{self.key_col!r}")
            if m.op == "=":
                df = df.where(key == m.value)
            elif m.op == "!=":
                df = df.where(key != m.value)
            elif m.op == "=~":
                df = df.where(key.rlike(f"^(?:{m.value})$"))
            else:
                df = df.where(~key.rlike(f"^(?:{m.value})$"))
        return df

    def _matcher_filter(self, sel: Selector) -> DataFrame:
        df = self._apply_matchers(self.samples, sel, F.col(self.key_col))
        if sel.offset_s:
            if sel.offset_s % self.step_s:
                raise PromQLCompileError(
                    f"offset {sel.offset_s}s must be a multiple of the "
                    f"step {self.step_s}s (tumbling-grid evaluation)")
            # `m offset D` at bucket t reads samples from t - D: shift the
            # sample timestamps forward by D before bucketing. Integer
            # micros end to end (r8, ADVICE): the double round-trip sat
            # at the edge of 2^53 for ~1.7e9s timestamps with microsecond
            # fractions and could land a sample one bucket off.
            df = df.withColumn(
                self.ts_col,
                F.timestamp_micros(
                    F.unix_micros(F.col(self.ts_col).cast("timestamp"))
                    + F.lit(int(sel.offset_s) * 1_000_000)))
        return df

    def _routed_tier(self, sel: Selector, tier: str) -> Optional[DataFrame]:
        """Tier routing: serve the per-step partials from a materialized
        rollup tier — the exact-step tier when declared, else a
        :func:`~..operators.rollup.rollup_cascade` from the COARSEST
        dividing tier (fewest rows rescanned) — instead of rescanning
        raw samples. At 100 TB this is the difference between reading
        the tiny 1h tier and reading all raw history; filters and the
        cascade are one pruned scan + at most one hash aggregate.

        Scope: instant selectors, the ``*_over_time`` family and
        ``absent*`` route; the rate family and ``histogram_quantile``
        always read raw samples (boundary extrapolation and bin
        assignment are per-sample facts a min/max/sum/last tier cannot
        carry). min/max/count/last are bit-exact under cascading;
        sum/avg re-accumulate in a different order (the same ulp caveat
        as any re-partitioned double sum). Tiers must be built with
        ``deterministic_last=True`` so exact-ts ties stay stable."""
        t_s = _interval_seconds(tier)
        if t_s in self.tiers:
            src_s = t_s
        else:
            divs = [s for s in self.tiers if t_s % s == 0 and s < t_s]
            if not divs:
                return None
            src_s = max(divs)
        df = self._apply_matchers(self.tiers[src_s], sel,
                                  F.col("series_key"))
        if sel.offset_s:
            if sel.offset_s % self.step_s:
                raise PromQLCompileError(
                    f"offset {sel.offset_s}s must be a multiple of the "
                    f"step {self.step_s}s (tumbling-grid evaluation)")
            # offset is a multiple of the step, hence of every dividing
            # tier's width — the shifted buckets stay grid-aligned.
            # integer micros, same rationale as the raw-sample path (r8)
            df = df.withColumn(
                "bucket_ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("bucket_ts"))
                    + F.lit(int(sel.offset_s) * 1_000_000)))
        if src_s != t_s:
            df = rollup_cascade(df, tier)
        return df

    def _rollup(self, sel: Selector, tier: str) -> DataFrame:
        routed = self._routed_tier(sel, tier)
        if routed is not None:
            return routed
        return rollup(self._matcher_filter(sel), tier,
                      key_col=self.key_col, ts_col=self.ts_col,
                      value_col=self.value_col, deterministic_last=True)

    def _instant(self, sel: Selector) -> _Vec:
        if sel.range_s is not None:
            raise PromQLCompileError(
                "range selector outside a range function")
        r = self._rollup(sel, self.step)
        return _Vec(r.select("series_key", "bucket_ts",
                             F.col("last").alias("value")))

    # -- range-function lowering --------------------------------------------
    def _range_fn(self, fn: str, sel: Selector) -> _Vec:
        if sel.range_s is None:
            raise PromQLCompileError(f"{fn}() needs a range selector m[R]")
        filtered = self._matcher_filter(sel)
        if fn.endswith("_over_time"):
            if sel.range_s % self.step_s:
                raise PromQLCompileError(
                    f"{fn}: range {sel.range_s}s must be a multiple of "
                    f"step {self.step_s}s")
            k = sel.range_s // self.step_s
            if fn == "absent_over_time":
                return self._absent(sel, k)
            return self._over_time(fn[:-len("_over_time")],
                                   self._rollup(sel, self.step), k)
        if sel.range_s != self.step_s:
            raise PromQLCompileError(
                f"{fn}: tumbling evaluation requires range == step "
                f"({sel.range_s}s != {self.step_s}s); change the step or "
                f"use {fn}(...)_over_time smoothing")
        kw = dict(key_col=self.key_col, ts_col=self.ts_col,
                  value_col=self.value_col)
        if fn == "rate":
            out = rate_extrapolated(filtered, self.step, **kw) \
                .select("series_key", "bucket_ts", F.col("rate").alias("value"))
        elif fn == "increase":
            out = rate_extrapolated(filtered, self.step, **kw) \
                .select("series_key", "bucket_ts",
                        F.col("extrapolated").alias("value"))
        elif fn == "irate":
            out = counter_irate(filtered, self.step, **kw) \
                .select("series_key", "bucket_ts",
                        F.col("irate").alias("value"))
        elif fn == "delta":
            out = gauge_delta(filtered, self.step, **kw) \
                .select("series_key", "bucket_ts",
                        F.col("delta").alias("value"))
        elif fn == "resets":
            out = counter_resets(filtered, self.step, **kw) \
                .select("series_key", "bucket_ts",
                        F.col("resets").cast("double").alias("value"))
        elif fn == "changes":
            out = gauge_changes(filtered, self.step, **kw) \
                .select("series_key", "bucket_ts",
                        F.col("changes").cast("double").alias("value"))
        else:  # pragma: no cover — parser gates the name set
            raise PromQLCompileError(f"unhandled range function {fn}")
        return _Vec(out.where(F.col("value").isNotNull()))

    def _over_time(self, agg: str, tier_df: DataFrame, k: int) -> _Vec:
        """Trailing R = k*step of WALL CLOCK via a RANGE frame over the
        per-step rollup partials — mergeable re-aggregation, never a raw
        rescan. The frame is on epoch seconds so data gaps widen the
        window (they never shrink it to k present rows — that is
        ``rolling_over_time``'s PRESENT-rows contract, a different tool)."""
        epoch = F.unix_micros(F.col("bucket_ts").cast("timestamp")) / 1_000_000
        w = (Window.partitionBy("series_key").orderBy(epoch.cast("long"))
             .rangeBetween(-(k - 1) * self.step_s, 0))
        # in fp6 mode the per-bucket float sum (a hash aggregate — the one
        # accumulation-order-divergent step) is quantized to a 1e-6 int
        # BEFORE the frame accumulates it; the frame then sums longs and a
        # single double division / descale follows — bit-identical both
        # engines.
        part_sum = (self._fp6_int(F.col("sum")) if self.fp6
                    else F.col("sum"))
        if agg == "avg":
            val = F.sum(part_sum).over(w) / F.sum("count").over(w)
            if self.fp6:
                val = val / F.lit(1e6)
        elif agg == "min":
            val = F.min("min").over(w)
        elif agg == "max":
            val = F.max("max").over(w)
        elif agg == "sum":
            val = F.sum(part_sum).over(w)
            if self.fp6:
                val = val.cast("double") / F.lit(1e6)
        elif agg == "count":
            val = F.sum("count").over(w).cast("double")
        elif agg == "last":
            val = F.max(F.struct(F.col("last_ts").alias("t"),
                                 F.col("last").alias("v"))).over(w)["v"]
        else:  # pragma: no cover
            raise PromQLCompileError(f"unhandled over_time agg {agg}")
        return _Vec(tier_df.select("series_key", "bucket_ts",
                                   val.alias("value")))

    def _subquery_fn(self, fn: str, sub: Subquery) -> _Vec:
        """``fn_over_time(expr[R:S])``: evaluate the inner expression on
        its own grid (S must equal the evaluation step — tumbling-grid
        rule), then re-aggregate the inner INSTANT values over the
        trailing R of wall clock. Mirrors Prometheus' subquery
        semantics: the outer function sees one value per inner
        evaluation step, NOT the raw samples —
        ``avg_over_time(m[3h:1h])`` averages 3 per-bucket instant reads
        where ``avg_over_time(m[3h])`` averages every raw sample.
        Documented deviation: output rows exist only at buckets where
        the inner vector has a row (the engine has no external eval
        grid to place results on empty buckets)."""
        if not fn.endswith("_over_time") or fn == "absent_over_time":
            raise PromQLCompileError(
                f"{fn} over a subquery is not supported (only the "
                f"*_over_time re-aggregations lower onto a computed "
                f"vector; absent_over_time needs the selector's gap "
                f"machinery)")
        step_s = self.step_s if sub.step_s is None else sub.step_s
        if step_s != self.step_s:
            raise PromQLCompileError(
                f"subquery step {step_s}s must equal the evaluation "
                f"step {self.step_s}s (tumbling-grid evaluation)")
        if sub.range_s % self.step_s:
            raise PromQLCompileError(
                f"subquery range {sub.range_s}s must be a multiple of "
                f"the step {self.step_s}s")
        k = sub.range_s // self.step_s
        inner = self._expect_vec(sub.expr, "subquery")
        agg = fn[:-len("_over_time")]
        epoch = (F.unix_micros(F.col("bucket_ts").cast("timestamp"))
                 / 1_000_000)
        w = (Window.partitionBy("series_key").orderBy(epoch.cast("long"))
             .rangeBetween(-(k - 1) * self.step_s, 0))
        v = F.col("value")
        vq = self._fp6_int(v) if self.fp6 else v
        if agg == "avg":
            val = (F.sum(vq).over(w).cast("double")
                   / F.count(v).over(w))
            if self.fp6:
                val = val / F.lit(1e6)
        elif agg == "min":
            val = F.min(v).over(w)
        elif agg == "max":
            val = F.max(v).over(w)
        elif agg == "sum":
            val = F.sum(vq).over(w).cast("double")
            if self.fp6:
                val = val / F.lit(1e6)
        elif agg == "count":
            val = F.count(v).over(w).cast("double")
        elif agg == "last":
            val = F.max(F.struct(F.col("bucket_ts").alias("t"),
                                 v.alias("v"))).over(w)["v"]
        else:  # pragma: no cover — gated by _RANGE_FNS + the guard above
            raise PromQLCompileError(f"unhandled over_time agg {agg}")
        return _Vec(inner.df.select("series_key", "bucket_ts",
                                    val.alias("value")))

    def _absent(self, sel: Selector, k: int) -> _Vec:
        """``absent_over_time(m[R])`` / ``absent(m)`` (k=1): emit 1 for
        each grid bucket whose trailing k buckets contain NO sample of
        the series. Lowers onto :func:`~..operators.gapfill.
        absent_buckets`: absent runs are maximal, so "k consecutive
        trailing absents" is exactly ``gap_pos >= k`` inside a run. The
        grid spans each series' own observed [min, max] bucket (the
        engine's gap-fill convention — leading/trailing absence is
        undefined without an external series roster, a documented
        deviation from Prometheus' label-less absent())."""
        from ..operators.gapfill import absent_buckets

        gaps = absent_buckets(self._rollup(sel, self.step), self.step)
        return _Vec(gaps.where(F.col("gap_pos") >= k)
                    .select("series_key", "bucket_ts",
                            F.lit(1.0).alias("value")))

    def _histogram_quantile(self, phi: float, sel: Selector) -> _Vec:
        """Lower onto the mergeable histogram tier: bin the samples at
        step granularity with the metric's declared bounds, then the
        engine's oracled interpolation (first/last-bin clamps, NULL on
        empty) — quantiles without per-bucket raw-data sorts."""
        from ..operators.rollup import histogram_quantile, rollup_histogram

        if sel.range_s is not None:
            raise PromQLCompileError(
                "histogram_quantile() takes an instant selector")
        name = sel.name
        if name not in self.histogram_bounds:
            raise PromQLCompileError(
                f"histogram_quantile: no declared bin bounds for "
                f"{name!r}; pass histogram_bounds={{name: (b0, b1, ...)}}")
        hist = rollup_histogram(self._matcher_filter(sel), self.step,
                                bounds=self.histogram_bounds[name],
                                key_col=self.key_col, ts_col=self.ts_col,
                                value_col=self.value_col)
        out = histogram_quantile(hist, [phi],
                                 bounds=self.histogram_bounds[name],
                                 names=("value",))
        return _Vec(out.select("series_key", "bucket_ts", "value"))

    # -- aggregation lowering -------------------------------------------------
    def _fp6_int(self, c: Column) -> Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    def _agg(self, node: Agg) -> _Vec:
        vec = self._expect_vec(node.expr, f"{node.op}()")
        df = vec.df
        if node.without is not None:
            keep = tuple(l for l in ("series_key",) if l not in node.without)
        else:
            keep = node.by or ()
        for l in keep:
            if l != "series_key":
                raise PromQLCompileError(
                    f"unknown grouping label {l!r}; the engine's one label "
                    f"is 'series_key'")
        group = ["bucket_ts"] + (["series_key"] if "series_key" in keep
                                 else [])
        out_key = (F.col("series_key") if "series_key" in keep
                   else F.lit("").alias("series_key"))

        if node.op in ("sum", "avg", "quantile") and self.fp6:
            # quantize-then-accumulate: cross-series float accumulation is
            # the one order-divergent step; on 1e-6 ints both engines agree
            # bit-for-bit, and int/1e6 -> double is the same IEEE op twice.
            df = df.withColumn("value", self._fp6_int(F.col("value")))
            post = lambda c: (c.cast("double") / F.lit(1e6))  # noqa: E731
        else:
            post = lambda c: c  # noqa: E731

        if node.op in ("sum", "min", "max", "avg", "count"):
            fn = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg,
                  "count": F.count}[node.op]
            val = fn(F.col("value"))
            if node.op == "count":
                val = val.cast("double")
                post = lambda c: c  # noqa: E731
            if node.op == "avg" and self.fp6:
                # exact int sum, ONE double division, then the 1e-6 descale
                val = (F.sum("value").cast("double")
                       / F.count("value").cast("double"))
            agg = df.groupBy(*group).agg(post(val).alias("value"))
            if "series_key" not in group:
                agg = agg.select(out_key, "bucket_ts", "value")
            return _Vec(agg.select("series_key", "bucket_ts", "value"))

        if node.op == "quantile":
            phi = self._expect_scalar(node.param, "quantile() phi")
            val = post(F.percentile(F.col("value"), F.lit(phi)))
            agg = df.groupBy(*group).agg(val.alias("value"))
            if "series_key" not in group:
                agg = agg.select(out_key, "bucket_ts", "value")
            return _Vec(agg.select("series_key", "bucket_ts", "value"))

        if node.op in ("topk", "bottomk"):
            k = int(self._expect_scalar(node.param, f"{node.op}() k"))
            if k < 1:
                raise PromQLCompileError(f"{node.op}: k must be >= 1")
            order = (F.col("value").desc() if node.op == "topk"
                     else F.col("value").asc())
            # per-BUCKET bounded rank window; series_key tie-break keeps the
            # result deterministic (PromQL's topk ties are unspecified).
            w = Window.partitionBy("bucket_ts").orderBy(order, "series_key")
            ranked = df.withColumn("_rk", F.row_number().over(w))
            return _Vec(ranked.where(F.col("_rk") <= k)
                        .select("series_key", "bucket_ts", "value"))

        if node.op == "count_values":
            # the new label value is the sample value printed as the label;
            # both engines print non-fractional doubles as 'N.0'.
            agg = (df.groupBy("bucket_ts",
                              F.col("value").cast("string").alias(
                                  "series_key"))
                   .agg(F.count(F.lit(1)).cast("double").alias("value")))
            return _Vec(agg.select("series_key", "bucket_ts", "value"))

        raise PromQLCompileError(f"unhandled aggregation {node.op}")

    # -- binary lowering --------------------------------------------------------
    def _arith(self, op: str, l: Column, r: Column,
               rhs_node: Optional[Node] = None) -> Column:
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r
        if op == "%":
            # PromQL mod is fmod (sign of the dividend) — Spark's and
            # DuckDB's float % both implement exactly that.
            return l % r
        if op == "^":
            # chained multiplication for literal non-negative integer
            # exponents: an exact IEEE shape both engines share. pow()
            # is libm-dependent and therefore rejected.
            if (isinstance(rhs_node, Num)
                    and float(rhs_node.value).is_integer()
                    and 0 <= rhs_node.value <= 16):
                n = int(rhs_node.value)
                out = F.lit(1.0)
                for _ in range(n):
                    out = out * l
                return out
            raise PromQLCompileError(
                "^ supports literal integer exponents 0..16 only "
                "(libm pow() is not cross-engine exact)")
        raise PromQLCompileError(f"unhandled operator {op}")  # pragma: no cover

    _CMP_COL = {
        "==": lambda l, r: l == r, "!=": lambda l, r: l != r,
        ">": lambda l, r: l > r, "<": lambda l, r: l < r,
        ">=": lambda l, r: l >= r, "<=": lambda l, r: l <= r,
    }

    def _binary(self, node: Binary) -> Union[_Vec, _Scalar]:
        if node.op in _SET_OPS:
            return self._set_op(node)
        lhs = self._eval(node.lhs)
        rhs = self._eval(node.rhs)
        is_cmp = node.op in _CMP_OPS

        if isinstance(lhs, _Scalar) and isinstance(rhs, _Scalar):
            if is_cmp:
                raise PromQLCompileError(
                    "scalar comparison needs the bool modifier and a vector "
                    "context")
            col = self._arith(node.op, F.lit(lhs), F.lit(rhs), node.rhs)
            # constant-fold through a literal-only plan is pointless to keep
            # lazy; evaluate eagerly via Python (same IEEE ops).
            import math  # noqa: F401  (documents the arithmetic domain)
            def _pow(a: float, b: float) -> float:
                # r8 (ADVICE): Python ** returns complex for a negative
                # base with fractional exponent and raises on 0.0**-1;
                # fold with IEEE pow semantics instead (NaN / ±inf),
                # matching Prometheus' math.Pow.
                if a == 0.0 and b < 0:
                    return float("inf")
                try:
                    r = a ** b
                except (ZeroDivisionError, OverflowError):
                    return float("inf")
                if isinstance(r, complex):
                    return float("nan")
                return float(r)

            return float(
                {"+" : lhs + rhs, "-": lhs - rhs, "*": lhs * rhs,
                 "/": (lhs / rhs) if rhs != 0 else float("inf") if lhs > 0
                 else float("-inf") if lhs < 0 else float("nan"),
                 "%": math.fmod(lhs, rhs) if rhs != 0 else float("nan"),
                 "^": _pow(lhs, rhs)}[node.op])

        if isinstance(lhs, _Vec) and isinstance(rhs, _Vec):
            # vector (op) vector: one-to-one matching on the full label set
            # + bucket -> a single equi-join on (series_key, bucket_ts).
            l = lhs.df.select("series_key", "bucket_ts",
                              F.col("value").alias("_lv"))
            r = rhs.df.select("series_key", "bucket_ts",
                              F.col("value").alias("_rv"))
            j = l.join(r, ["series_key", "bucket_ts"])
            lcol, rcol = F.col("_lv"), F.col("_rv")
            if is_cmp:
                pred = self._CMP_COL[node.op](lcol, rcol)
                if node.bool_mod:
                    out = j.select("series_key", "bucket_ts",
                                   pred.cast("double").alias("value"))
                else:
                    out = j.where(pred).select(
                        "series_key", "bucket_ts", lcol.alias("value"))
                return _Vec(out)
            val = self._arith(node.op, lcol, rcol, node.rhs)
            return _Vec(j.select("series_key", "bucket_ts",
                                 val.alias("value")))

        # scalar (op) vector / vector (op) scalar
        vec, scalar, vec_left = (
            (lhs, rhs, True) if isinstance(lhs, _Vec) else (rhs, lhs, False))
        v = F.col("value")
        s = F.lit(scalar)
        lcol, rcol = (v, s) if vec_left else (s, v)
        if is_cmp:
            pred = self._CMP_COL[node.op](lcol, rcol)
            if node.bool_mod:
                out = vec.df.select("series_key", "bucket_ts",
                                    pred.cast("double").alias("value"))
            else:
                out = vec.df.where(pred)
            return _Vec(out)
        rhs_node = node.rhs if vec_left else None
        val = self._arith(node.op, lcol, rcol, rhs_node)
        return _Vec(vec.df.select("series_key", "bucket_ts",
                                  val.alias("value")))

    def _set_op(self, node: Binary) -> _Vec:
        l = self._expect_vec(node.lhs, node.op).df
        r = self._expect_vec(node.rhs, node.op).df
        keys = ["series_key", "bucket_ts"]
        if node.op == "and":
            return _Vec(l.join(r.select(*keys).distinct(), keys, "left_semi"))
        if node.op == "unless":
            return _Vec(l.join(r.select(*keys).distinct(), keys, "left_anti"))
        # or: left rows win; right rows join in only where the left has no
        # row for that (series, bucket).
        extra = r.join(l.select(*keys).distinct(), keys, "left_anti")
        return _Vec(l.unionByName(extra))

    # -- function lowering ---------------------------------------------------
    def _call(self, node: Call) -> _Vec:
        if node.func in _RANGE_FNS:
            if len(node.args) != 1:
                raise PromQLCompileError(
                    f"{node.func}() takes exactly one range argument")
            if isinstance(node.args[0], Subquery):
                return self._subquery_fn(node.func, node.args[0])
            if not isinstance(node.args[0], Selector):
                raise PromQLCompileError(
                    f"{node.func}() takes exactly one range selector "
                    f"or subquery")
            return self._range_fn(node.func, node.args[0])

        if node.func == "absent":
            if len(node.args) != 1 or not isinstance(node.args[0], Selector):
                raise PromQLCompileError("absent() takes one selector")
            sel = node.args[0]
            if sel.range_s is not None:
                raise PromQLCompileError(
                    "absent() takes an instant selector; use "
                    "absent_over_time(m[R]) for ranges")
            return self._absent(sel, 1)

        if node.func == "histogram_quantile":
            if (len(node.args) != 2
                    or not isinstance(node.args[1], Selector)):
                raise PromQLCompileError(
                    "histogram_quantile(phi, selector) takes a scalar and "
                    "a selector")
            phi = self._expect_scalar(node.args[0],
                                      "histogram_quantile() phi")
            return self._histogram_quantile(phi, node.args[1])

        if node.func in ("clamp", "clamp_min", "clamp_max"):
            want = 3 if node.func == "clamp" else 2
            if len(node.args) != want:
                raise PromQLCompileError(
                    f"{node.func}() takes {want} arguments")
            vec = self._expect_vec(node.args[0], node.func)
            bounds = [self._expect_scalar(a, f"{node.func}() bound")
                      for a in node.args[1:]]
            v = F.col("value")
            if node.func == "clamp":
                lo, hi = bounds
                val = F.least(F.greatest(v, F.lit(lo)), F.lit(hi))
            elif node.func == "clamp_min":
                val = F.greatest(v, F.lit(bounds[0]))
            else:
                val = F.least(v, F.lit(bounds[0]))
            return _Vec(vec.df.select("series_key", "bucket_ts",
                                      val.alias("value")))

        if len(node.args) != 1:
            raise PromQLCompileError(f"{node.func}() takes one argument")
        vec = self._expect_vec(node.args[0], node.func)
        v = F.col("value")
        val = {"abs": F.abs(v), "ceil": F.ceil(v).cast("double"),
               "floor": F.floor(v).cast("double"),
               "sgn": F.signum(v)}[node.func]
        return _Vec(vec.df.select("series_key", "bucket_ts",
                                  val.alias("value")))

    # -- dispatch ------------------------------------------------------------
    def _eval(self, node: Node) -> Union[_Vec, _Scalar]:
        if isinstance(node, Num):
            return float(node.value)
        if isinstance(node, Selector):
            return self._instant(node)
        if isinstance(node, Subquery):
            raise PromQLCompileError(
                "a subquery expr[R:S] is only valid as the argument of "
                "a *_over_time function")
        if isinstance(node, Call):
            return self._call(node)
        if isinstance(node, Agg):
            return self._agg(node)
        if isinstance(node, Binary):
            return self._binary(node)
        if isinstance(node, Unary):
            inner = self._eval(node.expr)
            if isinstance(inner, _Scalar):
                return -inner
            return _Vec(inner.df.select(
                "series_key", "bucket_ts", (-F.col("value")).alias("value")))
        raise PromQLCompileError(f"unhandled node {node!r}")  # pragma: no cover

    def _expect_vec(self, node: Node, what: str) -> _Vec:
        out = self._eval(node)
        if not isinstance(out, _Vec):
            raise PromQLCompileError(f"{what} needs a vector argument")
        return out

    def _expect_scalar(self, node: Optional[Node], what: str) -> float:
        if node is None:
            raise PromQLCompileError(f"{what} is required")
        out = self._eval(node)
        if not isinstance(out, _Scalar):
            raise PromQLCompileError(f"{what} must be a scalar literal")
        return out


def promql(samples: DataFrame, query: str, step: str = "1 hour", *,
           key_col: str = "series_key", ts_col: str = "ts",
           value_col: str = "value_double",
           fp6_cross_series: bool = False,
           histogram_bounds: Optional[dict] = None,
           tiers: Optional[dict] = None) -> DataFrame:
    """One-shot convenience: parse *query* and compile it against *samples*
    on the *step* tumbling grid. Returns DataFrame(series_key, bucket_ts,
    value). ``tiers`` maps interval specs to materialized rollup tiers
    that serve instant/_over_time selectors instead of raw rescans."""
    return PromQLCompiler(
        samples, step, key_col=key_col, ts_col=ts_col, value_col=value_col,
        fp6_cross_series=fp6_cross_series,
        histogram_bounds=histogram_bounds, tiers=tiers).compile(query)
