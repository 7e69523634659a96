"""Vectorized extraction operator: pages -> samples (the engine's UDTF).

One input row (a JSON document in a string column) fans out to N sample
rows. The dynamic document shape forces a Python walk (Catalyst cannot see
inside arbitrary JSON), so this is the engine's single JVM->Python boundary
on the hot path: an Arrow-batched ``mapInPandas`` running the pure-Python
core (``..core.extractor``) per batch — never a row-at-a-time Python UDF.

Scale notes (100 TB / 10^12 docs):
- The operator is **map-only**: no shuffle. Parallelism = input splits.
- Columns are pruned *before* the UDF (only id cols + the text column cross
  the Arrow boundary; ``html`` is never read unless asked for).
- The match-rule delegate is compiled once per task, not per document.
- Output schema is narrow and fixed (tagged-union value columns), so the
  downstream rollup shuffle moves minimal bytes.

Fixed-pointer fast path: for non-recursive extraction of known scalar
pointers with a document-level timestamp, :func:`extract_samples_fixed`
compiles the whole operator to JVM-side ``get_json_object`` expressions —
zero Python in the plan.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple, Union

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.core.extractor import (
    TimestampSource,
    get_samples,
)
from json_time_series_extractor_spark.core.matcher import compile_match_delegate
from json_time_series_extractor_spark.core.options import ExtractorOptions

#: Output schema of the extraction operator (see FIXTURES.md F9).
SAMPLE_SCHEMA = (
    "url string, warc_ts timestamp, series_key string, ts timestamp, "
    "value_double double, value_str string, value_bool boolean, "
    "value_kind tinyint, ts_source tinyint"
)

#: Extended schema carrying the offset-preserving raw timestamp. Spark
#: timestamps are UTC-normalized, losing the reference's DateTimeOffset
#: fidelity (TimeSeriesSample.cs:8-53); ``ts_raw`` is the ISO-8601 render
#: of the sample timestamp with its original offset intact.
SAMPLE_SCHEMA_TS_RAW = SAMPLE_SCHEMA + ", ts_raw string"

_UTC = timezone.utc


def extract_samples(
    pages: DataFrame,
    options: Union[ExtractorOptions, dict, None] = None,
    *,
    text_col: str = "text",
    url_col: str = "url",
    fallback_ts_col: Optional[str] = "warc_ts",
    include_ts_raw: bool = False,
) -> DataFrame:
    """Extract time-series samples from every page.

    ``fallback_ts_col`` (default ``warc_ts``) supplies the per-document
    fallback timestamp — the reference's ``GetDefaultTimestamp`` delegate
    (``TimeSeriesExtractorOptions.cs:142``) bound to the page's capture
    time, so extraction stays deterministic (no wall-clock on executors).

    ``include_ts_raw`` adds a ``ts_raw`` string column with the ISO-8601
    timestamp *including its original UTC offset* — the reference's
    ``DateTimeOffset`` fidelity that Spark's UTC-normalized TimestampType
    cannot carry.
    """
    if options is None:
        options = ExtractorOptions()
    elif isinstance(options, dict):
        options = ExtractorOptions.from_dict(options)
    # Fail fast on the driver; workers re-validate implicitly.
    options.validate()
    opts_dict = options.to_dict()
    # Non-configurable callables (tests/advanced API) ship via cloudpickle.
    callables = (options.get_template_replacement, options.timestamp_parser,
                 options.can_process_element)

    cols = [url_col, fallback_ts_col, text_col] if fallback_ts_col else [
        url_col, text_col]

    def extract_batches(batches: Iterable[pd.DataFrame],
                        ) -> Iterator[pd.DataFrame]:
        opts = ExtractorOptions.from_dict(opts_dict)
        (opts.get_template_replacement, opts.timestamp_parser,
         opts.can_process_element) = callables
        # Compile the pointer-rule delegate once per task (the reference
        # compiles once per configuration, TimeSeriesExtractor.cs:92-119).
        if opts.can_process_element is None and (
                opts.pointers_to_include is not None
                or opts.pointers_to_exclude is not None):
            opts.can_process_element = compile_match_delegate(
                opts.pointers_to_include, opts.pointers_to_exclude,
                opts.allow_wildcard_expressions)
        for pdf in batches:
            yield process_batch(pdf, opts, text_col=text_col,
                                url_col=url_col,
                                fallback_ts_col=fallback_ts_col,
                                include_ts_raw=include_ts_raw)

    schema = SAMPLE_SCHEMA_TS_RAW if include_ts_raw else SAMPLE_SCHEMA
    return pages.select(*cols).mapInPandas(extract_batches, schema)


def process_batch(pdf: pd.DataFrame, opts: ExtractorOptions, *,
                  text_col: str = "text", url_col: str = "url",
                  fallback_ts_col: Optional[str] = "warc_ts",
                  include_ts_raw: bool = False,
                  ) -> pd.DataFrame:
    """Run the extraction core over one Arrow batch of pages.

    Module-level (not a closure) so it is unit-testable without a cluster;
    :func:`extract_samples` wraps it in ``mapInPandas``.
    """
    # Per-document fallback timestamp through a mutable cell (the
    # reference's GetDefaultTimestamp delegate, bound per document).
    cell: List[object] = [None]
    opts.get_default_timestamp = lambda: cell[0]

    urls: List[str] = []
    warc: List[object] = []
    keys: List[str] = []
    ts_out: List[object] = []
    v_dbl: List[Optional[float]] = []
    v_str: List[Optional[str]] = []
    v_bool: List[Optional[bool]] = []
    v_kind: List[int] = []
    ts_src: List[int] = []
    ts_raw: List[Optional[str]] = []
    # Bound-method hoisting: the per-sample loop does 9 appends; attribute
    # lookup per call is measurable at ~10^6 samples/sec/core.
    urls_a, warc_a, keys_a = urls.append, warc.append, keys.append
    ts_a, dbl_a, str_a = ts_out.append, v_dbl.append, v_str.append
    bool_a, kind_a, src_a = v_bool.append, v_kind.append, ts_src.append

    text_vals = pdf[text_col].values
    url_vals = pdf[url_col].values
    if fallback_ts_col:
        # One vectorized conversion per batch (datetime64 -> Timestamp
        # objects; Timestamp subclasses datetime) instead of per-row
        # .iloc/.isnull/.to_pydatetime.
        fb_vals = pdf[fallback_ts_col].to_numpy(dtype=object)
    else:
        fb_vals = None
    NaT = pd.NaT
    for i in range(len(pdf)):
        text = text_vals[i]
        if text is None:
            continue
        warc_naive = None
        cell[0] = None
        if fb_vals is not None:
            fb = fb_vals[i]
            # Arrow delivers timestamp columns as Timestamp/NaT, but direct
            # process_batch callers (tools/microbench.py, tests) may hand an
            # object column containing None or float NaN — guard all three.
            if fb is not NaT and fb is not None and isinstance(fb, datetime):
                warc_naive = fb
                cell[0] = warc_naive.replace(tzinfo=_UTC)
        url = url_vals[i]
        # All samples of one document usually share the SAME timestamp
        # object (the document/fallback timestamp off the context stack),
        # so the UTC normalization is memoized by identity — measured ~2x
        # on many-samples-per-doc payloads.
        memo_ts = None
        memo_conv = None
        for sample in get_samples(text, opts):
            key, ts, value, source, kind = sample
            urls_a(url)
            warc_a(warc_naive)
            keys_a(key)
            if ts is memo_ts:
                ts_a(memo_conv)
            else:
                memo_ts = ts
                memo_conv = (ts.astimezone(_UTC).replace(tzinfo=None)
                             if ts.tzinfo is not None else ts)
                ts_a(memo_conv)
            if include_ts_raw:
                ts_raw.append(ts.isoformat())
            kind_a(kind)
            src_a(int(source))
            if kind == 1:
                dbl_a(float(value))
                str_a(None)
                bool_a(None)
            elif kind == 3:
                dbl_a(None)
                str_a(None)
                bool_a(bool(value))
            elif kind == 0:
                dbl_a(None)
                str_a(None)
                bool_a(None)
            else:  # string / raw-text object / raw-text array
                dbl_a(None)
                str_a(str(value))
                bool_a(None)

    out = {
        "url": pd.Series(urls, dtype="object"),
        "warc_ts": pd.Series(warc, dtype="datetime64[us]"),
        "series_key": pd.Series(keys, dtype="object"),
        "ts": pd.Series(ts_out, dtype="datetime64[us]"),
        "value_double": pd.Series(v_dbl, dtype="float64"),
        "value_str": pd.Series(v_str, dtype="object"),
        "value_bool": pd.Series(v_bool, dtype="object"),
        "value_kind": pd.Series(v_kind, dtype="int8"),
        "ts_source": pd.Series(ts_src, dtype="int8"),
    }
    if include_ts_raw:
        out["ts_raw"] = pd.Series(ts_raw, dtype="object")
    return pd.DataFrame(out)


def extract_samples_fixed(
    pages: DataFrame,
    pointers: Sequence[Tuple[str, str]],
    *,
    timestamp_pointer: Optional[str] = "/time",
    text_col: str = "text",
    url_col: str = "url",
    fallback_ts_col: str = "warc_ts",
) -> DataFrame:
    """JVM-only fast path for *fixed scalar pointers* (no recursion, no
    wildcards): the document is parsed ONCE into a VARIANT
    (``try_parse_json``), then each ``(series_key, json_pointer)`` is an
    O(path) binary access (``try_variant_get``) with per-row kind
    detection (``schema_of_variant``) — whole-stage JVM, no Python
    workers, and one parse per document instead of one per pointer (the
    old ``get_json_object`` form re-parsed per pointer).

    Emits the SAME tagged union as the general operator, with the
    reference coercion table (``TimeSeriesExtractor.cs:923-938``):
    numbers -> ``value_double`` (kind 1), strings pass through as
    ``value_str`` (kind 2) — a numeric STRING is NOT coerced to double —
    bools -> ``value_bool`` (kind 3), containers -> their JSON text in
    ``value_str`` (kind 4/5), null/missing -> kind 0.

    Deviations from the general operator, by design of the fast path:
    container raw text is the variant's canonical compact render, not a
    byte-identical slice of the input; a malformed document yields
    kind-0 rows instead of raising; a missing pointer still emits its
    kind-0 row (one row per pointer per document, always). Numeric
    pointer segments are treated as array indexes (RFC 6901 cannot
    distinguish them from numeric object keys). Document-level
    timestamp: ISO-8601 string or integral epoch milliseconds, with the
    warc_ts fallback.
    """
    if not pointers:
        raise ValueError("extract_samples_fixed requires at least one "
                         "(series_key, pointer) pair")

    def jpath(pointer: str) -> str:
        """RFC 6901 pointer -> variant_get JSONPath. Array indexes use
        [n] (dot-numeric silently returns null), non-identifier keys use
        ['...'] bracket form, ~0/~1 escapes are decoded."""
        import re as _re

        out = "$"
        for seg in pointer.split("/"):
            if seg == "":
                continue
            seg = seg.replace("~1", "/").replace("~0", "~")
            if seg.isdigit():
                out += f"[{seg}]"
            elif _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", seg):
                out += f".{seg}"
            else:
                escaped = seg.replace("'", "\\'")
                out += f"['{escaped}']"
        return out

    # STAGED projections, one expensive expression per stage: variant
    # expressions get no whole-stage-codegen subexpression elimination, so
    # a single projection referencing try_parse_json / try_variant_get /
    # schema_of_variant N times re-parses the document N times per row
    # (measured ~17x slower). CollapseProject does not re-inline non-cheap
    # expressions referenced more than once, so each stage below evaluates
    # its expression exactly once per row.
    doc = F.try_parse_json(F.col(text_col))
    staged = pages.select(
        F.col(url_col).alias("url"),
        F.col(fallback_ts_col).alias("warc_ts"),
        doc.alias("_doc"))

    ts_raw_col = (F.try_variant_get(F.col("_doc"),
                                    jpath(timestamp_pointer), "string")
                  if timestamp_pointer else F.lit(None).cast("string"))
    staged = staged.select("url", "warc_ts", "_doc",
                           ts_raw_col.alias("_ts_raw"))
    # Document-level timestamp rules (TimeSeriesExtractor.cs:660-671):
    # ISO-8601 string, else integral epoch-milliseconds. try_* forms:
    # under ANSI mode a plain cast THROWS on non-conforming values.
    ts_doc = F.coalesce(
        F.try_to_timestamp(F.col("_ts_raw")),
        F.timestamp_millis(F.col("_ts_raw").try_cast("bigint")))
    staged = staged.select("url", "warc_ts", "_doc",
                           ts_doc.alias("_doc_ts"))

    # One output row per (document, pointer): explode the literal key list
    # FIRST, then a CASE on the position picks the one variant_get that
    # applies — a single parse and a single pointer access per output row.
    keys = F.array(*[F.lit(k) for k, _ in pointers])
    exploded = staged.select(
        "url", "warc_ts", "_doc", "_doc_ts",
        F.posexplode_outer(keys).alias("_pos", "series_key"))

    elem = F.when(F.lit(False), F.try_variant_get(F.col("_doc"), "$",
                                                  "variant"))
    for i, (_k, ptr) in enumerate(pointers):
        elem = elem.when(F.col("_pos") == i,
                         F.try_variant_get(F.col("_doc"), jpath(ptr),
                                           "variant"))
    exploded = exploded.select("url", "warc_ts", "_doc_ts", "series_key",
                               elem.alias("_elem"))
    # schema_of_variant: numbers come back as DECIMAL(p,s)/BIGINT/DOUBLE/
    # FLOAT/..., JSON null as VOID, a missing path / unparsable document
    # as SQL NULL (rendered 'NULL' by some versions).
    exploded = exploded.select(
        "url", "warc_ts", "_doc_ts", "series_key", "_elem",
        F.schema_of_variant(F.col("_elem")).alias("_sk"))
    sk = F.col("_sk")
    kind = (F.when(sk.isNull() | sk.isin("VOID", "NULL"), F.lit(0))
            .when(sk == "STRING", F.lit(2))
            .when(sk == "BOOLEAN", F.lit(3))
            .when(sk.startswith("OBJECT"), F.lit(4))
            .when(sk.startswith("ARRAY"), F.lit(5))
            .otherwise(F.lit(1))).cast("tinyint")
    exploded = exploded.select("url", "warc_ts", "_doc_ts", "series_key",
                               "_elem", kind.alias("value_kind"))

    k = F.col("value_kind")
    return exploded.select(
        "url", "warc_ts", "series_key",
        F.coalesce(F.col("_doc_ts"), F.col("warc_ts")).alias("ts"),
        # Gated on kind: an ungated 'double' get would coerce numeric
        # STRINGS, and an ungated 'string' get would stringify numbers.
        F.when(k == 1, F.try_variant_get(F.col("_elem"), "$", "double"))
        .alias("value_double"),
        F.when(k.isin(2, 4, 5),
               F.try_variant_get(F.col("_elem"), "$", "string"))
        .alias("value_str"),
        F.when(k == 3, F.try_variant_get(F.col("_elem"), "$", "boolean"))
        .alias("value_bool"),
        "value_kind",
        F.when(F.col("_doc_ts").isNotNull(),
               F.lit(int(TimestampSource.DOCUMENT)))
        .otherwise(F.lit(int(TimestampSource.FALLBACK_PROVIDER)))
        .cast("tinyint").alias("ts_source"),
    )
