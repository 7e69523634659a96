"""URL canonicalization + URL-level dedup — pure Column expressions.

The first dedup stage a real pretraining crawl pipeline runs is URL
dedup: the same page is fetched under trivially different URLs (scheme
case, default ports, fragments, tracking query params, param order).
Canonicalizing before any content hashing removes the bulk of exact
re-crawl duplicates with zero text processing.

Canonical form (documented contract, mirrored verbatim by the DuckDB
oracle in ``__spark_entry__``):

1. trim; URLs without a ``scheme://`` prefix pass through lowercased
   (opaque identifiers — not parsed further);
2. drop the ``#fragment``;
3. lowercase scheme and authority (host[:port]);
4. strip the scheme's default port (``:80`` http, ``:443`` https);
5. empty path becomes ``/``;
6. query: split on ``&``, drop empty and tracking params
   (``utm_*``, ``gclid``, ``fbclid``, ``ref``), byte-sort the rest,
   rejoin; an emptied query drops its ``?``.

Everything is ``regexp_extract`` / array expressions — whole-stage
codegen end to end, no Python, map-only until the dedup aggregate.
At 100 TB the dedup is one partial/final hash aggregate on the
canonical string; hot URLs collapse map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: tracking-parameter regex (anchored match on the full param).
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=.*$"

_SCHEME_BODY = r"[A-Za-z][A-Za-z0-9+.\-]*"
_SCHEME_RE = f"^({_SCHEME_BODY})://"
_AUTH_RE = f"^{_SCHEME_BODY}://([^/?#]*)"
_PATH_RE = f"^{_SCHEME_BODY}://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of *url* per the module contract."""
    u = F.regexp_replace(F.trim(url), "#.*$", "")     # drop fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)

    default_port = F.when(scheme == "http", F.lit(":80")) \
        .when(scheme == "https", F.lit(":443")).otherwise(F.lit(""))
    host = F.when((default_port != "") & auth.endswith(default_port),
                  F.substring(auth, 1,
                              F.length(auth) - F.length(default_port))
                  ).otherwise(auth)

    path_n = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    query_n = F.when(F.size(params) > 0,
                     F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))

    return F.when(scheme == "", F.lower(F.trim(url))).otherwise(
        F.concat(scheme, F.lit("://"), host, path_n, query_n))


def dedup_by_canonical_url(df: DataFrame, *, url_col: str = "url",
                           id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest *id_col* per canonical URL (deterministic
    survivor rule, same as ``dedup_exact``). One partial/final hash
    aggregate on the canonical string; re-crawl storms of a hot URL
    collapse map-side before the shuffle."""
    canon = df.withColumn("canonical_url",
                          canonical_url(F.col(url_col)))
    keep = (canon.groupBy("canonical_url")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("n_dupes")))
    return keep.select(id_col, "canonical_url", "n_dupes")


#: host (authority minus any port) of an already-canonical URL.
_CANON_HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)"


def url_host(canonical: Column) -> Column:
    """Host of a :func:`canonical_url` string; opaque (scheme-less)
    identifiers map to ``(opaque)``."""
    h = F.regexp_extract(canonical, _CANON_HOST_RE, 1)
    return F.when(h == "", F.lit("(opaque)")).otherwise(h)


def domain_stats(df: DataFrame, *, url_col: str = "url",
                 id_col: str = "doc_id", chars_col: str | None = None,
                 dup_ratio_flag_fp6: int = 1_500_000) -> DataFrame:
    """Per-domain crawl hygiene stats — the URL-level filtering stage of
    a pretraining pipeline (RefinedWeb §3.1 runs URL/domain filtering
    before any content touch): docs per domain, distinct canonical
    pages, total chars, and the re-crawl duplication ratio
    (docs / distinct pages, 1e-6 fixed point); domains whose ratio
    exceeds the threshold are flagged (content farms / crawler traps
    re-serve the same canonical pages).

    Scale shape: TWO-LEVEL aggregation — first collapse per (domain,
    canonical url) (hot re-crawled URLs combine map-side), then roll up
    per domain — deliberately NOT a count-distinct expand, so a domain
    with a billion fetches of one URL never concentrates raw rows on
    one task. Map-only expressions otherwise; no Python.

    Output: (domain, n_docs, n_pages, total_chars?, dup_ratio_fp6,
    flagged).
    """
    canon = canonical_url(F.col(url_col))
    base = df.select(F.col(id_col).alias("_id"), canon.alias("_cu"),
                     *([F.col(chars_col).alias("_ch")] if chars_col
                       else []))
    base = base.withColumn("domain", url_host(F.col("_cu")))
    lvl1 = (base.groupBy("domain", "_cu")
            .agg(F.count(F.lit(1)).alias("_nd"),
                 *([F.sum("_ch").alias("_chs")] if chars_col else [])))
    agg = (lvl1.groupBy("domain")
           .agg(F.sum("_nd").alias("n_docs"),
                F.count(F.lit(1)).alias("n_pages"),
                *([F.sum("_chs").alias("total_chars")] if chars_col
                  else [])))
    ratio = (F.col("n_docs").cast("double")
             / F.col("n_pages").cast("double"))
    ratio_fp6 = F.floor(ratio * 1e6 + F.lit(0.5)).cast("long")
    return agg.select(
        "domain", "n_docs", "n_pages",
        *(["total_chars"] if chars_col else []),
        ratio_fp6.alias("dup_ratio_fp6"),
        (ratio_fp6 > dup_ratio_flag_fp6).alias("flagged"))


def canonical_url_oracle_expr(url_sql: str) -> str:
    """DuckDB SQL expression mirroring :func:`canonical_url` exactly
    (kept next to the implementation so the two evolve together)."""
    u = f"regexp_replace(trim({url_sql}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    auth = f"lower(regexp_extract({u}, '{_AUTH_RE}', 1))"
    path = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    query = f"regexp_extract({u}, '{_QUERY_RE}', 1)"
    dport = (f"CASE WHEN {scheme} = 'http' THEN ':80' "
             f"WHEN {scheme} = 'https' THEN ':443' ELSE '' END")
    host = (f"CASE WHEN {dport} <> '' AND ends_with({auth}, {dport}) "
            f"THEN substring({auth}, 1, length({auth}) - length({dport})) "
            f"ELSE {auth} END")
    path_n = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    params = (f"list_sort(list_filter(string_split({query}, '&'), "
              f"p -> p <> '' AND NOT regexp_matches(p, "
              f"'{TRACKING_PARAM_RE}')))")
    query_n = (f"CASE WHEN len({params}) > 0 "
               f"THEN '?' || array_to_string({params}, '&') "
               f"ELSE '' END")
    return (f"CASE WHEN {scheme} = '' THEN lower(trim({url_sql})) "
            f"ELSE {scheme} || '://' || {host} || {path_n} || {query_n} "
            f"END")


def snapshot_delta(old: DataFrame, new: DataFrame, *,
                   key_col: str = "url",
                   content_col: str = "text") -> DataFrame:
    """Crawl snapshot diff: classify every key across two corpus
    snapshots as ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, different content fingerprint) or ``unchanged``
    — the incremental-processing primitive that decides what re-enters
    the pipeline between crawls (dedup/extract/rollup only the added ∪
    changed set; ``dedup_incremental`` is its near-dup sibling).

    Content identity = the 64-bit md5-high hash of the content column
    (md5hi, the repo's SQL-recomputable hash — DuckDB has md5 but not
    xxhash64; a changed byte flips the status; NULL content hashes to a
    sentinel so NULL vs '' is a change). Construction: one fingerprint
    projection per side + ONE full outer equi-join on the key — at
    scale both snapshots bucket by the same key, making the join
    co-partitioned and shuffle-free; no windows, no Python.

    Output: (key, status, old_fp, new_fp) with fingerprints as typed
    sentinel 0 on the absent side (never NULL — the oracle-typing
    rule).
    """
    from json_time_series_extractor_spark.operators.dedup import (
        _token_hash64,
    )

    def fp(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("key"),
            F.coalesce(_token_hash64(F.col(content_col), "md5hi"),
                       F.lit(0x6e)).alias(f"{side}_fp"))

    o, n = fp(old, "old"), fp(new, "new")
    j = o.join(n, "key", "full_outer")
    status = (F.when(F.col("old_fp").isNull(), F.lit("added"))
              .when(F.col("new_fp").isNull(), F.lit("removed"))
              .when(F.col("old_fp") == F.col("new_fp"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(
        "key", status.alias("status"),
        F.coalesce("old_fp", F.lit(0)).alias("old_fp"),
        F.coalesce("new_fp", F.lit(0)).alias("new_fp"))


def snapshot_delta_oracle_sql(old_sql: str, new_sql: str, *,
                              key_sql: str = "url",
                              content_sql: str = "text") -> str:
    """DuckDB ground truth for :func:`snapshot_delta`: the same md5hi
    fingerprint (HUGEINT assembly wrapped to signed int64 to match
    Spark's shiftleft sign wrap), NULL sentinel, full outer join and
    status CASE. Kept beside the impl."""
    def fp(src: str) -> str:
        hu = (f"CAST(CAST(concat('0x', substr(md5({content_sql}), 1, 8)) "
              f"AS BIGINT) AS HUGEINT) * 4294967296 "
              f"+ CAST(concat('0x', substr(md5({content_sql}), 9, 8)) "
              f"AS BIGINT)")
        signed = (f"CAST(CASE WHEN {hu} >= 9223372036854775808 "
                  f"THEN {hu} - 18446744073709551616 "
                  f"ELSE {hu} END AS BIGINT)")
        return (f"SELECT {key_sql} AS key, "
                f"coalesce({signed}, 110) AS fp FROM ({src})")

    return f"""
WITH o AS ({fp(old_sql)}),
n AS ({fp(new_sql)}),
j AS (
    SELECT coalesce(o.key, n.key) AS key, o.fp AS old_fp, n.fp AS new_fp
    FROM o FULL OUTER JOIN n ON o.key = n.key)
SELECT key,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp = new_fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       coalesce(old_fp, 0) AS old_fp,
       coalesce(new_fp, 0) AS new_fp
FROM j
"""
