"""Physical-plan audit: dump .explain('formatted') for the headline queries
plus automated checks (pushdown/pruning evidence, Python-boundary count,
exchange count) into PLANS.md.

Run: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from json_time_series_extractor_spark.plans.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

#: Queries whose plans carry the scale story, with the properties we assert.
AUDITED = [
    ("pages_extract_rollup",
     "map-only extraction (one Python boundary), then two hash-agg tiers"),
    ("extract_fixed", "zero Python: one staged variant parse per document "
     "+ explode + kind-gated typed gets"),
    ("rollup_1m", "single shuffle, partial/final hash aggregate"),
    ("rollup_1d_salted", "two-phase salted aggregate for hot keys"),
    ("gapfill_locf", "grid generate + single join + running window"),
    ("gapfill_locf_partitioned",
     "bounded (series, day) window partitions; whole-series windows only "
     "over the tiny per-segment summary table"),
    ("counter_rate", "bounded (series, day) lag windows + per-day carry "
     "summary; whole-series windows only over the summary"),
    ("time_weighted_avg", "lead window + bounded bucket fan-out + one "
     "hash aggregate"),
    ("rollup_histogram", "flat per-bin sums, partial/final hash "
     "aggregate, cascade stays mergeable"),
    ("sessionize", "per-user lag + running-sum windows, one hash "
     "aggregate; no global sort"),
    ("top_k_series", "hash aggregate + bucket-partitioned row_number "
     "(window input is one row per bucket-series)"),
    ("ngram_jaccard", "inverted-index equi-join, no cross product"),
    ("minhash_lsh_pairs", "banded equi-join on (band, hash) buckets"),
    ("ann_lsh_topk",
     "recall-graded: exact brute-force top-k (deliberate broadcast cross "
     "join, the 2 BNLJ nodes) + LSH bucket join + tiny grading joins over "
     "Q*k rows; no global sort"),
    ("chunk_roundtrip", "one grouped-map boundary in, map-only decode out"),
    ("asof_join_nearest", "two union-and-carry window scans (asc + desc) "
     "over the same series partitioning, no range join, no global sort"),
    ("extract_ts_raw", "map-only: JSON rendered from base columns, one "
     "Python boundary for the offset-preserving extraction"),
    ("dedup_incremental", "banded new-vs-ref equi-join (never a "
     "self-join) + shingle verify + left-anti; no cross product"),
    ("sample_fraction", "map-only keyed Bernoulli filter, zero Python; "
     "the single exchange is the harness's _spread repartition of the "
     "one-split test parquet, not the operator"),
    ("sample_per_lang", "two-phase stratified cap: broadcast per-group "
     "counts, map-only hash-threshold pre-filter (Filter on _thr BEFORE "
     "any window), then row_number only over the ~safety*n survivors; "
     "the full-group window exists only on the empty fallback branch"),
    ("rollup_tdigest", "sketch build + cascade are two grouped-map "
     "boundaries partitioned like every rollup shuffle; estimation is "
     "map-only; the exact-bracket grading join is the oracle's cost, "
     "not the operator's"),
    ("hll_distinct_1h", "zero Python: register build + cascade + "
     "estimate are three partial/final hash aggregates over pure "
     "expressions; per-group state bounded at 2^b register rows"),
    ("url_dedup", "zero Python: regexp/array canonicalization is "
     "map-only; dedup is one partial/final hash aggregate (hot URLs "
     "collapse map-side)"),
    ("paragraph_dedup", "zero Python, zero windows: keeper choice is a "
     "partial/final aggregate keyed by paragraph + equi-join (hot "
     "boilerplate collapses map-side), reassembly one aggregate"),
    ("interval_join", "range predicate rewritten to an equi-join on "
     "(keys, bucket) via interval explosion — no nested-loop join"),
    ("downsample_lttb", "zero Python: pick is a struct-min hash "
     "aggregate; the only window runs over the per-bucket summary"),
    ("histogram_quantile", "zero Python: interpolation is a map-only "
     "expression layer over the cascaded day tier — no shuffle beyond "
     "the two tier hash aggregates it inherits"),
    ("linear_trend", "zero Python, zero windows: one partial/final "
     "hash aggregate over five exact decimal sufficient statistics, "
     "then map-only closed forms"),
    ("kmv_retention", "distinct-hash partial/final aggregate, min-k "
     "row_number window bounded by per-bucket NDV, exact cascade "
     "re-selection, then a k-bounded equi-join for the set algebra "
     "(O(k^2) per row, constant)"),
    ("anomaly_zscore", "one bounded row-frame window per series over "
     "TIER rows (summary-sized partitions) with exact decimal sums; "
     "no Python"),
    ("pii_redact", "map-only codegen regexp chain, zero Python, zero "
     "shuffles (the single exchange is the harness _spread)"),
    ("dup_ngram_stats", "zero Python: windows are array expressions; "
     "one partial/final hash agg on the 64-bit window hash + join-back; "
     "exploded subplan materialized (r6) so the tokenize+window+hash "
     "derivation shows as ONE InMemoryRelation reused by both the "
     "count aggregate and the join probe, not two derivations"),
    ("rolling_over_time", "one bounded ROWS-frame window over rollup "
     "rows (tier summaries, not raw samples)"),
    ("counter_analytics", "segmented lag plan + (series, bucket)-bounded "
     "rank windows; no whole-series sample windows"),
    ("cm_frequency", "zero Python: register build/cascade/estimate are "
     "partial/final hash aggregates + one equi-join of d probes"),
    ("holt_winters", "the sequential recurrence is isolated in ONE "
     "applyInPandas over TIER rows (summary-sized groups); a single "
     "series_key re-shuffle beyond the rollup, no raw-sample windows"),
    ("absent_buckets", "grid explode bounded by each series' bucket "
     "span; left anti-flag join + two windows over the SPARSE absent "
     "set only; zero Python"),
    ("absent_buckets_partitioned", "bounded (series, segment) windows "
     "+ per-segment and per-gap SUMMARY windows only — no whole-series "
     "grid window (the 1m-tier scale path); gap position is arithmetic, "
     "not a per-run window"),
    ("exemplars", "two-phase keyed-hash sample: map-only hash-threshold "
     "prefilter, window rank only over ~safety*k survivor rows per "
     "bucket, exact fallback for under-filled groups"),
    ("quantile_over_time", "rolling sketch merge: bounded ROWS "
     "collect_list window over SKETCH rows + the cascade's vectorized "
     "batch merge; the percentile-bracket machinery is oracle grading, "
     "not operator cost"),
    ("distinct_over_time", "register fan-out (sketch rows x k, <=2^b "
     "per bucket) + partial/final MAX aggregate; zero Python"),
    ("frequency_over_time", "register fan-out + partial/final SUM "
     "aggregate + d-probe equi-join; the window-exact count side is "
     "oracle grading"),
    ("media_container_meta", "map-only Arrow-batched byte parsing; "
     "zero shuffle, zero joins"),
    ("doc_token_count_bpe", "corpus-sized work is pure JVM (word-freq "
     "hash agg + per-doc roll-up join); Python encode runs once per "
     "DISTINCT word (vocab-sized mapInPandas); training collect is "
     "bounded at max_vocab rows"),
    ("downsample_m4", "zero Python, ZERO windows: all four pixel picks "
     "are struct-min/max inside ONE partial/final hash aggregate "
     "(mergeable, unlike LTTB)"),
    ("rollup_incremental_refresh", "the standing tier flows only "
     "through broadcast anti/semi joins (never shuffled); all real "
     "joins are dirty-bucket-sized; late partials are one hash "
     "aggregate over the late batch"),
    ("chunk_pruned_scan", "zone-map Column filter sits BEFORE the "
     "Python decode — pruned chunks never cross the Arrow boundary; "
     "on a parquet chunk table the same predicate pushes to the scan"),
    ("decontaminate", "corpus side never shuffles text: explode + "
     "broadcast-hash left join against the eval gram set + one hash "
     "aggregate keyed by doc_id"),
    ("rolling_correlation", "series reduction is one hash aggregate; "
     "pair alignment is two joins against the tiny pair list; the one "
     "window runs over aligned BUCKET rows (summary-sized) with exact "
     "decimal sums"),
    ("doc_lm_quality", "scoring path is explode + two broadcast joins "
     "+ one hash aggregate — zero Python, no shuffle of corpus text; "
     "training is one hash aggregate + a max_vocab-bounded collect"),
    ("anomaly_mad", "same self-excluded bounded row frame as the "
     "z-score detector over TIER rows; collect_list materializes <=W "
     "int64s per row; pure integer median/MAD arithmetic, zero Python"),
    ("dedup_spans", "window explode materialized once -> ONE "
     "count+keeper hash aggregate on the 64-bit window hash -> bounded "
     "n-fold coverage fan-out -> per-token and per-doc aggregates; no "
     "Python, no windows over raw text"),
    ("rollup_refresh_deletes", "tier through broadcast anti join; raw "
     "filtered to dirty buckets by broadcast semi join BEFORE its one "
     "hash aggregate (partition pruning on a real table)"),
    ("rollup_mergeable_cascade", "two partial/final hash aggregates "
     "(1m build + 1h re-aggregation), integer-exact merge state, no "
     "windows, no Python"),
    ("gapfill_locf_stale", "same grid + join + running windows as "
     "gapfill_locf plus one running-max (last-seen) column over the "
     "identical series partitioning"),
    ("histogram_rebin", "fine tier hash aggregate + map-only "
     "element_at re-bin + the day cascade; re-binning itself adds "
     "ZERO exchanges"),
    ("domain_stats", "two-level aggregation (domain, canonical) -> "
     "domain; never a count-distinct expand; canonicalization is "
     "map-only codegen"),
    ("changepoint_cusum", "drawup/drawdown closed form: one summary "
     "median/MAD aggregate per series + one equi-join + running "
     "integer windows; zero floats, zero Python, no recursion"),
    ("ingest_dedup_lww", "ONE max(struct) hash aggregate on the tier "
     "key — map-side combinable, mergeable across incremental "
     "partitions, rides the shuffle the 1m tier already pays"),
    ("series_acf", "bucket reduction + tiny per-series stats + ONE "
     "exploded self-equi-join (fan-out = max_lag) + one hash "
     "aggregate; decimal-exact sums, no windows over raw rows"),
    ("pack_sequences", "two-phase distributed prefix scan: shard "
     "totals prefix-summed over SUMMARY rows only, bounded "
     "within-shard windows, broadcast join back; never a global sort "
     "of doc rows"),
    ("domain_mix", "summary-sized weight/quota aggregates + the "
     "shared two-phase quota sampler: map-only hash pre-filter, "
     "bounded survivor windows, broadcast-empty fallback"),
    ("boilerplate_lines", "posexplode -> two-level distinct-doc count "
     "on the 64-bit line hash (never count-distinct expand) -> "
     "equi-join + per-doc reassembly aggregate; no Python"),
    ("slo_burn_rate", "one tier hash aggregate, ONE window per "
     "service with two trailing RANGE frames; integer sums, "
     "fixed-shape float tail"),
    ("seasonal_decompose", "bucket reduction + one RANGE window per "
     "series (p+1 rows in frame) + summary phase aggregate + "
     "broadcast-sized join back; integer 2p-scale algebra"),
    ("bm25_scores", "explode filtered to query terms (query-sized "
     "shuffle, not corpus-sized) + Q-row bounded collect + broadcast "
     "idf join + one per-doc aggregate; scoring path has no Python"),
    ("quality_threshold", "two counting hash aggregates with "
     "driver-side walks locate the exact rank; the kept set is one "
     "map-only filter; NO Sort stage anywhere in the plan"),
    ("rrf_hybrid", "each ranking reduced LAZILY by a bounded partial "
     "top-k (TakeOrderedAndProject — per-partition heaps, no full "
     "Sort stage; r8) before a bounded single-partition rank window "
     "(top-N-sized); fusion = union of top-N frames + one hash "
     "aggregate, ONE plan with zero per-ranker driver actions; the "
     "2 BNLJ nodes are the deliberate 1-row broadcast cross join "
     "shipping the query vector (the ANN queries' documented "
     "pattern)"),
    ("pagerank", "Pregel shape: per iteration one equi-join vs "
     "once-materialized annotated edges + one dst hash aggregate + "
     "one left join; localCheckpoint per iteration truncates lineage "
     "(the audited plan is the LAST iteration's, reading checkpoints)"),
    ("split_assign", "map-only keyed-hash CASE: zero shuffles, zero "
     "windows, zero state — the split survives any repartition"),
    ("jsonl_roundtrip", "splittable line-based JSON scan with explicit "
     "schema (no inference pass) + cached parse shared by the corrupt "
     "count and the output projection"),
    ("warc_roundtrip", "per-FILE binaryFile scan (gzip unsplittable — "
     "the industry WARC pattern) into ONE streaming mapInPandas "
     "boundary; everything after the unwrap is plain columns"),
    ("robots_filter", "rules broadcast as per-domain ARRAYS (one "
     "summary-sized Arrow parse); matching is a higher-order filter + "
     "aggregate fold per URL row — the URL table never explodes per "
     "rule, no Python in the matching path"),
    ("rollup_realtime", "real-time continuous aggregate: two PRUNED "
     "scans (tier below the watermark, raw tail at/after) + one hash "
     "aggregate — NO joins anywhere; both filters are partition "
     "pruning on a partitioned table"),
    ("promql_tier_routed", "tier-routed PromQL: the compiled plan reads "
     "the materialized 1m tier (one cascade hash agg + RANGE frame + "
     "rank window), never the raw samples"),
    ("promql_subquery", "PromQL subquery: inner rate pipeline, "
     "fp6-quantized cross-series sum, one trailing RANGE frame over "
     "the inner vector's instant values"),
    ("semdedup", "map-only quantized-argmax cluster assignment (k*dim "
     "fold expressions, no Python), persisted once, then ONE "
     "self-equi-join on the cluster id + left join for the drop flag"),
    ("chunk_chimp_roundtrip", "same two-Arrow-boundary chunk shape as "
     "the Gorilla row; the codec swap is inside the same "
     "applyInPandas/mapInPandas calls"),
    ("mg_heavy_hitters", "one hash aggregate per tier + two windows "
     "over the SAME (series, bucket) partition (one shuffle each); the "
     "day tier reads only <= k summary rows per child bucket"),
    ("sample_token_budget", "fits-whole groups bypass windows "
     "entirely; oversized groups window only rank-prefiltered "
     "survivors; starved-group fallback is a broadcast anti-join on a "
     "~always-empty side"),
    ("doc_lang_id_trained", "one trigram explode, NO langs fan-out "
     "(r8: per-lang tables pivoted into map<lang,lp> columns), two "
     "broadcast map joins + one |L|-wide integer hash agg; argmax is "
     "an array_min over |L| static structs per doc — no Python, no "
     "log, no nested-loop join"),
    ("funnel_conversion", "k chained hash aggregates + user-keyed "
     "equi-joins on monotonically shrinking frames; no per-user sort, "
     "no window over raw events"),
    ("mg_over_time", "summary rows (<= k per bucket) fan to <= "
     "k_buckets present-bucket indices, exact integer sums per window, "
     "one compaction per output bucket — sketch-sized rows only, never "
     "raw history"),
    ("snapshot_delta", "one md5hi fingerprint projection per side + "
     "ONE full outer equi-join — co-partitioned and shuffle-free on "
     "key-bucketed snapshots; no windows, no Python"),
    ("cohort_retention", "two map-side-combinable aggregates + one "
     "user-keyed equi-join + a broadcast sizes join; output = cohorts "
     "x offsets"),
    ("embedding_pca", "one fold-dot per component against literal "
     "vectors — map-only, no shuffle, no Python workers (training is "
     "a bounded TakeOrderedAndProject sample)"),
    ("media_phash", "the shared real-decode Arrow kernel (one "
     "mapInPandas boundary), map-only — the same shape as the pixel "
     "hash row"),
]


def _node_ids(plan: str, pattern: str) -> int:
    """Count distinct plan-node ids matching *pattern* (formatted explain
    prints each node once in the tree and once in the details)."""
    return len(set(re.findall(r"\((\d+)\) (?:" + pattern + r")\b", plan)))


def audit(name: str, df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Codegen spans only show in simple mode ("*(n)" prefixes).
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        df.explain(False)
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", buf2.getvalue())))
    py_pat = ("MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython"
              "|BatchEvalPython")
    nlj_pat = "BroadcastNestedLoopJoin|CartesianProduct"
    n_gsort = len(re.findall(r"Sort \[[^]]*\], true", plan))
    checks = [
        f"exchanges={_node_ids(plan, 'Exchange')}",
        f"python_boundaries={_node_ids(plan, py_pat)}",
        f"codegen_spans={n_wsc}",
        f"nested_loop_joins={_node_ids(plan, nlj_pat)}",
        f"global_sorts={n_gsort}",
    ]
    return plan, ", ".join(checks), _runtime_counters(df)


def _runtime_counters(df) -> str:
    """Execute the query through its OWN QueryExecution and read the
    FINAL adaptive plan. AQE's exchange reuse and broadcast conversions
    happen at runtime as query stages materialize — the pre-execution
    explain above shows ZERO ReusedExchange for plans where the final
    plan reuses many (the round-6 frequency_over_time read: 29 static
    exchanges / 0 reuse, but the executed plan carries 7 ReusedExchange
    + 9 BroadcastQueryStage; a persist added on that misreading
    measured 3x SLOWER — concurrent leaf stages race to materialize
    the cache). Pre-execution exchange counts are an upper bound, not
    what runs."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    fplan = qe.executedPlan().toString()
    return ", ".join([
        f"reused_exchanges={len(re.findall('ReusedExchange', fplan))}",
        f"broadcast_stages={len(re.findall('BroadcastQueryStage', fplan))}",
        f"shuffle_stages={len(re.findall('ShuffleQueryStage', fplan))}",
        f"final_plan={'isFinalPlan=true' in fplan}",
    ])


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=16,
                      app_name="jtse-explain")
    queries = entrymod.queries()
    out = ["# PLANS — physical-plan audit of the headline queries",
           "",
           f"Generated by `python tools/explain_audit.py {SF_DIR}`. Each "
           "section shows `.explain('formatted')` plus mechanical counters "
           "(exchanges = shuffles; python_boundaries = Arrow JVM<->Python "
           "crossings; nested_loop_joins should be 0 except deliberate "
           "broadcast cross joins; global_sorts should be 0 on the data "
           "path; codegen_spans reads 0 under AQE because the pre-execution "
           "plan hides WholeStageCodegen markers — all relational stages "
           "here are stock codegen-eligible operators). Each section also "
           "EXECUTES the query and reports the FINAL adaptive plan's "
           "runtime counters: AQE reuses exchanges and converts joins to "
           "broadcast as stages materialize, so the static exchange count "
           "is an upper bound — read `reused_exchanges`/`broadcast_stages` "
           "for what actually ran.", ""]
    for name, claim in AUDITED:
        df = queries[name](spark, SF_DIR)
        plan, counters, runtime = audit(name, df)
        spark.catalog.clearCache()
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Design claim:** {claim}")
        out.append("")
        out.append(f"**Counters:** {counters}")
        out.append("")
        out.append(f"**Executed (final AQE plan):** {runtime}")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
