"""Headline benchmark: end-to-end pipeline + analytics + LLM operators.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>}

Unlike the correctness gate (which re-derives everything per query so
each oracle comparison is independent), the bench models a real
deployment: the staging batch and star-schema tables are derived once,
persisted, and every analytical query reads the cached tables —
pipeline cost is paid once and reported as its own line items
(``derive_staging``, ``build_star``).

Noise handling (round 4, revised round 7): every dashboard/LLM line
item runs 3x in-session; ``queries`` and ``value`` now carry per-query
MEDIANS (worst-of-3 cold effects produced phantom 2-4x "regressions"
in r6), ``first_run_queries`` / ``first_run_total`` keep the
r01-r06 first-run semantics, ``repeats`` adds per-query
median/min/max, and ``median_comparable_r2_subtotal`` is the
noise-robust baseline aggregate (PERF.md measures ~2x single-shot
swings on this shared host).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _current_round_tag() -> str:
    """Round tag for the detail file: env override, else the CURRENT
    evidence round — the highest committed CORRECTNESS_r*.json. The
    driver drops CORRECTNESS_r{N}.json *before* it runs bench, so the
    round-N bench detail is named r{N}. (The r8 "+1" variant mislabeled
    the driver's round-8 bench as BENCH_DETAIL_r09 — renamed in-repo to
    BENCH_DETAIL_r08_driver.json; see PERF.md. The r7 variant's stale
    hard-coded default had the opposite bug and clobbered the real
    BENCH_DETAIL_r06.json.) Builder-side ad-hoc runs should set
    SPARK_GRAFT_ROUND (e.g. ``09_local``) so they never collide with a
    driver artifact."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return env
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            rounds.append(int(m.group(1)))
    return "{:02d}".format(max(rounds) if rounds else 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Round-12 fix for the per-round "roaming inflation" class: a
        # 228-query bench session generates more whole-stage-codegen
        # classes than the JVM's default 240 MB code cache holds; once
        # it fills, the JIT flushes hot methods / stops compiling and a
        # position-dependent subset of line items runs interpreted at a
        # SUSTAINED 2-10x (measured: docs_decontaminate 5.8-6.3 s
        # across all three repeats vs its plan-identical 0.73 s r11
        # reading, zero GC time — BENCH_DETAIL_r12_gc16.json). A
        # deployment hits the same wall on long-lived executors:
        # spark.executor.extraJavaOptions gets the same flag.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=512m",
            ),
        )
        # The 228-query session produces far more than 100 distinct
        # whole-stage-codegen classes per pass, so the DEFAULT global
        # codegen class cache (spark.sql.codegen.cache.maxEntries=100,
        # static conf) evicts every query's classes long before its
        # in-session repeats run: each repeat re-runs Janino AND starts
        # HotSpot cold on a brand-new class identity. Which queries pay
        # depends on eviction order — the leading suspect for the
        # roaming per-round inflation (BENCH_DETAIL_r12_cc240.json
        # rules OUT code-cache exhaustion: 142 MB peak vs 240 MB cap).
        # Sized to hold every stage of the full suite; pairs with the
        # bigger ReservedCodeCacheSize above.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
        # PySpark 4's per-API-call stack capture (error-context call
        # sites) costs ~1 ms per DataFrame/Column call — material at
        # this suite's expression density. Diagnostic only.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from iot_real_time_data_pipeline_spark import llm_queries as LQ
    from iot_real_time_data_pipeline_spark.entrypoints import iot_staging
    from iot_real_time_data_pipeline_spark.operators import dashboard as D
    from iot_real_time_data_pipeline_spark.operators.star_schema import incremental_load

    times: dict[str, float] = {}
    repeats: dict[str, dict[str, float]] = {}
    REPEAT_RUNS = 3

    # Round-12 root-cause instrumentation (VERDICT r11 item 1): the
    # per-round "roaming inflation" — a DIFFERENT subset of line items
    # reading 2-8x their plan-identical baseline each session, even on
    # a quiet host — has a driver-JVM-stall signature (r12 adjudication
    # measured docs_minhash_calibration at 1.7 s and 19.5 s on
    # BACK-TO-BACK identical-cache repeats). Record the driver GC time
    # attributable to every individual run: local[N] is one JVM, so
    # these beans see executor GC too. If an inflated reading carries
    # the GC time, the regression is heap pressure, not the operator.
    _gc_beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )

    def _gc_ms() -> int:
        return int(sum(
            _gc_beans.get(i).getCollectionTime()
            for i in range(_gc_beans.size())
        ))

    gc_ms: dict[str, list[int]] = {}

    # Companion counter: JIT code-cache occupancy when each item starts.
    # The r12_gc16 run showed the roaming items carry ZERO GC time but a
    # SUSTAINED 5-10x state (docs_decontaminate 5.8/6.0/6.3 s vs its
    # 0.73 s plan-identical r11 reading) — the classic signature of the
    # HotSpot code cache filling (228 queries x repeats x whole-stage
    # codegen classes), after which the JIT flushes/disables compilation
    # and whole queries run interpreted. Java 17 segments the cache
    # (CodeHeap 'non-nmethods'/'profiled'/'non-profiled'); sum them.
    _mem_pools = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getMemoryPoolMXBeans()
    )

    def _codecache_bytes() -> int:
        tot = 0
        for i in range(_mem_pools.size()):
            b = _mem_pools.get(i)
            name = b.getName()
            if "CodeHeap" in name or "Code Cache" in name:
                tot += b.getUsage().getUsed()
        return int(tot)

    codecache_bytes_before: dict[str, int] = {}

    # Cache hygiene (opt-out via SPARK_GRAFT_BENCH_RELEASE=0): operator-
    # internal persists (postings, band frames, fingerprints) deliberately
    # outlive their operator (dedup.py's lazy-return rationale) — correct
    # for a long-lived service, but across a 135-query session they pile
    # up. At each family boundary, record how much storage memory the
    # family left behind, then drop ALL SQL caches: the next family never
    # reads the previous family's frames, so the only cost is the next
    # family rebuilding its own caches (which its line items then honestly
    # include). Peak storage per family lands in the detail JSON + PERF.md.
    release_between_families = (
        os.environ.get("SPARK_GRAFT_BENCH_RELEASE", "1") != "0"
    )
    storage_bytes_at_release: dict[str, int] = {}

    def release_caches(tag: str) -> None:
        from iot_real_time_data_pipeline_spark.operators.dedup import (
            release_session_caches,
        )

        if release_between_families:
            storage_bytes_at_release[tag] = release_session_caches(spark)
        else:
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            storage_bytes_at_release[tag] = int(
                sum(i.memSize() for i in infos)
            )

    def timed(name: str, fn):
        g0 = _gc_ms()
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        gc_ms[name] = [_gc_ms() - g0]
        return out

    def _storage_bytes() -> int:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return int(sum(i.memSize() for i in infos))

    # Root-cause instrumentation for the bench-context anomaly class
    # (r7 wav, r8 jaccard sweep — in-session readings far above their
    # isolated A/Bs): the storage memory held when each line item
    # STARTS, so any recurrence names the exact cache state it rode.
    storage_bytes_before: dict[str, int] = {}

    def timed_repeat(name: str, fn):
        """First run is the round-comparable number (same semantics as
        every earlier BENCH_r*); two more in-session repeats give a
        median + min/max so a single host-load spike (PERF.md measures
        ~2x run-to-run swings on this shared runner) can't masquerade
        as a regression. Repeats deliberately ride whatever caches the
        first run left (operator-internal persists): identical work,
        so the spread isolates *noise*, not data-dependent variance.
        """
        storage_bytes_before[name] = _storage_bytes()
        codecache_bytes_before[name] = _codecache_bytes()
        runs = []
        gcs = []
        for _ in range(REPEAT_RUNS):
            g0 = _gc_ms()
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
            gcs.append(_gc_ms() - g0)
        gc_ms[name] = gcs
        times[name] = round(runs[0], 3)
        runs_sorted = sorted(runs)
        repeats[name] = {
            "median": round(runs_sorted[len(runs) // 2], 3),
            "min": round(runs_sorted[0], 3),
            "max": round(runs_sorted[-1], 3),
        }

    # --- pipeline: derive + validate + stage (once, cached) ---------------
    def _derive():
        staging = iot_staging(spark, sf_dir).persist()
        staging.count()  # materialize
        return staging

    staging = timed("derive_staging", _derive)

    # Diagnostic: the same validate+stage computation re-run WARM — a
    # plan-differentiated copy (the no-op filter defeats cache-manager
    # plan matching above the raw-events cache, so flags/arrays/staging
    # genuinely recompute) after JIT/janino/session warmup has been
    # paid. The cold-vs-warm split separates one-time startup cost from
    # per-row cost; reported as its own line item, EXCLUDED from the
    # headline total (it re-does work the deployment does once).
    def _derive_warm():
        from pyspark.sql import functions as F

        from iot_real_time_data_pipeline_spark.entrypoints import iot_raw_events
        from iot_real_time_data_pipeline_spark.functions.alerts import with_alerts
        from iot_real_time_data_pipeline_spark.functions.validation import (
            attach_validation_arrays,
        )
        from iot_real_time_data_pipeline_spark.operators.pipeline import (
            process_events,
            to_staging,
        )

        raw = iot_raw_events(spark, sf_dir).filter(F.lit(True))
        flagged = process_events(raw, assemble=False)
        to_staging(attach_validation_arrays(with_alerts(flagged))).count()

    timed("derive_staging_warm", _derive_warm)
    DIAGNOSTIC_ITEMS = {
        "derive_staging_warm", "docs_bpe_train_batched4",
        # Isolated dup-graph re-measurements (see the iso_ block below):
        # the work is already counted by the in-block line items.
        "iso_docs_pagerank", "iso_docs_labelprop_communities",
        "iso_docs_detector_agreement",
        # Cold canaries (round 13, VERDICT r12 item 7): one events and
        # one wh item re-run AFTER the family cache release, i.e. on an
        # unpersisted scan — the pre-r12 per-item cost model — so future
        # round-over-round family deltas stay interpretable against the
        # warm-table accounting. Diagnostic: their work is already
        # counted once by the in-family line items.
        "events_sessionize_cold_canary", "wh_q1_pricing_summary_cold_canary",
    }

    # --- star build (once, cached) ----------------------------------------
    def _star():
        star = incremental_load(staging, existing=None, dense_keys=False)
        out = {name: df.persist() for name, df in star.items()}
        # One action materializes all five caches: the fact plan reads
        # through the dims' persist markers, so their InMemoryRelations
        # are built inside the same job instead of one job per table
        # (4 fewer rounds of fixed job-scheduling overhead).
        out["fact_sensor_readings"].count()
        for name, df in out.items():
            df.count()
        return out

    star = timed("build_star", _star)
    fact = star["fact_sensor_readings"]

    # S5 lake round-trip: write-once partitioned lake + pruned read-back
    # (first run pays the write; the repeats measure the pruned scan).
    from iot_real_time_data_pipeline_spark import driver_queries as DQ

    timed_repeat(
        "staging_from_lake",
        lambda: DQ.q_staging_from_lake(spark, sf_dir).collect(),
    )

    # T2 exact-greedy throttle, batch replay form (round 9): the
    # sequential per-key fold the stateful streaming op applies,
    # JVM-side via aggregate().
    timed_repeat(
        "throttled_alerts_stateful_replay",
        lambda: DQ.q_throttled_alerts_stateful_replay(spark, sf_dir).collect(),
    )

    # --- dashboard queries over the cached star ---------------------------
    timed_repeat("d1_avg_temperature", lambda: D.avg_temperature(fact).collect())
    timed_repeat("d2_avg_humidity", lambda: D.avg_humidity(fact).collect())
    timed_repeat("d3_avg_wind_speed",
          lambda: D.avg_wind_speed(fact, star["dim_weather"]).collect())
    timed_repeat("d4_health_donut", lambda: D.health_donut(fact).collect())
    timed_repeat("d5_temp_humidity_by_hour",
          lambda: D.temp_humidity_by_hour(fact, star["dim_time"]).collect())
    timed_repeat("d6_wind_direction",
          lambda: D.wind_direction_counts(fact, star["dim_weather"]).collect())
    timed_repeat("d7_nutrient_levels",
          lambda: D.nutrient_levels(fact, star["dim_soil"]).collect())
    timed_repeat("d8_readings_by_location",
          lambda: D.readings_by_location(fact, star["dim_location"]).collect())
    timed_repeat("d9_water_level_by_farm",
          lambda: D.water_level_by_farm(fact, star["dim_location"]).collect())

    release_caches("after_iot_dashboard")

    # --- LLM-data operators ----------------------------------------------
    # Warm deployment model: the corpus tables are hot. Persisting the
    # same scan plan the queries build lets Spark's cache manager
    # redirect every query's scan to the shared InMemoryRelation; the
    # load cost is reported as its own line item.
    from iot_real_time_data_pipeline_spark.entrypoints import read_table

    def _load_corpus():
        for t in ("documents", "embeddings"):
            read_table(spark, sf_dir, t).persist().count()

    timed("load_corpus_tables", _load_corpus)

    # Family-scoped near-dup edge frame (round 10, VERDICT r9 item 6):
    # the banded-LSH candidate pairs at the default threshold are the
    # shared input of the dup-graph stack (dup_clusters, canonical_best,
    # pagerank, labelprop, dup_graph_stats, detector_agreement, ...) —
    # each was silently re-deriving shingles → signatures → bands →
    # verified pairs. Persisting the pairs plan once lets Spark's cache
    # manager redirect every query's matching subplan to the
    # InMemoryRelation. Priming cost is paid and reported HERE as its
    # own line item (the load_corpus_tables accounting pattern); the
    # block-boundary cache releases re-warm it untimed below.
    def _prime_pairs():
        from iot_real_time_data_pipeline_spark.operators import dedup as DD

        pairs = DD.minhash_lsh_pairs(
            read_table(spark, sf_dir, "documents"),
            threshold=LQ.JACCARD_THRESHOLD,
        ).persist()
        pairs.count()

    timed("prime_neardup_pairs", _prime_pairs)


    # The LLM family is ~115 line items in one block: by round 8 its
    # tail queries rode ~90 queries' worth of accumulated operator-
    # internal persists, and twice in two rounds a tail query read
    # 5-9x its isolated A/B (r7 mm_wav_decimate, r8
    # docs_jaccard_threshold_sweep — both fine in a fresh JVM). Cap
    # the accumulation: release ALL caches every LLM_RELEASE_BLOCK
    # queries, then re-warm the two corpus-table persists UNTIMED
    # (their load cost was already paid and reported once as
    # load_corpus_tables; related operator pairs sit adjacently in the
    # list, so intra-block cache reuse survives).
    LLM_RELEASE_BLOCK = 25
    for _i, name in enumerate([
        "docs_exact_dedup",
        "docs_shingle_jaccard_pairs",
        "docs_minhash_lsh_pairs",
        "docs_containment_pairs",
        "docs_simhash",
        "docs_simhash_dup_pairs",
        "docs_simhash_dup_pairs_prod",
        "docs_decontaminate",
        "docs_decontaminated_corpus",
        "docs_dup_clusters",
        "docs_stratified_sample",
        "docs_stratified_sample_exact",
        "docs_pii_scrub",
        "docs_boilerplate_scrub",
        "docs_curation",
        "docs_source_mix",
        "docs_source_lang_matrix",
        "docs_rebalanced_sample",
        "docs_repetition_stats",
        "docs_char_entropy",
        "docs_unigram_logprob",
        "docs_bigram_logprob",
        "docs_bpe_merge_candidates",
        "docs_token_stats",
        "docs_language_id",
        "docs_quality",
        "docs_fingerprints",
        "docs_tfidf_top_terms",
        "emb_cosine_topk",
        "emb_ivf_topk",
        "emb_cosine_dup_pairs",
        "emb_dup_clusters",
        "emb_label_centroids",
        "emb_norm_stats",
        "emb_int8_quantize",
        "emb_int8_topk",
        "emb_int8_rerank_topk",
        "emb_kmeans_assign",
        "emb_semantic_dedup",
        "docs_chunks",
        "docs_pack_sequences",
        "docs_length_percentiles",
        "docs_vocab_coverage",
        "docs_chunk_dups",
        "docs_hashed_classifier",
        "docs_ngram_diversity",
        "docs_pareto_frontier",
        "emb_rand_projection",
        "emb_gram_matrix",
        "docs_keyword_search",
        "docs_canonical_best",
        "docs_pagerank",
        "docs_minhash_calibration",
        "docs_bpe_train",
        "docs_profile",
        "docs_vocab_growth",
        "docs_winnow_fingerprints",
        "docs_winnow_matches",
        "docs_repeated_spans",
        "docs_quality_sweep",
        "emb_pq_codes",
        "emb_pq_topk",
        "docs_token_budget",
        "docs_incremental_dedup",
        "docs_contamination_score",
        "docs_source_dup_matrix",
        "docs_length_weighted_sample",
        "docs_span_coverage",
        "docs_weighted_jaccard_pairs",
        "docs_perplexity_buckets",
        "docs_bpe_encode",
        "emb_recall_audit",
        "mm_image_features",
        "mm_frame_sample",
        "mm_payload_sniff",
        "mm_wav_features",
        "mm_bmp_features",
        "mm_bmp_resize_features",
        "mm_wav_decimate_features",
        "docs_gopher_filter",
        "emb_label_diversity",
        "docs_tokenizer_fertility",
        "emb_label_outliers",
        "docs_curation_v2",
        "docs_dedup_funnel",
        "emb_ivf_int8_topk",
        "docs_labelprop_communities",
        "emb_mmr_topk",
        "emb_cohort_drift",
        "emb_matryoshka_recall",
        "docs_bm25_topk",
        "emb_knn_label_audit",
        "mm_wav_frame_energy",
        "docs_dup_graph_stats",
        "docs_detector_agreement",
        "emb_pq_distortion",
        "mm_image_dup_stats",
        "docs_temperature_mix",
        "emb_ivf_balance",
        "docs_zipf_slope",
        "docs_jaccard_threshold_sweep",
        "emb_hard_negatives",
        "docs_dsir_weights",
        "docs_span_scrub",
        "emb_silhouette",
        "docs_source_kl",
        "emb_ivf_probe_sweep",
        "docs_dsir_resample",
        "docs_rrf_fusion",
        "emb_cluster_coreset",
        "docs_doremi_reweight",
        "docs_pii_scan_v2",
        "docs_vocab_novelty",
        "docs_weighted_sample_aes",
        "emb_kmeans_lloyd2",
        "emb_dim_stats",
        "docs_pmi_collocations",
        "emb_power_iteration",
        "docs_mixture_apportion",
    ]):
        if _i and _i % LLM_RELEASE_BLOCK == 0:
            release_caches(f"llm_block_{_i}")
            _load_corpus()
            _prime_pairs()
        fn = LQ.llm_queries()[name]
        timed_repeat(name, lambda fn=fn: fn(spark, sf_dir).collect())

    # Diagnostic: the batched BPE trainer (top-k disjoint merges/round)
    # timed next to the sequential oracle-mirror line item above —
    # excluded from totals (it re-trains the same tokenizer).
    from iot_real_time_data_pipeline_spark.operators import text_analysis as TA

    _bpe_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed_repeat(
        "docs_bpe_train_batched4",
        lambda: TA.bpe_train(_bpe_docs, batch_k=4).collect(),
    )

    # Isolated dup-graph medians (round 11, VERDICT r10 item 4): three
    # rounds of verdicts have re-adjudicated the same in-session
    # scatter on the dup-graph items, whose in-block readings ride
    # whatever cache state the ~115-item block accumulated by their
    # list position. Re-establish the canonical warm context — fresh
    # cache state, corpus tables + shared near-dup pairs frame primed
    # untimed (both costs already paid and reported once above) — then
    # 3-repeat each item. The `iso_*` medians in BENCH_DETAIL are the
    # scatter-free reference numbers; they are DIAGNOSTIC_ITEMS
    # (excluded from totals — the in-block line items already count
    # this work once).
    release_caches("before_iso_dupgraph")
    _load_corpus()
    _prime_pairs()
    for _iso in (
        "docs_pagerank",
        "docs_labelprop_communities",
        "docs_detector_agreement",
    ):
        _fn = LQ.llm_queries()[_iso]
        timed_repeat(f"iso_{_iso}", lambda _fn=_fn: _fn(spark, sf_dir).collect())

    release_caches("after_llm")

    # --- clickstream analytics over the events table ----------------------
    # Same warm-deployment model as load_corpus_tables (r12): every
    # events query re-scans + re-repartitions the events table
    # otherwise (~0.25-0.4 s per run at sf0.1, 3 runs per item).
    # Persisting the read_table plan once lets the cache manager
    # redirect every query's scan subtree; the load cost is paid and
    # reported here as its own line item.
    from iot_real_time_data_pipeline_spark import events_queries as EQ

    timed(
        "load_events_tables",
        lambda: read_table(spark, sf_dir, "events").persist().count(),
    )

    for name, fn in EQ.events_queries().items():
        timed_repeat(name, lambda fn=fn: fn(spark, sf_dir).collect())

    release_caches("after_events")

    # Cold canary (diagnostic — see DIAGNOSTIC_ITEMS): the same
    # sessionize query re-run with the family caches RELEASED, so every
    # repeat pays the parquet scan + repartition the warm in-family
    # items read from cache. Keeps the warm-table accounting auditable.
    _ev_cold = EQ.events_queries()["events_sessionize"]
    timed_repeat(
        "events_sessionize_cold_canary",
        lambda: _ev_cold(spark, sf_dir).collect(),
    )

    # --- warehouse (TPC-H-shaped) analytics -------------------------------
    from iot_real_time_data_pipeline_spark import warehouse_queries as WQ

    def _load_wh():
        for t in ("lineitem", "orders", "customer", "part", "supplier",
                  "nation", "region"):
            read_table(spark, sf_dir, t).persist().count()

    timed("load_wh_tables", _load_wh)

    for name, fn in WQ.warehouse_queries().items():
        timed_repeat(name, lambda fn=fn: fn(spark, sf_dir).collect())

    release_caches("after_wh")

    # Cold canary for the wh family (diagnostic; see the events twin).
    _wh_cold = WQ.warehouse_queries()["wh_q1_pricing_summary"]
    timed_repeat(
        "wh_q1_pricing_summary_cold_canary",
        lambda: _wh_cold(spark, sf_dir).collect(),
    )

    total = round(
        sum(v for k, v in times.items() if k not in DIAGNOSTIC_ITEMS), 3
    )
    # The r2-comparable subtotal is the EXACT BENCH_r02 query list (an
    # inclusion set): new line items in any later round can never leak
    # into the round-over-round baseline comparison. ONE deliberate
    # exception (round 10): "prime_neardup_pairs" is included because
    # the pairs-derivation cost that BENCH_r02 measured inside
    # docs_minhash_lsh_pairs now runs once in the prime step — counting
    # both keeps the subtotal conservative (same work, accounted once)
    # instead of letting the cache redirect silently shrink it.
    R2_QUERY_SET = {
        "prime_neardup_pairs",
        "derive_staging", "build_star", "d1_avg_temperature",
        "d2_avg_humidity", "d3_avg_wind_speed", "d4_health_donut",
        "d5_temp_humidity_by_hour", "d6_wind_direction",
        "d7_nutrient_levels", "d8_readings_by_location",
        "d9_water_level_by_farm", "load_corpus_tables",
        "docs_exact_dedup", "docs_shingle_jaccard_pairs",
        "docs_minhash_lsh_pairs", "docs_simhash", "docs_token_stats",
        "docs_language_id", "docs_quality", "docs_fingerprints",
        "docs_tfidf_top_terms", "emb_cosine_topk", "emb_ivf_topk",
        "emb_label_centroids", "mm_image_features",
    }
    comparable_r2 = round(
        sum(v for k, v in times.items() if k in R2_QUERY_SET), 3
    )
    # Noise-robust aggregates: per-query medians where repeated, the
    # single measurement otherwise. Round-over-round deltas should be
    # judged on these; `value`/`queries` keep first-run semantics for
    # continuity with BENCH_r01-r03.
    med = lambda k: repeats[k]["median"] if k in repeats else times[k]  # noqa: E731
    median_total = round(
        sum(med(k) for k in times if k not in DIAGNOSTIC_ITEMS), 3
    )
    median_comparable_r2 = round(
        sum(med(k) for k in times if k in R2_QUERY_SET), 3
    )

    # The driver captures only a ~2 KB tail of stdout (BENCH_r04 came
    # back `parsed: null` because the full per-query dict outgrew it).
    # So: print ONE COMPACT line — totals + per-family subtotals — and
    # write the complete per-query detail to a checked-in repo file.
    def _family(name: str) -> str:
        if name.endswith("_cold_canary"):
            return "cold_canary"  # diagnostic; keep out of events/wh
        if name in ("derive_staging", "build_star", "load_corpus_tables",
                    "derive_staging_warm", "load_events_tables",
                    "load_wh_tables"):
            return name
        if name[0] == "d" and name[1].isdigit():
            return "dashboard"
        return name.split("_", 1)[0]  # docs / emb / mm / events / wh

    fam_first: dict[str, float] = {}
    fam_median: dict[str, float] = {}
    for k, v in times.items():
        fam = _family(k)
        fam_first[fam] = round(fam_first.get(fam, 0.0) + v, 3)
        fam_median[fam] = round(fam_median.get(fam, 0.0) + med(k), 3)

    # r7: `queries` carries per-query MEDIANS (the noise-robust number
    # round-over-round deltas should be judged on); first-run/cold
    # numbers move to `first_run_queries` (r01-r06 `queries` semantics).
    # Worst-of-3 cold effects produced phantom 2-4x "regressions" in r6.
    median_queries = {k: med(k) for k in times}
    detail = {
        "metric": "end-to-end pipeline + analytics + llm-ops wall time",
        "value": median_total,
        "unit": "sec",
        "queries": median_queries,
        "first_run_queries": times,
        "first_run_total": total,
        "repeats": repeats,
        "repeat_runs": REPEAT_RUNS,
        "median_total": median_total,
        "median_comparable_r2_subtotal": median_comparable_r2,
        "comparable_r2_subtotal": comparable_r2,
        "family_subtotals": fam_first,
        "family_median_subtotals": fam_median,
        "cache_release_between_families": release_between_families,
        "llm_release_block": LLM_RELEASE_BLOCK,
        "storage_bytes_at_release": storage_bytes_at_release,
        "storage_bytes_before": storage_bytes_before,
        "codecache_bytes_before": codecache_bytes_before,
        "gc_ms": gc_ms,
        "sf": sf,
    }
    # Core-count suffix (round 13, VERDICT r12 item 5): the driver runs
    # the same round's bench at two core counts; without the suffix the
    # 8-core detail file overwrote the 32-core one (r12's mm per-item
    # detail was lost to exactly this).
    detail_name = "BENCH_DETAIL_r{}_c{}.json".format(_current_round_tag(), cpus)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: the printed summary still stands alone

    print(json.dumps({
        "metric": "pipeline+analytics+llm wall time",
        "value": median_total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(times),
        "repeat_runs": REPEAT_RUNS,
        "median_total": median_total,
        "first_run_total": total,
        "comparable_r2_subtotal": comparable_r2,
        "median_comparable_r2_subtotal": median_comparable_r2,
        "queries": fam_median,
        "detail_file": detail_name,
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
