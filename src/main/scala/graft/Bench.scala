package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): one JSON line with per-query and
  * total wall seconds on SPARK_GRAFT_SF_DIR. */
object Bench {

  /** The PINNED longitudinal subset: the 130 queries of the `485ff45`
    * quiet board (round 13). The interleaved board grows every round
    * and board size alone moved the round-over-round min-sum signal
    * 0.83× → 1.2× between r14 and r15 (larger working set + GC, zero
    * code change on the common queries) — so cross-round latency
    * claims anchor on THIS set, re-run sequentially after the full
    * board with the same membership every round, reported as
    * `fixed_subset` in BENCH_FULL. Do not edit the membership; a new
    * anchor means a new baseline. */
  val FixedSubset: Set[String] = Set(
    "q100_tpch_q21_shape", "q101_tpch_q2_shape", "q102_tpch_q4_shape",
    "q103_tpch_q6_shape", "q104_tpch_q8_shape", "q105_tpch_q9_shape",
    "q106_tpch_q12_shape", "q107_tpch_q13_shape", "q108_tpch_q17_shape",
    "q109_tpch_q20_shape", "q10_setops", "q110_metric_offset",
    "q111_saved_crossmodel", "q112_ctas_script",
    "q113_conversion_metric", "q114_gopher_repetition",
    "q115_contamination", "q116_image_resize", "q117_hourly_metric",
    "q118_c4_filters", "q119_paragraph_dedup", "q11_hex_decode",
    "q120_bpe_tokens", "q121_mixture_sample", "q122_token_shards",
    "q123_percentile_metric", "q124_epoch_repeat", "q125_lm_perplexity",
    "q126_substring_dedup", "q127_incr_embed_neardup", "q128_url_dedup",
    "q129_quality_classifier", "q12_epoch_iso", "q130_domain_cap",
    "q131_substring_rewrite", "q13_watermark_max",
    "q14_incremental_delta", "q15_chunked_report", "q16_dim_fanout",
    "q17_text_stats", "q18_lang_id", "q19_token_regex",
    "q1_pricing_summary", "q20_fingerprint", "q21_dedup_exact",
    "q22_minhash_sig", "q23_lsh_pairs", "q24_lsh_survivors",
    "q25_simhash", "q26_embed_topk", "q27_ann_lsh", "q29_hourly_events",
    "q2_revenue_by_month", "q30_json_props", "q31_media_meta",
    "q32_media_features", "q33_sql_script", "q34_range_scan",
    "q35_scalar_strings", "q36_scalar_dates", "q37_conditionals",
    "q38_sessionize", "q3_region_revenue", "q40_topn_per_group",
    "q41_stats", "q42_semi_anti", "q43_asof_join", "q44_ivf_topk",
    "q45_scalar_math", "q46_hll_distinct", "q47_collect_sorted",
    "q48_pivot", "q49_weekly_granularity", "q4_promo_revenue",
    "q50_quantiles", "q51_chunk_explode", "q52_quality_flags",
    "q53_correlated_subquery", "q54_in_subquery", "q55_range_frame",
    "q56_embed_neardup", "q57_dup_clusters", "q58_hash_split",
    "q59_stratified_sample", "q5_orders_by_priority", "q60_pii_redact",
    "q61_asof_native", "q62_window_ranks", "q63_cube", "q64_array_ops",
    "q65_arg_minmax", "q66_range_join", "q67_setops_all",
    "q68_regexp_extract", "q69_tfidf", "q6_top_customers", "q70_bigrams",
    "q71_derived_metric", "q72_salted_agg", "q73_tpch_q3_shape",
    "q74_tpch_q5_shape", "q75_ivf_kmeans", "q76_cms_heavyhitters",
    "q77_time_spine", "q78_pct_of_total", "q79_cumulative_metric",
    "q7_distinct_counts", "q7a_approx_distinct", "q80_manifest_metrics",
    "q81_image_decode", "q82_tpch_q7_shape", "q83_tpch_q10_shape",
    "q84_tpch_q14_shape", "q85_tpch_q19_shape", "q86_audio_decode",
    "q87_window_offsets", "q88_edit_distance", "q89_cross_model_metrics",
    "q8_rollup_nation", "q90_hist_quantiles", "q91_unpivot",
    "q92_corpus_pipeline", "q93_tpch_q11_shape", "q94_tpch_q16_shape",
    "q95_tpch_q18_shape", "q96_tpch_q22_shape", "q97_video_decode",
    "q98_filtered_metrics", "q99_tpch_q15_shape", "q9_window_events")
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up (untimed): run every query once at the smallest SF. This
    // compiles each query's whole-stage codegen and JITs the hot loops
    // (the generated classes are cached by source text, so the timed
    // sf run reuses them), and initializes the scheduler/shuffle/
    // broadcast machinery. At bench SFs the one-time compile cost
    // otherwise dominates several sub-second queries.
    // Execute each query AS WRITTEN: `df.count()` plans a new
    // aggregate on top, letting Catalyst prune every output column —
    // and with them eliminate sorts and even unique-key outer joins
    // feeding only those columns — so a query ending in a projection
    // or left join would be timed as a bare row-count of its inputs.
    // Evaluating the executed plan's RDD materializes every output
    // column (the noop-sink benchmarking pattern) without collecting
    // anything to the driver.
    def exec(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }

    val warmDir = "/root/testdata/sf0.001"
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1"
        && new java.io.File(warmDir).exists()) {
      SparkEntry.queries.values.foreach { fn =>
        try { exec(fn(spark, warmDir)) } catch { case _: Throwable => () }
      }
    }

    // INTERLEAVED min-of-N timing: single-shot numbers on a shared
    // machine are noise-dominated, and back-to-back repeats of one
    // query all land inside the same transient load window (round-4's
    // driver run had a contiguous block of queries 2-18x slower than
    // the same commit minutes earlier — all three samples taken inside
    // the spike). So the suite runs as N ROUND-ROBIN PASSES: every
    // query once, then every query again. A load window shorter than
    // N-1 full passes inflates some of each query's samples but leaves
    // at least one quiet, and the per-query min keeps that one.
    //
    // A query that THROWS is recorded as an error, not a (fast, bogus)
    // time: its failed sample is excluded, and a query with no
    // successful sample at all is excluded from the total and surfaced
    // in "errors" — a regression must never IMPROVE the benchmark.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    // SPARK_GRAFT_ONLY=q115_contamination,q26_embed_topk : time a
    // subset (dev iteration); the driver never sets it, so the
    // per-round numbers always cover the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map(_._1 -> Vector.empty[Double]): _*)
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    for (pass <- 1 to nRuns; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        exec(fn(spark, sfDir))
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160)
      }
      // settle the heap between passes: carrying another pass's garbage
      // into a timed sample is self-inflicted contention
      if (pass < nRuns && name == names.last._1) System.gc()
    }

    // FIXED-SUBSET longitudinal anchor: after the full board, re-run
    // the pinned 130-query `485ff45` set for SPARK_GRAFT_FIXED_RUNS
    // (default 2) additional round-robin passes with a settled heap.
    // The full board grows every round, and its size alone moves the
    // common-query min-sum (r14 → r15: 0.83× → 1.2× with zero code
    // change on those queries); this subset has FIXED membership and
    // load shape, so its min-sum is the number to compare across
    // rounds. Skipped when SPARK_GRAFT_ONLY narrows the run (dev
    // iteration) or FIXED_RUNS=0.
    // 3 passes: the anchor is the round-over-round signal and a
    // min-of-2 still inherited ambient load windows (87 vs 102 s on
    // two same-day runs of identical code); one more pass buys the
    // min another chance at a quiet window for ~90 s of bench time
    val nFixedRuns = sys.env.getOrElse("SPARK_GRAFT_FIXED_RUNS", "3").toInt
    val fixedNames =
      if (only.isDefined || nFixedRuns <= 0) Seq.empty
      else names.filter { case (n, _) => FixedSubset.contains(n) }
    val fixedSamples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      fixedNames.map(_._1 -> Vector.empty[Double]): _*)
    if (fixedNames.nonEmpty) System.gc()
    for (pass <- 1 to (if (fixedNames.nonEmpty) nFixedRuns else 0);
         (name, fn) <- fixedNames) {
      val t0 = System.nanoTime()
      try {
        exec(fn(spark, sfDir))
        fixedSamples(name) = fixedSamples(name) :+ (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => () }
      if (pass < nFixedRuns && name == fixedNames.last._1) System.gc()
    }

    val results = names.map { case (k, _) => k -> samples(k).sorted }
    def med(ts: Seq[Double]): Double = ts(ts.length / 2)
    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val timed = results.filter(_._2.nonEmpty)
    // Headline = per-query MIN across passes. External load on a shared
    // machine can only INFLATE a sample, never deflate it (observed
    // pass-to-pass spreads up to 16x on sub-2s queries), so with N
    // round-robin passes the min is the estimator of the code's
    // intrinsic cost that a load window shorter than (N-1) passes
    // cannot touch; medians at those spreads tracked machine load, not
    // regressions. Medians stay in "value_median"/"runs" for the
    // load-vs-regression diagnosis.
    val qs = timed.map { case (k, ts) => "\"" + k + "\":" + f3(ts.head) }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, ts) =>
      val err = errs.get(k).map(m => s""","err":"$m"""").getOrElse("")
      if (ts.isEmpty) "\"" + k + s"""":{"n":0$err}"""
      else "\"" + k +
        s"""":{"median":${f3(med(ts))},"min":${f3(ts.head)},"max":${f3(ts.last)},"n":${ts.length}$err}"""
    }.mkString("{", ",", "}")
    val totalMedian = timed.map(r => med(r._2)).sum
    val total = timed.map(r => r._2.head).sum
    val errsJson = errs.map { case (k, m) => "\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val fixedTimed = fixedNames.map(_._1).map(k => k -> fixedSamples(k).sorted)
      .filter(_._2.nonEmpty)
    val fixedSum = fixedTimed.map(_._2.head).sum
    val fixedJson =
      if (fixedTimed.isEmpty) "null"
      else {
        val fq = fixedTimed.map { case (k, ts) => "\"" + k + "\":" + f3(ts.head) }
          .mkString("{", ",", "}")
        s"""{"value":${f3(fixedSum)},"estimator":"min","n_queries":${fixedTimed.length},"passes":$nFixedRuns,"queries":$fq}"""
      }
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"estimator":"min","value_median":${f3(totalMedian)},"unit":"sec","passes":$nRuns,"queries":$qs,"errors":$errsJson,"fixed_subset":$fixedJson,"runs":$detail,"sf":"$sfDir"}"""

    // The harness that records this run keeps only a bounded tail of
    // stdout (observed: 2000 chars), and the full per-query line above
    // is ~9 KB — far too long to survive the tail or to json-parse from
    // it. So: (a) persist the full line to a file next to the build so
    // it can be committed and read later, and (b) print a COMPACT
    // summary as the LAST line, sized to fit entirely inside a 2 KB
    // tail even with the build tool's epilogue after it.
    try {
      val w = new java.io.PrintWriter(new java.io.File("BENCH_FULL.json"), "UTF-8")
      try w.println(fullLine) finally w.close()
    } catch { case _: Throwable => () }
    println(fullLine)
    val slowest = timed.sortBy(r => -r._2.head).take(12)
      .map { case (k, ts) => "\"" + k + "\":" + f3(ts.head) }
      .mkString("{", ",", "}")
    val fixedCompact =
      if (fixedTimed.isEmpty) "" else s""","fixed_subset":${f3(fixedSum)}"""
    println(
      s"""{"metric":"total","value":${f3(total)},"estimator":"min","value_median":${f3(totalMedian)},"unit":"sec","n_queries":${timed.length},"n_errors":${errs.size},"passes":$nRuns$fixedCompact,"slowest":$slowest,"detail_file":"BENCH_FULL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
