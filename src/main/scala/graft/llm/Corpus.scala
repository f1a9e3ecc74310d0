package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-management operators for a training-data pipeline:
  * deterministic splits, stratified sampling, PII redaction and
  * duplicate-cluster resolution. Everything is a narrow map or a
  * key-bounded shuffle, and every pseudo-random decision is an
  * md5-of-key derivation — reproducible on any cluster size, no RNG
  * state, and expressible verbatim in the DuckDB oracle.
  */
object Corpus {

  /** Uniform [0, 100) bucket from the row key: md5 → first 8 hex chars
    * → mod 100. Engine-portable (DuckDB:
    * ('0x'||substr(md5(CAST(k AS VARCHAR)),1,8))::BIGINT % 100). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Deterministic train/val/test assignment by key hash — the
    * standard leakage-safe split: membership depends only on the key,
    * so re-runs, late-arriving shards and cluster resizing can never
    * move a document across splits. */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic stratified sample: within each stratum, keep the
    * `frac` fraction of rows with the smallest md5(key) — an
    * order-free, reproducible "random" sample per group (ceil so a
    * non-empty stratum always contributes ≥ 1 row). One shuffle on the
    * stratum key; the window is a top-k per group, not a global sort. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      frac: Double): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val cw = Window.partitionBy(col(stratumCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rk") <= ceil(col("__n") * frac))
      .drop("__rk", "__n")
  }

  /** PII redaction: emails, URLs and long digit runs replaced with
    * typed placeholder tokens (the standard pre-training scrub). Pure
    * regexp_replace — rides the scan, codegen'd, no UDF. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"), lit("<EMAIL>"))
    val url = regexp_replace(email, lit("https?://[^\\s]+"), lit("<URL>"))
    regexp_replace(url, lit("[0-9]{4,}"), lit("<NUM>"))
  }

  /** Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    * components by iterative min-label propagation. Each iteration is
    * one join + one aggregate over the edge list; labels converge in
    * O(component diameter) rounds (near-dup clusters are shallow — a
    * handful of rounds in practice; for adversarial chain-shaped
    * graphs switch to the large-star/small-star variant, same
    * primitives). Input: (id_a, id_b) pairs; output: (id, cluster_id)
    * where cluster_id = min id of the component — deterministic, so a
    * DuckDB recursive-CTE oracle checks it exactly. */
  def dupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      localThreshold: Long = 1L << 20): DataFrame = {
    // Small-graph fast path: below the threshold the edge list is
    // collected and solved with union-find on the driver — the same
    // size-gated driver materialization Spark itself performs for
    // broadcast joins, and it collapses an O(diameter)-round job loop
    // into one job. Near-dup edge lists are pair-verified output, so
    // at 100 TB they are orders of magnitude smaller than the corpus;
    // graphs beyond the threshold take the distributed loop below.
    val pairRows = pairs.select(col(idA).cast("long"), col(idB).cast("long"))
    if (pairRows.count() <= localThreshold) {
      val es = pairRows.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // min root wins → deterministic labels
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "cluster_id")
    }
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionAll(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("dst_label")).as("nbr"))
      val updated = labels
        .join(nbrMin.select(col("src").as("id"), col("nbr")), Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("newl"))
        .persist()
      changed = updated.filter(col("newl") < col("label")).count()
      val old = labels
      labels = updated.select(col("id"), col("newl").as("label")).persist()
      old.unpersist()
    }
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
