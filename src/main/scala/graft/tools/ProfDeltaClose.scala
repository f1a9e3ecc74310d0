package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the q292 nightly close: FULL-log re-close
  * (incrementalBlockedDedupClusters) vs DELTA-AWARE close
  * (incrementalBlockedDedupClustersFromState) over the same persisted
  * artifacts — interleaved passes so a load window can't bias one
  * variant. Usage: runMain graft.tools.ProfDeltaClose [sfDir] [passes]. */
object ProfDeltaClose {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val p = java.nio.file.Files.createTempDirectory("graft-profdc").toString
    val existing = docs.filter(col("doc_id") % 4 =!= 0)
    graft.llm.Dedup.signatureTable(existing, "doc_id", "text")
      .write.parquet(s"$p/sig")
    graft.llm.Dedup.sortKeyTable(existing, "doc_id", "text")
      .write.parquet(s"$p/sk")
    graft.llm.Dedup.simhashTable(existing, "doc_id", "text")
      .write.parquet(s"$p/fp")
    graft.llm.Dedup.blockedDedupPairs(existing, "doc_id", "text")
      .write.parquet(s"$p/pairs")
    graft.llm.Corpus.dupClusters(spark.read.parquet(s"$p/pairs"))
      .write.parquet(s"$p/clusters")
    val batch = docs.filter(col("doc_id") % 4 === 0)
    def t(art: String): DataFrame = spark.read.parquet(s"$p/$art")
    def full(): DataFrame = graft.llm.Dedup.incrementalBlockedDedupClusters(
      t("sig"), t("sk"), t("fp"), t("pairs"), batch, "doc_id", "text")
    def delta(): DataFrame =
      graft.llm.Dedup.incrementalBlockedDedupClustersFromState(
        t("sig"), t("sk"), t("fp"), t("pairs"), t("clusters"), batch,
        "doc_id", "text")
    def time(tag: String, f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $s%.3f s"); s
    }
    // untimed warm-up of each variant (codegen + JIT)
    time("warm full ", full); time("warm delta", delta)
    val (fs, ds) = (Array.ofDim[Double](passes), Array.ofDim[Double](passes))
    for (i <- 0 until passes) {
      fs(i) = time(s"full  pass ${i + 1}", full)
      ds(i) = time(s"delta pass ${i + 1}", delta)
    }
    println(f"full  min ${fs.min}%.3f s median ${fs.sorted.apply(passes / 2)}%.3f s")
    println(f"delta min ${ds.min}%.3f s median ${ds.sorted.apply(passes / 2)}%.3f s")
    spark.stop()
  }
}
