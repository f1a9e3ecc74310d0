package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Partial-failure-proofing (r17 postmortem): the r17 driver round
    // recorded an EMPTY correctness file — the bench leg's wall-clock
    // overrun left the verify leg a starved budget, and this main used
    // to write oracle_sql.json only AFTER all ~300 per-query dumps
    // (~21 min at sf0.01), so a partial kill left the comparer nothing
    // at all. Now: (a) the oracle file is written FIRST, (b) dumps
    // land one query at a time in sorted order (deterministic partial
    // coverage), (c) an elapsed-clock governor (SPARK_GRAFT_VERIFY_
    // BUDGET seconds from entry, default 3300 ≈ 55 min — well above a
    // normal full run, a ceiling not a target) stops dumping and exits
    // 0 with everything dumped so far intact. A killed or governed run
    // now yields partial correctness rows instead of an empty record.
    val tMain = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - tMain) / 1e9
    val verifyBudget =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_BUDGET", "3300").toDouble
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.quietKnownLogFloods()
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Optional comma-separated filter for fast local iteration on a
    // subset (driver leaves it unset → full run).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val todo = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var done = 0
    var stopped = false
    for ((name, fn) <- todo if !stopped) {
      if (elapsedSec > verifyBudget) {
        System.err.println(
          s"[verify] budget ${verifyBudget}s reached after $done/${todo.length} dumps; " +
          "stopping with partial coverage (oracle_sql.json already written)")
        stopped = true
      } else {
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          done += 1
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
