package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fixed-width histogram quantile sketch.
  *
  * The mergeable-state path for percentiles at 100 TB: per group the
  * ENTIRE sketch state is `bins` counters — built with one partial-agg
  * shuffle (map-side combine does most of the work), mergeable across
  * batches/partitions by plain addition, and the quantile read-out is
  * arithmetic over the counters. Contrast with exact percentiles
  * (q50), which need a full sort or all values in memory per group.
  *
  * Estimate contract (deterministic, engine-portable): quantile p =
  * LEFT EDGE of the first bucket whose cumulative count reaches
  * `ceil(p·n)`. Error is bounded by one bucket width `(hi−lo)/bins`.
  * All arithmetic is plain IEEE double with the same expression shape
  * the DuckDB oracle uses, so estimates hash-match exactly.
  */
object HistogramSketch {

  /** Clamped equal-width bucket index for `v` over [lo, hi); NULL in,
    * NULL out. (greatest/least skip nulls, so without the guard a null
    * value would silently land in bucket 0 — a fabricated observation
    * at `lo`; percentile semantics ignore nulls.) */
  def bucketOf(v: Column, lo: Double, hi: Double, bins: Int): Column =
    when(v.isNotNull, least(greatest(
      floor((v.cast("double") - lit(lo)) * bins / (hi - lo)).cast("long"),
      lit(0L)), lit(bins - 1L)))

  /** Sketch state: (group, bucket, cnt) — the thing you would persist
    * or merge across incremental batches (counts add). Null values are
    * not observations: excluded here, so `n` at read-out is the
    * non-null count, as with any SQL percentile. */
  def build(df: DataFrame, valueCol: String, grpCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(grpCol).as("grp"),
        bucketOf(col(valueCol), lo, hi, bins).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile read-out from sketch state. `ps` = (output column name,
    * percentile in (0,1]). */
  def quantiles(state: DataFrame, lo: Double, hi: Double, bins: Int,
      ps: Seq[(String, Double)]): DataFrame = {
    val cumW = Window.partitionBy(col("grp")).orderBy(col("bucket"))
    val allW = Window.partitionBy(col("grp"))
    val c = state
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(allW))
    val width = (hi - lo) / bins // one Scala-double division, same IEEE as SQL
    val aggs = ps.map { case (name, p) =>
      (lit(lo) + lit(width) *
        min(when(col("cum") >= ceil(lit(p) * col("n")), col("bucket"))))
        .as(name)
    }
    c.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
  }

  /** build + read-out in one call. */
  def estimate(df: DataFrame, valueCol: String, grpCol: String,
      lo: Double, hi: Double, bins: Int,
      ps: Seq[(String, Double)]): DataFrame =
    quantiles(build(df, valueCol, grpCol, lo, hi, bins), lo, hi, bins, ps)
}
