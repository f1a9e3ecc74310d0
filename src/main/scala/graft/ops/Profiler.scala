package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic-schema data profiling — the "what landed in this table"
  * summary a warehouse runs on every new source before anything else
  * touches it.
  */
object Profiler {

  /** One row per column: row/non-null/distinct counts, lexicographic
    * min/max, and the most frequent value (ties to the smallest) —
    * all over the STRING rendering so the operator is
    * schema-agnostic (and the comparisons engine-portable). All-null
    * columns keep their row with null top/min/max.
    *
    * Scale shape: per column one aggregate pass and one
    * value-cardinality top-1 (group count + ordered limit 1) — the
    * plans union lazily, so Spark schedules them as independent
    * scans of the same cached/columnar source; nothing is collected
    * on the driver. */
  def profile(df: DataFrame): DataFrame = {
    require(df.columns.nonEmpty, "cannot profile a zero-column frame")
    df.columns.toSeq.map { c =>
      val s = col(c).cast("string")
      val base = df.agg(
        count(lit(1)).cast("long").as("n_rows"),
        count(s).cast("long").as("n_nonnull"),
        countDistinct(s).cast("long").as("n_distinct"),
        min(s).as("min_str"), max(s).as("max_str"))
      val top = df.filter(s.isNotNull)
        .groupBy(s.as("__v"))
        .agg(count(lit(1)).cast("long").as("top_count"))
        .orderBy(col("top_count").desc, col("__v").asc)
        .limit(1)
        .select(col("__v").as("top_value"), col("top_count"))
      base.withColumn("col_name", lit(c)).join(top, lit(true), "left")
    }.reduce(_ unionByName _)
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_str"), col("max_str"),
        col("top_value"), col("top_count"))
      .orderBy("col_name")
  }
}
