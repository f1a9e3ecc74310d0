package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-size frequency estimation for heavy-hitter
  * queries over unbounded key domains — the counting companion to the
  * HLL distinct sketch ([[HllSketch]]). `depth × width` counters total
  * (a few KB) regardless of corpus size; estimates only ever
  * OVER-count (collisions add), with error ≤ 2N/width at probability
  * 1 − (1/2)^depth.
  *
  * Scale shape: the build is one explode (×depth) + one hash aggregate
  * to depth·width counters — shuffle volume is counter-count, not
  * row-count, and sketches of shards merge by cell-wise addition
  * (associative), so a 100 TB build is embarrassingly parallel.
  * Hashing is md5-derived, so any engine (or the DuckDB oracle)
  * reproduces the sketch bit-for-bit. */
object CountMin {

  /** Row-j bucket of a value: md5("cms<j>:" + x) → 32-bit int mod width. */
  def bucket(j: Int, x: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$j:"), x.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch: (row_idx, bucket, c) counters. */
  def build(df: DataFrame, key: Column,
      depth: Int = 4, width: Int = 256): DataFrame =
    df.select(posexplode(
      array((0 until depth).map(j => bucket(j, key, width)): _*))
      .as(Seq("row_idx", "bucket")))
      .groupBy("row_idx", "bucket").agg(count(lit(1)).as("c"))

  /** Point estimates for `items`: min over rows of the item's cells
    * (absent cell = 0). */
  def estimate(sketch: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    items.select(col(itemCol), posexplode(
      array((0 until depth).map(j => bucket(j, col(itemCol), width)): _*))
      .as(Seq("row_idx", "bucket")))
      .join(sketch, Seq("row_idx", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_count"))
}
