package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §0 scale mandate).
  *
  * When one join key carries a disproportionate share of rows (a "null
  * user", a celebrity id), a plain shuffle join puts that key's entire
  * volume on one reducer. Salting splits the big side's hot keys across
  * `factor` sub-partitions and replicates the small side `factor` times,
  * so the hot key fans out over `factor` reducers.
  *
  * AQE's skew-join handling (enabled in Bench) covers sort-merge cases
  * automatically; explicit salting remains the tool for aggregations and
  * for engines/plans AQE doesn't rewrite.
  *
  * The salt is derived from deterministic row content (a stable column),
  * not rand(), so retried tasks produce identical partitions — required
  * for exactly-once sinks at scale. */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, factor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", pmod(hash(saltFrom), lit(factor)))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for hot grouping keys —
    * partial aggregate on (key, salt), final on key. Spark already does
    * map-side partial aggregation; this helps when a single key
    * overwhelms even the partial-aggregated reduce side (e.g. huge
    * count-distinct state per key). `aggs` must be decomposable
    * (sum/count/min/max). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltFrom: Column, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Salted two-phase sum in the EXACT-decimal pattern: partials and
    * final accumulate in decimal, so the result is bit-identical to
    * the single-phase aggregate no matter how the salt scatters rows —
    * the hot-key-safe shape that still hash-matches an oracle. */
  def saltedDecimalSum(df: DataFrame, key: String, valueCol: String,
      saltFrom: Column, factor: Int, scale: Int = 2): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast(
        org.apache.spark.sql.types.DecimalType(30, scale))).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(s"sum_$valueCol"))
}
