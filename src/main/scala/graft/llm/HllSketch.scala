package graft.llm

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog (p=8, 256 registers, md5-derived).
  *
  * Unlike Spark's `approx_count_distinct` (whose HLL++ sketch is
  * engine-private), every piece here is reproducible on any engine:
  * bucket = first 8 bits of md5, rank = 25 − bitlength of the next 24
  * bits, estimate = raw harmonic mean (α·m²/Σ2^−rank). All 2^−rank
  * terms are exact powers of two, and their sums stay < 2^53 — so the
  * floating-point total is EXACT and therefore independent of shuffle
  * order and engine. The DuckDB oracle implements the identical sketch
  * in SQL and hash-matches (q46).
  *
  * Two forms, value-identical (tested):
  *  - column pipeline ([[registers]]/[[estimateFromRegisters]]) —
  *    group-by friendly, whole-stage codegen;
  *  - typed [[HllAggregator]] (`Aggregator[IN,BUF,OUT]`, SURVEY §7.3)
  *    for the Dataset API / `mapGroups`-style consumers.
  */
object HllSketch {
  val P = 8
  val M: Int = 1 << P                   // 256 registers
  val MaxRank = 25                      // 24 hash bits + 1
  val Alpha: Double = 0.7213 / (1 + 1.079 / M)

  /** Per-row (bucket, rank) from md5: first 2 hex chars → bucket,
    * next 6 hex chars (24 bits) → rank. */
  def bucket(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 2), 16, 10).cast("int")

  def rank(c: Column): Column = {
    val bits = conv(substring(md5(c.cast("string")), 3, 6), 16, 10).cast("long")
    when(bits === 0L, lit(MaxRank))
      .otherwise(lit(MaxRank) - length(bin(bits)))
  }

  /** Scalar mirrors of [[bucket]]/[[rank]] (used by the Aggregator and
    * tests; must stay in lockstep with the column forms). */
  def bucketOf(s: String): Int =
    Integer.parseInt(md5Hex(s).substring(0, 2), 16)
  def rankOf(s: String): Int = {
    val bits = java.lang.Long.parseLong(md5Hex(s).substring(2, 8), 16)
    if (bits == 0L) MaxRank
    else MaxRank - java.lang.Long.toBinaryString(bits).length
  }
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Harmonic estimate from a full register vector (0 = empty). */
  def estimate(regs: Array[Int]): Double = {
    var harmonic = 0.0
    var i = 0
    while (i < M) { harmonic += 1.0 / (1L << regs(i)); i += 1 }
    Alpha * M * M / harmonic
  }

  /** Typed sketch aggregator: BUF = register vector, merge =
    * element-wise max (associative + commutative + idempotent — the
    * properties that make the sketch shuffle-order-proof). */
  class HllAggregator extends Aggregator[String, Array[Int], Double] {
    override def zero: Array[Int] = new Array[Int](M)
    override def reduce(b: Array[Int], a: String): Array[Int] = {
      if (a != null) {
        val idx = bucketOf(a); val r = rankOf(a)
        if (r > b(idx)) b(idx) = r
      }
      b
    }
    override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(b: Array[Int]): Double = estimate(b)
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def hllDistinct: Column =
    udaf(new HllAggregator, Encoders.STRING).apply(col("__hll_in"))
}
