package graft.llm

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch — the bottom-k sketch
  * (Bar-Yossef et al. 2002; Beyer et al. 2007).
  *
  * Why alongside HLL ([[HllSketch]], q46): HLL registers support
  * union only — "users who did A AND B" is unanswerable from two HLL
  * sketches. A KMV sketch is a uniform sample of the hash space (the
  * k smallest hashes of the set), and samples COMPOSE: the k smallest
  * of a merged pair is the union sketch, and the fraction of the
  * union sample present in both input sketches estimates Jaccard —
  * giving |A∩B| ≈ J · |A∪B| with no access to the raw sets. The
  * audience-overlap / segment-intersection primitive a warehouse
  * needs, at k longs of state per set.
  *
  * Engine-portable by construction: the hash is the repo's md5-60bit
  * (`conv(substr(md5(x),1,15),16,10)` ≡ DuckDB
  * `('0x'||substr(md5(x),1,15))::BIGINT`), the sketch is a
  * deterministic SET (the k smallest distinct hashes — no RNG, no
  * engine-private digest), and every estimate is plain IEEE
  * arithmetic over it, so the DuckDB oracle replays estimates
  * bit-for-bit (q154). Estimator: D̂ = (k−1)·2^60 / h_(k); exact m
  * when the set has fewer than k distinct hashes.
  *
  * Scale shape: the [[KmvAggregator]] buffer is BOUNDED (≤ k longs),
  * map-side combinable, and merge is a sorted-array merge — the
  * shuffle moves one ≤k-long array per group per partition, never
  * values. Hash once per DISTINCT key when the caller pre-distincts
  * (the q46 discipline); duplicates are otherwise absorbed by the
  * set-semantics insert at the cost of re-hashing.
  */
object KmvSketch {

  val DefaultK = 256

  /** 2^60 as an exact double — the hash-space size. */
  val HashSpace: Double = 1152921504606846976.0d

  /** md5-derived 60-bit non-negative hash, portable across engines. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Bounded bottom-k aggregator over pre-hashed longs. Buffer = the
    * sorted distinct k-minimum hashes so far. */
  class KmvAggregator(k: Int = DefaultK)
    extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      if (b.length == k && h >= b(b.length - 1)) return b
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) return b // already present
      val ins = -pos - 1
      val n = math.min(b.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
      out
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var n = 0
      var last = Long.MinValue
      while (n < out.length && (i < x.length || j < y.length)) {
        val v =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
          else { val t = y(j); j += 1; t }
        if (v != last) { out(n) = v; n = n + 1; last = v }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Sketch aggregation column over a PRE-HASHED long column (null
    * keys must be filtered before hashing — hash60(null) is null). */
  def kmvAgg(hashed: Column, k: Int = DefaultK): Column =
    udaf(new KmvAggregator(k), Encoders.scalaLong).apply(hashed)

  /** Merge aggregator over ALREADY-BUILT sketches (e.g. the per-batch
    * partials of an incremental state table): same bounded buffer,
    * input rows are sketch arrays instead of hashes. */
  class KmvMergeAggregator(k: Int = DefaultK)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    private val base = new KmvAggregator(k)
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], sk: Seq[Long]): Array[Long] =
      base.merge(b, if (sk == null) Array.emptyLongArray else sk.toArray)
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      base.merge(x, y)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Sketch-merge aggregation column over a sketch-array column. */
  def kmvMergeAgg(sketches: Column, k: Int = DefaultK): Column =
    udaf(new KmvMergeAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(sketches)

  /** Distinct estimate from a sketch: exact size below k, else
    * (k−1)·2^60 / h_(k). */
  def estimate(sk: Column, k: Int = DefaultK): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sk, k).cast("double"))

  /** Union sketch of two sketches: k smallest of the merged sets —
    * exactly the sketch of A∪B. */
  def unionSketch(a: Column, b: Column, k: Int = DefaultK): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Intersection estimate from two sketches: over the union sample
    * U (size m ≤ k), the members present in BOTH sketches estimate
    * Jaccard as x/m, and |A∩B| ≈ (x/m) · D̂(A∪B). */
  def intersectEstimate(a: Column, b: Column, k: Int = DefaultK): Column = {
    val u = unionSketch(a, b, k)
    val m = size(u)
    val x = size(array_intersect(array_intersect(u, a), b))
    (x.cast("double") / m) * estimate(u, k)
  }
}
