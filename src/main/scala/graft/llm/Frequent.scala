package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries heavy hitters (Misra & Gries '82; the SpaceSaving /
  * "frequent" family): the deterministic bounded-state frequent-items
  * sketch. One pass, state ≤ `capacity` counters per partition,
  * mergeable — the counterpart to [[CountMin]] (probabilistic,
  * fixed-width) with a DETERMINISTIC guarantee:
  *
  *   true − n/(capacity+1)  ≤  estimate  ≤  true
  *
  * and every item with true count > n/(capacity+1) is GUARANTEED
  * present in the summary (no false negatives above the bar). That
  * bound survives merging: MG summaries combine by counter addition
  * followed by a (capacity+1)-th-largest decrement, and the error
  * bounds ADD — exactly the property a 1000-executor tree aggregation
  * needs (Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * The training-data use: corpus-scale vocabulary heads ("which
  * tokens/domains/URLs dominate?") where exact counting would shuffle
  * a vocabulary-sized frame but the consumer only reads the head.
  * With `capacity` ≥ distinct-item count nothing is ever evicted and
  * the sketch degrades gracefully to exact counting — the oracle-gate
  * configuration (the [[HllSketch]]/[[CountMin]] gate discipline).
  *
  * Scale shape: tokens fold into per-partition bounded maps (the
  * decrement-all step is amortized O(1) per insert — each decrement
  * cancels a previous increment); the shuffle carries ONE ≤ capacity-
  * entry map per map task; no vocabulary-sized shuffle anywhere.
  * Output is the summary: ≤ capacity rows regardless of corpus size.
  */
object Frequent {

  /** Bounded-counter buffer. reduce: classic MG. merge: counter sums,
    * then subtract the (capacity+1)-th largest count from all and drop
    * non-positives — the mergeable-summaries rule that preserves the
    * additive error bound while restoring the size invariant. */
  private final class MisraGries(capacity: Int)
      extends Aggregator[String, java.util.HashMap[String, Long],
        Map[String, Long]] {

    override def zero: java.util.HashMap[String, Long] =
      new java.util.HashMap[String, Long]()

    override def reduce(b: java.util.HashMap[String, Long],
        term: String): java.util.HashMap[String, Long] = {
      if (term != null) {
        val cur = b.get(term)
        if (cur != 0L || b.containsKey(term)) b.put(term, cur + 1L)
        else if (b.size < capacity) b.put(term, 1L)
        else {
          // decrement-all: pays back one prior increment per counter
          val it = b.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue <= 1L) it.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      b
    }

    override def merge(a: java.util.HashMap[String, Long],
        b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
      val bit = b.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        val cur = a.get(e.getKey)
        a.put(e.getKey, cur + e.getValue)
      }
      if (a.size > capacity) {
        // (capacity+1)-th largest count = the decrement that restores
        // the invariant with the fewest survivors removed
        val counts = new Array[Long](a.size)
        var i = 0
        val vit = a.values().iterator()
        while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val d = counts(a.size - capacity - 1) // (capacity+1)-th largest
        val it = a.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= d) it.remove()
          else e.setValue(e.getValue - d)
        }
      }
      a
    }

    override def finish(b: java.util.HashMap[String, Long]): Map[String, Long] = {
      val out = Map.newBuilder[String, Long]
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out += (e.getKey -> e.getValue)
      }
      out.result()
    }

    override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
      Encoders.javaSerialization[java.util.HashMap[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Heavy-hitter tokens of a text column: one MG pass over the token
    * stream plus the exact stream length folded in the SAME aggregate.
    * Output (term, est_count, err_bound) for survivors with
    * `est_count >= minCount`, ordered by (est desc, term asc) —
    * est_count is a LOWER bound on the true count and
    * est_count + err_bound an upper bound, err_bound = ⌊n/(capacity+1)⌋
    * (zero whenever the sketch never evicted, i.e. the summary is
    * exact). */
  def heavyHitters(docs: DataFrame, textCol: String,
      capacity: Int = 4096, minCount: Long = 1L): DataFrame = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val mg = udaf(new MisraGries(capacity), Encoders.STRING)
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    toks
      .agg(mg(col("term")).as("hh"), count(lit(1)).as("n_tokens"))
      .select(explode(col("hh")).as(Seq("term", "est_count")),
        // integer div, not floor(double /): exact at any stream length
        expr(s"n_tokens div ${capacity + 1L}").cast("long").as("err_bound"))
      .filter(col("est_count") >= minCount)
      .select(col("term"), col("est_count").cast("long").as("est_count"),
        col("err_bound"))
      // the documented order, applied here rather than promised to the
      // caller: survivors are <= capacity rows, so the sort is
      // sketch-sized, never stream-sized
      .orderBy(col("est_count").desc, col("term").asc)
  }
}
