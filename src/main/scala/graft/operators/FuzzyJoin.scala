package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match join (record linkage across two tables):
  * `A ⋈ B on editDistance(a, b) <= d` without the cross product.
  *
  * The naive plan is O(|A|·|B|) DP evaluations — Spark would emit a
  * cartesian product with a levenshtein filter. This operator blocks
  * with the Q-GRAM COUNT FILTER (Gravano et al. 2001, the standard ER
  * bound): strings within edit distance d must satisfy
  *   |len(a) − len(b)| ≤ d, and
  *   sharedQGrams(a, b) ≥ (max(len) − q + 1) − d·q
  * (each edit destroys at most q positional q-grams). Shared counts
  * use MULTISET semantics — Σ min(count_a, count_b) per gram — which
  * the lemma requires; a distinct-set intersection can undercount and
  * drop true matches.
  *
  * Shape: per-side (id, gram, cnt) aggregates, one equi-join ON THE
  * GRAM (the only row-grain shuffle — candidate volume is Σ per-gram
  * df_A·df_B, not |A|·|B|), a per-pair count with the lemma + length
  * filters, then the exact levenshtein verify on the survivors only.
  * Stop-gram skew (a gram appearing in half of each side) is the
  * operator's skew knob: raise q, or pre-drop grams with document
  * frequency above a cap — both shrink candidates without dropping
  * true pairs beyond the lemma's guarantee (a dropped gram only
  * lowers the observed shared count; callers raising dfCap must relax
  * the threshold accordingly, so the default keeps every gram).
  */
object FuzzyJoin {

  /** Positional q-grams with multiplicity: (gram, count) rows per id. */
  private def gramCounts(df: DataFrame, id: String, text: String,
      q: Int): DataFrame =
    df.select(col(id), col(text))
      .withColumn("__g", explode(expr(
        s"transform(sequence(1, greatest(length($text) - ${q - 1}, 0)), " +
          s"i -> substring($text, i, $q))")))
      .groupBy(col(id), col("__g")).agg(count(lit(1)).as("__c"))

  /** Fuzzy join: rows (leftId, rightId, edit_dist) for every pair
    * within `maxDist`. Text columns should be pre-normalized (case,
    * whitespace) by the caller — normalization policy is data, not
    * join mechanics. Pairs whose strings are both shorter than q
    * gram-block trivially (no grams): they are caught by a dedicated
    * short-string pass, which is length-bounded (≤ q−1 chars) and
    * joins on the length filter only. */
  def join(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    val la = left.select(col(leftId), col(leftText),
      length(col(leftText)).as("__la"))
    val rb = right.select(col(rightId), col(rightText),
      length(col(rightText)).as("__lb"))

    val ga = gramCounts(left, leftId, leftText, q)
    val gb = gramCounts(right, rightId, rightText, q)
      .withColumnRenamed(rightId, s"__r_$rightId")
    val shared = ga.join(gb, ga("__g") === gb("__g"))
      .groupBy(col(leftId), col(s"__r_$rightId"))
      .agg(sum(least(ga("__c"), gb("__c"))).as("__shared"))
      .withColumnRenamed(s"__r_$rightId", rightId)

    val candidates = shared
      .join(la.select(col(leftId), col("__la")), Seq(leftId))
      .join(rb.select(col(rightId), col("__lb")), Seq(rightId))
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .filter(col("__shared") >=
        greatest(col("__la"), col("__lb")) - lit(q - 1) - lit(maxDist * q))

    // strings shorter than q have no q-grams and never reach the gram
    // join: verify pairs where EITHER side is short directly against
    // all length-compatible partners (the other side is then ≤
    // q-1+maxDist chars — a bounded, tiny slice)
    val shortPairsA = la.filter(col("__la") < q)
      .crossJoin(rb.filter(col("__lb") <= lit(q - 1 + maxDist)))
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .select(col(leftId), col(rightId))
    val shortPairsB = la.filter(col("__la") <= lit(q - 1 + maxDist))
      .crossJoin(rb.filter(col("__lb") < q))
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .select(col(leftId), col(rightId))

    val allCand = candidates.select(col(leftId), col(rightId))
      .unionByName(shortPairsA).unionByName(shortPairsB).distinct()

    allCand
      .join(la.select(col(leftId), col(leftText)), Seq(leftId))
      .join(rb.select(col(rightId), col(rightText)), Seq(rightId))
      .select(col(leftId), col(rightId),
        levenshtein(col(leftText), col(rightText)).cast("long")
          .as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }
}
