package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules (the level-2 Apriori slice that covers
  * most production "frequently bought together" / co-occurrence
  * affinity needs without the lattice): support, directed
  * confidences, and lift for every item pair co-occurring in at
  * least `minPairCount` baskets.
  */
object MarketBasket {

  /** Per-pair association stats over (basket, item) rows. Duplicate
    * (basket, item) rows collapse first (set semantics — a basket
    * contains an item or it doesn't). Baskets larger than
    * `maxBasketSize` are EXCLUDED entirely (from pair counts, item
    * counts, and the basket total): the per-basket pair explode is
    * |basket|², so one degenerate mega-basket (a crawler cart, a
    * default account) would otherwise dominate the shuffle — the
    * standard market-basket guard, and it keeps the operator free of
    * data-dependent blowup by construction.
    *
    * Output per pair (item_a < item_b): basket counts, support =
    * P(a,b), directed confidences P(b|a) and P(a|b), and lift =
    * P(a,b)/(P(a)·P(b)) — lift > 1 means genuine affinity, < 1
    * substitution. Ordered lift-descending (ties on the pair).
    *
    * Scale shape: one distinct (basket, item) aggregate, one
    * basket-size filter (aggregate-sized join), a basket-keyed
    * self-join bounded by maxBasketSize rows per key, then
    * pair-keyed and item-keyed counts with the 1-row basket total
    * broadcast. Nothing is corpus² — the only quadratic is within a
    * basket, capped. */
  def pairRules(txns: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2L, maxBasketSize: Int = 100): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2")
    val items = basketItems(txns, basketCol, itemCol, maxBasketSize)
    val nB = items.select(col("__b")).distinct()
      .agg(count(lit(1)).cast("long").as("__nb"))
    val itemCnt = items.groupBy(col("__i"))
      .agg(count(lit(1)).cast("long").as("__ci"))
    val pairs = pairCounts(items, minPairCount)
    val nbD = col("__nb").cast("double")
    val pab = col("pair_count").cast("double") / nbD
    val pa = col("__ca").cast("double") / nbD
    val pb = col("__cb").cast("double") / nbD
    pairs
      .join(itemCnt.select(col("__i").as("item_a"), col("__ci").as("__ca")),
        Seq("item_a"))
      .join(itemCnt.select(col("__i").as("item_b"), col("__ci").as("__cb")),
        Seq("item_b"))
      .crossJoin(broadcast(nB))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("__ca").as("count_a"), col("__cb").as("count_b"),
        pab.as("support"),
        (col("pair_count").cast("double") / col("__ca").cast("double"))
          .as("conf_a_to_b"),
        (col("pair_count").cast("double") / col("__cb").cast("double"))
          .as("conf_b_to_a"),
        (pab / (pa * pb)).as("lift"))
      .orderBy(col("lift").desc, col("item_a").asc, col("item_b").asc)
  }

  /** Deduped, size-capped (basket, item) rows — the shared front of
    * [[pairRules]] and [[pairEdges]]. Pinned eagerly: the pair
    * self-join consumes it twice (and pairRules' stats three more
    * times). */
  private def basketItems(txns: DataFrame, basketCol: String,
      itemCol: String, maxBasketSize: Int): DataFrame = {
    val items0 = txns
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sizes = items0.groupBy(col("__b"))
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select(col("__b"))
    items0.join(sizes, Seq("__b")).localCheckpoint(true)
  }

  /** (item_a < item_b, pair_count) with the `minPairCount` support
    * floor — the co-occurrence counts both public entry points share. */
  private def pairCounts(items: DataFrame, minPairCount: Long): DataFrame =
    items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")),
        Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).cast("long").as("pair_count"))
      .filter(col("pair_count") >= minPairCount)

  /** EDGE-ONLY co-occurrence pairs: exactly
    * `pairRules(...).select("item_a", "item_b")` — same dedup, same
    * basket cap, same support floor — without the per-item counts,
    * the basket-total broadcast, the lift arithmetic, or the global
    * lift sort none of which an edge consumer (the graph operators)
    * reads. An inner join on the item counts cannot be pruned by the
    * optimizer (it cannot prove the fk-style cardinality
    * preservation), so the graph queries paid two aggregates, two
    * joins and a sort for columns they dropped — this entry point is
    * the q278 lesson applied at the API level: don't compute what the
    * consumer throws away (guide §1.2 step 1). */
  def pairEdges(txns: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2L, maxBasketSize: Int = 100): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2")
    val items = basketItems(txns, basketCol, itemCol, maxBasketSize)
    pairCounts(items, minPairCount).select(col("item_a"), col("item_b"))
  }
}
