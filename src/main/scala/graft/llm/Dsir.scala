package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * pick raw-corpus documents that LOOK LIKE a small target corpus by
  * importance weight under two hashed bag-of-n-grams models.
  *
  * The published recipe, re-expressed Spark-first:
  *  1. featurize every document as hashed n-gram (unigram + bigram)
  *     bucket counts (`b` buckets);
  *  2. fit two multinomial bag-of-n-grams models over the buckets —
  *     target θt from the target slice, raw θr from everything —
  *     with add-one smoothing;
  *  3. per document, importance log-weight
  *     log w = Σ_b c_b · (ln θt[b] − ln θr[b]);
  *  4. sample without replacement ∝ exp(log w / τ) via the Gumbel
  *     top-k trick, deterministic (md5-derived Gumbel noise).
  *
  * Scale shape (100 TB): the n-gram explode is ~2× token volume into
  * ONE hash aggregate keyed by (doc, bucket); the two models are ONE
  * b-sized aggregate over the same stream (b rows total — broadcast
  * back); the per-doc weight is a b-bounded fold; selection is a
  * TakeOrdered top-k, no global sort. Nothing is ever corpus², no
  * driver state, and every hash/log is md5/libm-portable so the
  * DuckDB oracle reproduces weights AND selection bit-for-bit (q133).
  */
object Dsir {

  /** Hashed n-gram bucket ids (unigrams + bigrams of the whitespace
    * token stream, md5 → 32-bit → mod b; DuckDB:
    * ('0x' || substr(md5(g), 1, 8))::BIGINT % b). */
  def ngramBuckets(text: Column, b: Int = 1024): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => concat(x, lit(" "), y))
    transform(concat(toks, bigrams),
      g => conv(substring(md5(g), 1, 8), 16, 10).cast("long") % b)
  }

  /** Per-document importance log-weights: (id, logw).
    *
    * `isTarget` marks the target slice (evaluated against `docs`'s
    * columns). One explode feeds BOTH the per-doc counts and the two
    * models (raw = all rows, target = a filtered count in the same
    * aggregate); bucket log-ratios join back broadcast (b rows). The
    * per-doc sum folds contributions in ascending-bucket order so the
    * double accumulation is order-pinned — bit-identical on any
    * engine, shuffle-order-proof (same trick as the oracle's
    * `list_reduce`; see q129's unrolled-GD precedent for why order
    * pinning, not decimal widening, is the right tool when the terms
    * are logs). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, b: Int = 1024): DataFrame = {
    val ex = docs.select(col(idCol), isTarget.as("is_t"),
      explode(ngramBuckets(col(textCol), b)).as("bkt"))
    val bstats = ex.groupBy(col("bkt"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"))
    val tot = bstats.agg(sum(col("rc")).as("tr"), sum(col("tc")).as("tt"))
    val lr = bstats.crossJoin(tot).select(col("bkt"),
      (log((col("tc") + 1L).cast("double") / (col("tt") + lit(b.toLong)).cast("double"))
        - log((col("rc") + 1L).cast("double") / (col("tr") + lit(b.toLong)).cast("double")))
        .as("lr"))
    val dc = ex.groupBy(col(idCol), col("bkt")).agg(count(lit(1)).as("c"))
    dc.join(broadcast(lr), Seq("bkt"))
      .select(col(idCol), col("bkt"), (col("c").cast("double") * col("lr")).as("v"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("bkt"), col("v")))).as("cv"))
      .select(col(idCol),
        aggregate(col("cv"), lit(0.0), (acc, x) => acc + x.getField("v")).as("logw"))
  }

  /** Gumbel top-k selection: keep the `n` documents with the largest
    * `logw / τ + g`, g = −ln(−ln(u)) with u md5-derived from the id —
    * i.e. a deterministic sample WITHOUT replacement with probability
    * ∝ exp(logw/τ) (the Gumbel-max trick), reproducible on any
    * cluster size. τ→0 degenerates to plain top-k by weight. */
  def gumbelTopK(weights: DataFrame, idCol: String, n: Int,
      temperature: Double = 1.0): DataFrame = {
    // u ∈ (0,1): 24 md5 bits + ½, over 2^24 — exact in double, so the
    // gumbel is bit-portable (ln twice, both libm-stable)
    val u = (conv(substring(md5(concat(lit("gum:"), col(idCol).cast("string"))),
      1, 6), 16, 10).cast("double") + 0.5) / (1 << 24)
    weights
      .withColumn("score", col("logw") / temperature - log(-log(u)))
      .orderBy(col("score").desc, col(idCol))
      .limit(n)
  }
}
