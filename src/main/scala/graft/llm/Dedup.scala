package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines:
  * exact (hash group-by), MinHash+LSH near-dup, SimHash.
  *
  * Scale design (100 TB): every step is a narrow per-row map except the
  * final candidate join, which shuffles only on (band_idx, band_hash) —
  * i.e. proportional to candidate volume, not corpus². All hashes are
  * md5 (engine-portable, uniformly distributed). Exact-dedup is one
  * hash-aggregate; MinHash signatures ride the scan. The LSH band join
  * is the classic shingle→minhash→band→bucket-join pipeline; band
  * buckets are tiny in expectation, so skew salting is unnecessary
  * unless a degenerate near-constant corpus is expected (then salt the
  * band key with a shingle-count bucket).
  */
object Dedup {

  /** 5-char shingle set (distinct) of a text column. */
  def shingles(text: Column, k: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  /** MinHash signature: for each of `numHashes` seeds, the
    * lexicographic min of md5(seed ':' shingle). Using the min of a
    * portable hash keeps the signature reproducible on any engine. */
  def minhashSignature(shingleArr: Column, numHashes: Int = 8): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingleArr,
        x => md5(concat(s.cast("string"), lit(":"), x)))))

  /** LSH band hashes from a signature: `numBands` bands of
    * `rowsPerBand` signature entries each, hashed to one value. */
  def bandHashes(sig: Column, numBands: Int = 4, rowsPerBand: Int = 2): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => md5(concat_ws("|",
        (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + lit(r + 1))): _*)))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b)))

  /** Exact dedup: keep min id per md5 fingerprint, count members. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_members"))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline: per-doc shingle set → minhash sig → band hashes →
    * explode to (band_idx, band_hash) → self-equi-join on the band key
    * (the ONLY shuffle) → distinct candidate pairs → verify with exact
    * Jaccard ≥ threshold.
    */
  def lshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.3, numHashes: Int = 8, numBands: Int = 4): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
        shingles(col(textCol)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("bands", bandHashes(col("sig"), numBands, numHashes / numBands))
    val banded = base.select(col("id"), col("sh"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val l = banded.select(col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .groupBy("id_a", "id_b").agg(first(col("jac")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Surviving ids after near-dup removal: drop any doc that has a
    * verified near-duplicate with a smaller id (greedy min-id keeper,
    * deterministic). */
  def lshSurvivors(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.3): DataFrame = {
    val dead = lshPairs(docs, idCol, textCol, threshold)
      .select(col("id_b").as("drop_id")).distinct()
    docs.join(dead, docs(idCol) === dead("drop_id"), "left_anti")
      .select(col(idCol))
  }

  /** 16-bit SimHash over whitespace tokens, one md5 nibble per bit:
    * bit j set iff ≥ half the tokens have a high j-th nibble. */
  def simhash16(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    aggregate(sequence(lit(0), lit(15)), lit(0L),
      (acc, j) => acc + when(
        size(filter(toks, t =>
          contains(lit("89abcdef"), md5(t).substr(j + 1, lit(1))))) * 2 >= size(toks),
        pow(lit(2), j).cast("long")).otherwise(lit(0L)))
  }

  /** Group docs by identical simhash (hamming-0 buckets); near-dup
    * buckets at hamming ≤ d come from banding the 16 bits. */
  def simhashGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), simhash16(col(textCol)).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))
      .filter(col("n_docs") > 1)
}
