package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup
import graft.sources.Tables

/** Phase-level timing of the LSH dedup pipeline (dev tool). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lsh] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    val base = docs.select(col("doc_id").as("id"),
        Dedup.shingles(col("text")).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 12))
      .persist()
    timed("base (shingles+sig)")(base.count())
    val banded = base.select(col("id"),
      posexplode(Dedup.bandHashes(col("sig"), 4, 3))
        .as(Seq("band_idx", "band_hash"))).persist()
    timed("banded")(banded.count())
    val candidates = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
      .join(banded.select(col("band_idx"), col("band_hash"), col("id").as("id_b")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().persist()
    val nc = timed("candidates")(candidates.count())
    println(s"[lsh] n_candidates=$nc")
    val verified = candidates
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    val nv = timed("verify")(verified.count())
    println(s"[lsh] n_pairs=$nv")
    spark.stop()
  }
}
