package graft.tools

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: native MinHashSignature vs the HOF reference on
  * the sf0.1 documents (5 000 docs × ~100 shingles, k = 64). Prints both
  * wall times; evidence for BENCH_NOTES.md.
  */
object MhBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sh = docs.repartition(32, col("doc_id"))
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .persist()
    sh.count()
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      // warm-up + 3 timed
      sh.select(c.as("sig")).selectExpr("sum(size(sig))").collect()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        sh.select(c.as("sig")).selectExpr("sum(size(sig))").collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: median ${ts.sorted.apply(1)}%.3f s")
    }
    time("minhash native", Dedup.minhashSignature(col("sh"), 64))
    time("minhash hof   ", Dedup.minhashSignatureHof(col("sh"), 64))

    val toks = docs.repartition(32, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks")).persist()
    toks.count()
    def timeFp(label: String, c: org.apache.spark.sql.Column): Unit = {
      // bit_count keeps the probe aggregate small (ANSI sum of raw
      // fingerprints overflows long)
      toks.select(c.as("fp")).selectExpr("sum(bit_count(fp))").collect()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        toks.select(c.as("fp")).selectExpr("sum(bit_count(fp))").collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: median ${ts.sorted.apply(1)}%.3f s")
    }
    timeFp("simhash native", Dedup.simhashOfTokens(col("toks")))
    timeFp("simhash hof   ", Dedup.simhashOfTokensHof(col("toks")))
    spark.stop()
  }
}
