package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

/** Ad-hoc: assert minhash-LSH == exact ngram pairs at a given sf dir. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(docs, 4, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashPairs(docs, 4, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"exact=${exact.size} lsh=${lsh.size} missed=${(exact -- lsh).size} extra=${(lsh -- exact).size}")
    val sim = Dedup.simhashPairs(docs, 3).count()
    println(s"simhash_pairs_r3=$sim")
    spark.stop()
  }
}
