package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch equivalence check for the r7 restructures (deleted after use):
  * old vs new q_distinct_count / q_approx_distinct_gate formulations must
  * match row-for-row, dupClusters output must equal the pre-r7 formulation,
  * and the embedding-LSH bucket cap must not bind on any driver SF.
  */
object R07Check {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean = {
      a.schema.toString == b.schema.toString &&
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    }

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")

      // old q_distinct_count formulation (multi-distinct, Expand)
      val oldDc = li.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      val newDc = graft.SparkEntry.queries("q_distinct_count")(spark, dir)
      println(s"$sf q_distinct_count equal: " + same(oldDc, newDc))

      // old q_approx_distinct_gate exact branch joined with the sketch
      val oldExact = li.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      val sketch = li.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("a_o"),
        approx_count_distinct(col("l_partkey"), 0.02).as("a_p"))
      val oldGate = oldExact.join(sketch, Seq("l_returnflag")).select(
        col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("a_o") - col("exact_orders")).cast("double") /
          col("exact_orders") <= 0.06).as("orders_within_tol"),
        (abs(col("a_p") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.06).as("parts_within_tol"))
      val newGate = graft.SparkEntry.queries("q_approx_distinct_gate")(spark, dir)
      println(s"$sf q_approx_distinct_gate equal: " + same(oldGate, newGate))

      // LSH bucket sizes on the q_dedup_embedding_lsh input (base + planted)
      graft.expressions.GraftFunctions.register(spark)
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
      val planted = base.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + lit(100000L))
      val e = base.unionByName(planted)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("tb", explode(
          graft.expressions.GraftFunctions.signLshPacked(col("v"), 7L, 8, 6)))
      val mx = e.groupBy(col("tb")).count().agg(max(col("count"))).head().getLong(0)
      println(s"$sf embeddings max LSH bucket: $mx (cap 200 binds: ${mx > 200})")
    }
    spark.stop()
  }
}
