package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Dedup

class ExpressionsSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  test("native simhash64 is bit-identical to the Scala kernel") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox", "", "single", "a b c d e f g",
      "unicode tokens école über δοκιμή 文本 here",
      "double  space and trailing ", " leading and ﬁnal")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(col("doc_id"), GraftFunctions.simhash64(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(native(i.toLong) == Dedup.simhash64(t), s"mismatch for '$t'")
    }
  }

  test("simhash64 is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT simhash64('hello simhash world') AS h").head.getLong(0)
    assert(viaSql == Dedup.simhash64("hello simhash world"))
  }

  test("simhash64 stays inside whole-stage codegen (no UDF boundary)") {
    GraftFunctions.register(spark)
    // spark.range forces a real (non-local-relation) physical plan
    val df = spark.range(5)
      .select(GraftFunctions.simhash64(concat(lit("token "), col("id"))).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"))
    assert(df.queryExecution.executedPlan.find(
      _.getClass.getSimpleName.startsWith("WholeStageCodegen")).nonEmpty, plan)
    val got = df.collect().map(_.getLong(0)).toSeq
    val expected = (0 until 5).map(i => Dedup.simhash64(s"token $i"))
    assert(got == expected)
  }

  test("null propagates (nullIntolerant)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(GraftFunctions.simhash64(col("text")).as("h"))
    assert(df.head.isNullAt(0))
  }
}
