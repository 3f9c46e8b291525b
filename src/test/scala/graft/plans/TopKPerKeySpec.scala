package graft.plans

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the custom top-k-per-key operator: result equivalence
  * with the window formulation, plan shape (partial below the
  * exchange, final above), bounded output. */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomDf(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // unique order values so top-k is well-defined
    rnd.shuffle((1 to 2000).toList).zipWithIndex
      .map { case (v, i) => (i % 37, v.toLong, s"row_$i") }
      .toDF("key", "score", "payload")
      .repartition(8)
  }

  test("matches the window row_number formulation on random data") {
    val df = randomDf(5)
    val viaOp = TopK.perKey(df, Seq("key"), "score", k = 3)
      .select("key", "score", "payload")
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("key", "score", "payload")
    assert(viaOp.count() == viaWindow.count())
    assert(viaOp.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaOp).isEmpty)
  }

  test("ascending variant takes the k smallest") {
    val df = randomDf(9)
    val got = TopK.perKey(df, Seq("key"), "score", k = 1, descending = false)
      .select("score").as[Long].collect()
    val expect = df.groupBy("key").agg(min("score")).select("min(score)")
      .as[Long].collect()
    assert(got.sorted.toSeq == expect.sorted.toSeq)
  }

  test("plan shape: partial prune below the exchange, final above") {
    val df = randomDf(1)
    val plan = TopK.perKey(df, Seq("key"), "score", k = 2)
      .queryExecution.executedPlan.toString
    // node prints as "TopKPerKey [keys], [order], k, <partial>"
    val finalIdx = plan.indexOf("TopKPerKey")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("TopKPerKey", finalIdx + 1)
    assert(finalIdx >= 0 && exchangeIdx > 0 && partialIdx > 0, plan)
    // textual tree order: final (outer) ... exchange ... partial (inner)
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, plan)
    assert(plan.substring(finalIdx, exchangeIdx).contains("2, false"), plan)
    assert(plan.substring(partialIdx).contains("2, true"), plan)
  }

  test("raw SQL row_number idiom reaches TopKPerKeyExec (q429 path)") {
    TopKInstall.install(spark)
    randomDf(33).createOrReplaceTempView("topk_sql_spec")
    val df = spark.sql("""
      SELECT key, score, payload FROM (
        SELECT key, score, payload,
          row_number() OVER (PARTITION BY key ORDER BY score DESC) AS rn
        FROM topk_sql_spec) t
      WHERE rn <= 3""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"SQL plan missed the operator:\n$plan")
    // equivalence with the un-rewritten window on a plain session path
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc)
    val viaWindow = randomDf(33).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("key", "score", "payload")
    assert(df.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(df).isEmpty)
  }

  test("optimizer rule rewrites row_number+filter into the native operator") {
    val df = randomDf(21)
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc)
    def query() = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).select("key", "score", "payload", "rn")
    // baseline collected BEFORE the rule is active (order values unique)
    val expected = query().collect().map(_.toSeq).toSet
    TopKInstall.install(spark)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    try {
      val q = query()
      assert(q.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.collect().map(_.toSeq).toSet == expected)
      // rank() must NOT be rewritten (different tie semantics)
      val r = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 4)
      assert(!r.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    } finally exp.extraOptimizations =
      exp.extraOptimizations.filterNot(_ == RowNumberTopKRewrite)
  }

  test("handles k larger than group size and single-row groups") {
    val df = Seq((1, 10L, "a"), (1, 20L, "b"), (2, 5L, "c")).toDF("key", "score", "payload")
    val got = TopK.perKey(df, Seq("key"), "score", k = 5)
      .select("key", "payload").as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (1, "b"), (2, "c")))
  }
}
