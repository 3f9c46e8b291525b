package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the one-shot relational graph queries ([[Graph]]). */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  test("q155 hub cap is inert at test scale (max co-purchase degree well under DCAP=64)") {
    val edges = Graph.coPurchaseEdges(spark, sf, 2)
    val maxDeg = edges.select(col("a").as("n"))
      .unionByName(edges.select(col("b2").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxDeg <= 64, s"hub cap no longer inert: max degree $maxDeg")
  }

  test("q155 candidates are non-adjacent pairs with consistent Jaccard bounds") {
    val edges = Graph.coPurchaseEdges(spark, sf, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Graph.q155LinkPredict.build(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      val cn = r.getAs[Long]("cn")
      val j = r.getAs[Long]("jaccard_ppm")
      assert(x < y, s"orientation violated: $r")
      assert(!edges.contains((x, y)), s"recommended an existing edge: $r")
      assert(cn >= 1 && j >= 0 && j <= 1000000, s"score out of range: $r")
    }
  }

  test("q155 cn matches a direct neighbourhood intersection for the top pair") {
    val edges = Graph.coPurchaseEdges(spark, sf, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val top = Graph.q155LinkPredict.build(spark, sf).head()
    val (x, y) = (top.getAs[Long]("x"), top.getAs[Long]("y"))
    val expect = (adj(x) intersect adj(y)).size.toLong
    assert(top.getAs[Long]("cn") == expect)
  }
}
