package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-equality gate for the r13 ScaleRank size dispatch: the
  * single-window fast path must return EXACTLY the two-level scheme's
  * output (the window is the 1-chunk special case — rank/prefix values
  * are invariant to chunk boundaries under a unique total order).
  * Every public entry point is compared on the same frame with the
  * dispatch forced each way via `spark.graft.scalerank.windowBytes`. */
class ScaleRankDispatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val KEY = "spark.graft.scalerank.windowBytes"

  private def frame(): DataFrame = {
    import spark.implicits._
    // groups of very different sizes, duplicate sort values (ties
    // broken by id — the documented caller contract), negative values
    (1 to 997).map { i =>
      (i % 7, (i * 31) % 13, i.toLong, (i % 11).toLong - 3L)
    }.toDF("g", "s", "id", "v")
  }

  private def bothWays(build: DataFrame => DataFrame): (Seq[String], Seq[String]) = {
    val prev = spark.conf.getOption(KEY)
    def run(thr: String): Seq[String] = {
      spark.conf.set(KEY, thr)
      try build(frame()).collect().map(_.toString).toSeq.sorted
      finally prev match {
        case Some(v) => spark.conf.set(KEY, v)
        case None => spark.conf.unset(KEY)
      }
    }
    (run("0") /* force two-level */, run(String.valueOf(1L << 30)) /* force window */)
  }

  test("withRowNumber: fast path ≡ two-level (grouped and global)") {
    for (groups <- Seq(Seq("g"), Seq.empty[String])) {
      val (slow, fast) = bothWays(df =>
        ScaleRank.withRowNumber(df, groups,
          Seq(col("s"), col("id")), "rk", "n"))
      assert(slow == fast)
    }
  }

  test("withRunningSum: fast path ≡ two-level (grouped and global)") {
    for (groups <- Seq(Seq("g"), Seq.empty[String])) {
      val (slow, fast) = bothWays(df =>
        ScaleRank.withRunningSum(df, groups,
          Seq(col("s"), col("id")), col("v"), "cum"))
      assert(slow == fast)
    }
  }

  test("withRunningMax: fast path ≡ two-level, inclusive and exclusive") {
    for (incl <- Seq(true, false)) {
      val (slow, fast) = bothWays(df =>
        ScaleRank.withRunningMax(df, Seq("g"),
          Seq(col("s"), col("id")), col("v"), "rmax", inclusive = incl))
      assert(slow == fast)
    }
  }

  test("decimal running sum refuses the fast path (type parity)") {
    val prev = spark.conf.getOption(KEY)
    spark.conf.set(KEY, String.valueOf(1L << 30))
    try {
      val out = ScaleRank.withRunningSum(
        frame().withColumn("dv", col("v").cast("decimal(20,0)")),
        Seq("g"), Seq(col("s"), col("id")), col("dv"), "cum")
      // the two-level shape widens the decimal twice; the fast path
      // must have declined so the schema matches the two-level form
      assert(out.schema("cum").dataType.typeName.startsWith("decimal"))
      val slow = {
        spark.conf.set(KEY, "0")
        ScaleRank.withRunningSum(
          frame().withColumn("dv", col("v").cast("decimal(20,0)")),
          Seq("g"), Seq(col("s"), col("id")), col("dv"), "cum")
      }
      assert(out.schema("cum").dataType == slow.schema("cum").dataType)
      assert(out.collect().map(_.toString).sorted.sameElements(
        slow.collect().map(_.toString).sorted))
    } finally prev match {
      case Some(v) => spark.conf.set(KEY, v)
      case None => spark.conf.unset(KEY)
    }
  }
}
