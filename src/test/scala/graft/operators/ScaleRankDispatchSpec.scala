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

  /** r14 (ADVICE r13): group key NOT leading the schema + NULL group
    * keys — the two cases the original spec could not see. The
    * two-level path used to (a) move groupCols to the front via its
    * using-column join and (b) drop null-key rows (equi-join null
    * semantics); both now match the window semantics (original column
    * order preserved, NULL is an ordinary partition value). */
  private def raggedFrame(): DataFrame = {
    import spark.implicits._
    (1 to 497).map { i =>
      val g: java.lang.Long = if (i % 5 == 0) null else (i % 3).toLong
      ((i * 31) % 13, i.toLong, (i % 11).toLong - 3L, g)
    }.toDF("s", "id", "v", "g") // group col LAST, ~20% null keys
  }

  private def bothWaysRagged(build: DataFrame => DataFrame): (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    val prev = spark.conf.getOption(KEY)
    def run(thr: String): (Seq[String], Seq[String]) = {
      spark.conf.set(KEY, thr)
      try {
        val out = build(raggedFrame())
        (out.collect().map(_.toString).toSeq.sorted, out.columns.toSeq)
      } finally prev match {
        case Some(v) => spark.conf.set(KEY, v)
        case None => spark.conf.unset(KEY)
      }
    }
    val (slow, slowCols) = run("0")
    val (fast, fastCols) = run(String.valueOf(1L << 30))
    (slow, fast, slowCols, fastCols)
  }

  test("null group keys + non-leading group column: identical rows AND column order both ways") {
    val (slow, fast, slowCols, fastCols) = bothWaysRagged(df =>
      ScaleRank.withRowNumber(df, Seq("g"), Seq(col("s"), col("id")), "rk", "n"))
    assert(slowCols == Seq("s", "id", "v", "g", "n", "rk")) // input order kept
    assert(slowCols == fastCols)
    assert(slow == fast)
    // null-key rows must SURVIVE (the old using-join dropped them)
    assert(slow.count(_.startsWith("[")) == 497)
  }

  test("null group keys: running sum and running max agree both ways") {
    val (s1, f1, c1s, c1f) = bothWaysRagged(df =>
      ScaleRank.withRunningSum(df, Seq("g"), Seq(col("s"), col("id")), col("v"), "cum"))
    assert(s1 == f1 && c1s == c1f && c1s.last == "cum")
    val (s2, f2, c2s, c2f) = bothWaysRagged(df =>
      ScaleRank.withRunningMax(df, Seq("g"), Seq(col("s"), col("id")), col("v"), "rmax",
        inclusive = false))
    assert(s2 == f2 && c2s == c2f && c2s.last == "rmax")
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
