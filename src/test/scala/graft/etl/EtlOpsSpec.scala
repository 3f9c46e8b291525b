package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-semantics unit tests for the reference-parity scalar ops
  * (SURVEY.md §5 item 2) + J1 invariants (item 3, seeded random). */
class EtlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F2: md5 surrogate key matches known vector (hashlib)") {
    // md5("a#b") per SURVEY.md §5
    val got = Seq(("a", "b")).toDF("x", "y")
      .select(md5(concat_ws("#", col("x"), col("y"))).as("k"))
      .head().getString(0)
    assert(got == "6457c7988b74a5dd2057c7bf0905389e")
  }

  test("F7: unparseable comma-decimal coerces to null, not error (ANSI)") {
    val df = Seq("1.234,56", "12,5", "N/A", "").toDF("sum")
    val out = EtlOps.parseCommaDecimal("sum", "v")(df).select("v").as[Option[Double]].collect()
    // pandas errors='coerce' semantics: "1.234,56" -> 1.23456? No: the
    // reference replaces ',' with '.' only: "1.234,56" -> "1.234.56" -> NaN
    assert(out(1).contains(12.5))
    assert(out(0).isEmpty && out(2).isEmpty && out(3).isEmpty)
  }

  test("F3: decode map missing key -> null (pandas .map NaN)") {
    val df = Seq("acc1", "nope").toDF("acc_number")
    val out = EtlOps.decode("acc_number", "acc_name", Map("acc1" -> "Main"))(df)
      .select("acc_name").as[Option[String]].collect()
    assert(out(0).contains("Main") && out(1).isEmpty)
  }

  test("F8: missing debit/credit flag -> null amount (NaN propagation)") {
    val df = Seq(("10.0", "D"), ("10.0", "X")).toDF("sum_tmp", "dc")
      .withColumn("sum_tmp", col("sum_tmp").cast("double"))
    val out = EtlOps.signedAmount("sum_tmp", "dc", "signed", Map("D" -> -1, "C" -> 1))(df)
      .select("signed").as[Option[Double]].collect()
    assert(out(0).contains(-10.0) && out(1).isEmpty)
  }

  test("J1: anti ∪ semi == src and anti is idempotent (seeded property)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val src = List.fill(rnd.nextInt(30))(rnd.nextInt(20))
      val keys = List.fill(rnd.nextInt(30))(rnd.nextInt(20))
      val s = src.toDF("surrogate_key")
      val k = keys.toDF("surrogate_key")
      val anti = EtlOps.antiJoinNewRecords(s, k)
      val semi = s.join(k.distinct(), Seq("surrogate_key"), "left_semi")
      assert(anti.count() + semi.count() == s.count())
      assert(EtlOps.antiJoinNewRecords(anti, k).count() == anti.count())
    }
  }

  test("J1: empty keys side is identity; empty source stays empty") {
    val s = Seq(1, 2, 3).toDF("surrogate_key")
    val empty = spark.emptyDataFrame.withColumn("surrogate_key", lit(null).cast("int"))
      .filter(lit(false))
    assert(EtlOps.antiJoinNewRecords(s, empty.select("surrogate_key")).count() == 3)
    assert(EtlOps.antiJoinNewRecords(empty.select("surrogate_key"), s).count() == 0)
  }

  test("S3: filename pattern anchors at start (re.match semantics)") {
    val cfg = EtlConfig(
      filePattern = """(\w+)_(\w+)_(stm|sec)\.csv""".r,
      mapping = Map.empty)
    assert(EtlPipeline.extractFileMeta(cfg, "bank1_chk_stm.csv").contains(("bank1", "chk", "stm")))
    // pattern present mid-name must NOT route (reference: re.match)
    assert(EtlPipeline.extractFileMeta(cfg, "x bank1_chk_stm.csv").isEmpty)
  }
}
