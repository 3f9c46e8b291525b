package graft.etl

import java.nio.file.{Files, Path, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end test of the reference pipeline semantics
  * (SURVEY.md §5 item 4, FIXTURES.md §A): stm + sec CSVs through
  * routing → per-file transform → union → incremental anti-join
  * append, including skip-bad-file behavior and idempotent re-run. */
class EtlPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Config loaded from the checked-in YAML fixture — the reference's
    * primary config UX (settings.py:23–31); YamlConfigSpec pins the
    * parsed shape field by field. */
  private val config = YamlConfig.loadEtlConfigFile(
    getClass.getResource("/etl_config.yaml").getPath)

  private def writeFixtures(dir: Path): Unit = {
    Files.writeString(dir.resolve("alfabank_current_stm.csv"),
      """acc;date;amount;flag;descr
        |40817001;15.01.2025;1234,56;D;groceries
        |40817001;16.01.2025;99,10;K;salary
        |40817002;16.01.2025;oops;D;bad-amount
        |""".stripMargin)
    Files.writeString(dir.resolve("alfabank_broker_sec.csv"),
      """sent,effective,ticker
        |2025-01-10,2025-01-12,SBER
        |2025-01-10,2025-02-01,GAZP
        |""".stripMargin)
    // pattern miss -> must be skipped with a log, not fail the run
    Files.writeString(dir.resolve("README.csv"), "not,a,statement\n1,2,3\n")
    // config miss (unknown bank) -> skipped
    Files.writeString(dir.resolve("nobank_x_stm.csv"), "acc;date\n1;2\n")
  }

  test("EP1 end-to-end: route, transform, accumulate, incremental append") {
    val dir = Files.createTempDirectory("graft-etl-e2e")
    writeFixtures(dir)
    val sink = dir.resolve("sink").toString

    val byType = EtlPipeline.processCsvFiles(spark, dir.toString, config)
    assert(byType.keySet == Set("stm", "sec"))

    val stm = byType("stm").orderBy("dt", "acc_number").collect()
    assert(stm.length == 3)
    val cols = byType("stm").columns.toSeq
    assert(cols == config.mapping("stm")("alfabank").desiredFields)

    val r0 = stm(0) // 15.01.2025 groceries
    assert(r0.getAs[String]("acc_name") == "Main account")
    assert(r0.getAs[Double]("sum") == -1234.56) // D -> -1, comma decimal
    assert(r0.getAs[Int]("year") == 2025)
    assert(r0.getAs[String]("ym") == "2025-01")
    assert(r0.getAs[String]("bank_name") == "alfabank")
    assert(r0.getAs[String]("acc_type") == "current")
    assert(r0.getAs[String]("surrogate_key").matches("[0-9a-f]{32}"))
    val bad = stm(2) // unparseable amount -> null, unknown account -> null
    assert(bad.isNullAt(bad.fieldIndex("sum")))
    assert(bad.isNullAt(bad.fieldIndex("acc_name")))

    val sec = byType("sec").orderBy("ticker").collect()
    assert(sec.length == 2)
    assert(sec(0).getAs[String]("ticker") == "GAZP")
    assert(sec(0).getAs[Int]("effect_year") == 2025)
    assert(sec(0).getAs[String]("effect_ym") == "2025-02")

    // first load: all new; second load of same batch: zero new (J1)
    assert(EtlPipeline.incrementalAppend(spark, byType("stm"), sink, Some("ym")) == 3)
    assert(EtlPipeline.incrementalAppend(spark, byType("stm"), sink, Some("ym")) == 0)
    // ym partitioning materialized in the sink layout
    assert(Files.exists(Paths.get(sink, "ym=2025-01")))
    assert(spark.read.parquet(sink).count() == 3)
  }

  test("observed load: metrics ride the write in one pass and match the data") {
    val dir = Files.createTempDirectory("graft-etl-observe")
    writeFixtures(dir)
    val sink = dir.resolve("sink-obs").toString
    val byType = EtlPipeline.processCsvFiles(spark, dir.toString, config)
    val m1 = EtlPipeline.incrementalAppendObserved(spark, byType("stm"), sink, Some("ym"))
    assert(m1 == EtlPipeline.LoadMetrics(nRows = 3, nNullKeys = 0, nYmApprox = 1))
    assert(spark.read.parquet(sink).count() == 3)
    // idempotent re-run: observe reports the empty anti-joined batch
    val m2 = EtlPipeline.incrementalAppendObserved(spark, byType("stm"), sink, Some("ym"))
    assert(m2 == EtlPipeline.LoadMetrics(0, 0, 0))
    assert(spark.read.parquet(sink).count() == 3)
  }

  test("md5 surrogate key matches hashlib over the same concat text") {
    val dir = Files.createTempDirectory("graft-etl-key")
    writeFixtures(dir)
    val stm = EtlPipeline.processCsvFiles(spark, dir.toString, config)("stm")
    val k = stm.filter(col("dt") === to_timestamp(lit("2025-01-15")))
      .select("surrogate_key").head().getString(0)
    // python: hashlib.md5("40817001#15.01.2025#1234,56".encode()).hexdigest()
    // (key cols concatenated pre-cast, raw CSV text — all-string schema)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("40817001#15.01.2025#1234,56".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(k == expect)
  }
}
