package graft.sources

import java.nio.file.{Files, Path}

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 restatement of S1–S3: filename routing inside
  * the scan, file pruning from metadata predicates (observable as the
  * scan's partition count), column pruning into the parser, and
  * quote-aware field splitting. */
class CsvMetaSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFixtures(dir: Path): Unit = {
    Files.writeString(dir.resolve("acme_current_stm.csv"),
      """acc;date;amount
        |A1;15.01.2025;10
        |A2;16.01.2025;"1;5"
        |""".stripMargin)
    Files.writeString(dir.resolve("acme_savings_stm.csv"),
      """acc;date;amount
        |S1;17.01.2025;30
        |""".stripMargin)
    Files.writeString(dir.resolve("zorro_current_stm.csv"),
      """acc;date;amount
        |Z1;18.01.2025;40
        |Z2;19.01.2025;50
        |""".stripMargin)
    // pattern miss (uppercase start) -> never routed, never read
    Files.writeString(dir.resolve("README.csv"), "not;a;statement\n1;2;3\n")
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-csvmeta")
    writeFixtures(d)
    d.toString
  }

  private def read(): DataFrame =
    spark.read.format("graft.sources.CsvMetaSource").load(dir)

  test("schema = header columns + filename metadata; all routed rows arrive") {
    val df = read()
    assert(df.columns.toSeq ==
      Seq("acc", "date", "amount", "bank", "acc_type", "file_name"))
    assert(df.count() == 5) // README.csv is unroutable -> not scanned
    val banks = df.select("bank").distinct().orderBy("bank")
      .collect().map(_.getString(0)).toSeq
    assert(banks == Seq("acme", "zorro"))
  }

  test("quote-aware parsing: separator inside quotes is literal") {
    val amt = read().filter(col("acc") === "A2")
      .select("amount").head().getString(0)
    assert(amt == "1;5")
  }

  test("metadata predicates prune FILES: partition count = surviving files") {
    val all = read()
    assert(all.rdd.getNumPartitions == 3, "one partition per routed file")
    val acme = all.filter(col("bank") === "acme")
    assert(acme.rdd.getNumPartitions == 2, "bank filter must plan only acme files")
    assert(acme.count() == 3)
    val savings = all.filter(col("acc_type") === "savings")
    assert(savings.rdd.getNumPartitions == 1)
    assert(savings.select("acc").head().getString(0) == "S1")
    val in = all.filter(col("bank").isin("zorro"))
    assert(in.rdd.getNumPartitions == 1)
    assert(in.count() == 2)
  }

  test("pushed filters and pruned read schema appear in the executed plan") {
    val df = read().filter(col("bank") === "acme").select("acc", "bank")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(bank,acme)"), plan)
    assert(plan.contains("acc") && !plan.contains("amount"), plan)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("A1", "A2", "S1"))
  }

  test("SQL DDL: CREATE TABLE ... USING csvmeta keeps file + column pruning") {
    // the pure-SQL route to the connector (VERDICT r10 item 6): the
    // short name resolves via the DataSourceRegister service file,
    // and pruning must survive the SQL path exactly as the
    // DataFrame path — same partition counts, same pushed filters
    spark.sql("DROP TABLE IF EXISTS csvmeta_sql")
    spark.sql(
      s"CREATE TABLE csvmeta_sql USING csvmeta OPTIONS (path '$dir')")
    try {
      val all = spark.sql("SELECT * FROM csvmeta_sql")
      assert(all.columns.toSeq ==
        Seq("acc", "date", "amount", "bank", "acc_type", "file_name"))
      assert(all.count() == 5)
      val acme = spark.sql(
        "SELECT acc, bank FROM csvmeta_sql WHERE bank = 'acme'")
      assert(acme.rdd.getNumPartitions == 2,
        "bank predicate through SQL must plan only acme's two files")
      val plan = acme.queryExecution.executedPlan.toString
      assert(plan.contains("EqualTo(bank,acme)"), plan)
      assert(!plan.contains("amount"), plan) // column pruning survives SQL
      assert(acme.collect().map(_.getString(0)).sorted.toSeq ==
        Seq("A1", "A2", "S1"))
      val savings = spark.sql(
        "SELECT acc FROM csvmeta_sql WHERE acc_type = 'savings'")
      assert(savings.rdd.getNumPartitions == 1)
      assert(savings.head().getString(0) == "S1")
    } finally spark.sql("DROP TABLE IF EXISTS csvmeta_sql")
  }

  test("rows agree with the EtlPipeline-style per-file read") {
    // same files through Spark's own CSV reader + literal metadata
    val expected = Seq(
      ("acme", "current", "acme_current_stm.csv"),
      ("acme", "savings", "acme_savings_stm.csv"),
      ("zorro", "current", "zorro_current_stm.csv"))
      .map { case (bank, accType, f) =>
        graft.etl.EtlPipeline.readCsv(spark, s"$dir/$f", ";", Seq("acc", "date", "amount"))
          .withColumn("bank", lit(bank))
          .withColumn("acc_type", lit(accType))
          .withColumn("file_name", lit(f))
      }
      .reduce(_ unionByName _)
    val got = read()
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }
}
