package graft.etl

import graft.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S7 contract: config type mapping, pk/nullable flags, destructive
  * bootstrap (SURVEY.md §1.2, §3 EP2). */
class SchemaInitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import SchemaInit._

  private val stm = TableSpec("stm", Seq(
    ColumnSpec("surrogate_key", "String", length = 32, primaryKey = true),
    ColumnSpec("acc_number", "String", length = 20),
    ColumnSpec("dt", "Date"),
    ColumnSpec("sum", "Decimal", precision = 12, scale = 2),
    ColumnSpec("year", "Integer"),
    ColumnSpec("processed_at", "Timestamp", timezone = true)))

  test("config types map per the reference TYPE_MAPPING") {
    val st = toStructType(stm)
    assert(st("surrogate_key").dataType == StringType)
    assert(!st("surrogate_key").nullable) // primary key -> not nullable
    assert(st("dt").dataType == DateType)
    assert(st("sum").dataType == DecimalType(12, 2))
    assert(st("year").dataType == IntegerType)
    assert(st("processed_at").dataType == TimestampType) // tz-aware
    assert(toSparkType(ColumnSpec("x", "Timestamp")) == TimestampNTZType)
    intercept[IllegalArgumentException](toSparkType(ColumnSpec("x", "Blob")))
  }

  test("jdbc DDL fragment carries lengths and decimal parameters") {
    val ddl = jdbcColumnTypes(stm)
    assert(ddl.contains("surrogate_key VARCHAR(32)"))
    assert(ddl.contains("sum DECIMAL(12,2)"))
    assert(ddl.contains("processed_at TIMESTAMP"))
  }

  test("initialize is drop-and-recreate: overwrites with empty typed tables") {
    val base = java.nio.file.Files.createTempDirectory("graft-schema-init").toString
    initialize(spark, base, Seq(stm))
    val df = spark.read.parquet(s"$base/stm")
    assert(df.count() == 0)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      toStructType(stm).map(f => (f.name, f.dataType)))
    // re-run replaces (no append duplication, no failure)
    initialize(spark, base, Seq(stm))
    assert(spark.read.parquet(s"$base/stm").count() == 0)
  }
}
