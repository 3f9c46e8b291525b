package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** S7 — schema bootstrap from config (SURVEY.md §2 S7; db_init.py).
  *
  * The reference maps config type strings to SQLAlchemy column types
  * (db_init.py:20–26 TYPE_MAPPING, 34–43 parameterized types), builds
  * table models with per-column primary_key/nullable flags
  * (db_init.py:52–56), and bootstraps destructively — drop_all then
  * create_all (db_init.py:91–95, destructive by design per its
  * docstring). Spark equivalents per SURVEY.md §1.2: typed
  * StructFields; primary keys have no engine-enforced analogue (the
  * MD5-key anti-join enforces uniqueness app-side) so `primary_key`
  * maps to nullable=false; drop-and-recreate = mode("overwrite") of an
  * empty typed dataset.
  */
object SchemaInit {

  /** One column of config DDL (db_init.py:46–58 field shape). */
  final case class ColumnSpec(
      name: String,
      dataType: String, // Integer | String | Date | Decimal | Timestamp
      length: Int = 255, // String only (db_init.py:36–37)
      precision: Int = 10, // Decimal (db_init.py:38–39)
      scale: Int = 2,
      timezone: Boolean = false, // Timestamp (db_init.py:40–41)
      primaryKey: Boolean = false, // db_init.py:52–56
      nullable: Boolean = true)

  final case class TableSpec(name: String, columns: Seq[ColumnSpec])

  /** db_init.py:20–43 type mapping → Spark SQL types. String length is
    * a sink concern (VarcharType only matters for JDBC DDL); the
    * in-engine type is StringType. */
  def toSparkType(c: ColumnSpec): DataType = c.dataType match {
    case "Integer" => IntegerType
    case "String" => StringType
    case "Date" => DateType
    case "Decimal" => DecimalType(c.precision, c.scale)
    case "Timestamp" => if (c.timezone) TimestampType else TimestampNTZType
    case other =>
      throw new IllegalArgumentException(s"unsupported config type '$other' for ${c.name}")
  }

  /** JDBC sink DDL fragment for `createTableColumnTypes` — where the
    * String length and decimal parameters become concrete. */
  def jdbcColumnTypes(t: TableSpec): String =
    t.columns.map { c =>
      val sql = c.dataType match {
        case "Integer" => "INTEGER"
        case "String" => s"VARCHAR(${c.length})"
        case "Date" => "DATE"
        case "Decimal" => s"DECIMAL(${c.precision},${c.scale})"
        // Spark PARSES this fragment (parseTableSchema) and re-renders
        // it per-dialect: bare TIMESTAMP parses as the session-TZ type,
        // which PostgresDialect renders `timestamp with time zone` —
        // wrong for the config's timezone=false (db_init.py:40–41).
        // TIMESTAMP_NTZ keeps the tz-less intent through the round-trip
        // (live-pg catalog pinned in PostgresDialectSpec).
        case "Timestamp" => if (c.timezone) "TIMESTAMP" else "TIMESTAMP_NTZ"
        case other =>
          throw new IllegalArgumentException(s"unsupported config type '$other'")
      }
      s"${c.name} $sql"
    }.mkString(", ")

  def toStructType(t: TableSpec): StructType =
    StructType(t.columns.map(c =>
      StructField(c.name, toSparkType(c), nullable = c.nullable && !c.primaryKey)))

  /** drop_all + create_all (db_init.py:65–99): overwrite each table
    * path with an empty, correctly-typed dataset. Destructive by
    * design, like the reference. */
  def initialize(spark: SparkSession, basePath: String, tables: Seq[TableSpec]): Unit =
    tables.foreach { t =>
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], toStructType(t))
        .write.mode("overwrite").parquet(s"$basePath/${t.name}")
    }
}
