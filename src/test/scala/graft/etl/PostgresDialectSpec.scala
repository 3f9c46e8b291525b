package graft.etl

import graft.TestSpark
import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.JdbcDialects
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** The PostgreSQL dialect seam, validated against a LIVE Postgres 15
  * (VERDICT r8 item 8). The reference's actual sink is Postgres
  * (db_manager.py:15–17); [[JdbcIo]] is proven against embedded Derby,
  * and this container has no Postgres JDBC driver jar (offline — the
  * Spark JDBC WRITE path to pg stays a documented seam), but it DOES
  * ship Postgres 15 server binaries. So this suite validates the two
  * halves of the seam that were "UNVALIDATED against a live Postgres
  * parser" (JdbcIo scaladoc):
  *
  *  1. the EXACT DDL Spark's JDBC sink would issue — built with
  *     Spark's own `JdbcUtils.schemaString(PostgresDialect, schema,
  *     createTableColumnTypes)`, the same call `JdbcUtils.createTable`
  *     makes — executes clean on live pg, and lands the config's
  *     parameterized types (VARCHAR lengths, DECIMAL precision/scale)
  *     in the catalog;
  *  2. the incremental-load CONTRACT (key scan → anti-join → append
  *     only fresh; re-run is a no-op) holds with Postgres as the
  *     system of record, with psql as the transport.
  *
  * Lifecycle: a throwaway initdb in a temp dir, unix-socket-only
  * (`listen_addresses=''` — no TCP, no network), run as the `postgres`
  * OS user via setpriv (pg refuses root). Everything is torn down in
  * afterAll. If any piece of the environment is missing the suite
  * cancels with the reason rather than failing. */
class PostgresDialectSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val pgBin = "/usr/local/bin"
  private val port = 54329
  private var dir: java.io.File = _
  private var up = false

  private def sh(cmd: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val rc = Process(cmd).!(ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n')))
    (rc, out.toString)
  }

  private def asPg(cmd: String*): (Int, String) =
    sh(Seq("setpriv", "--reuid", "postgres", "--regid", "postgres",
      "--clear-groups") ++ cmd)

  /** psql against the throwaway instance; ON_ERROR_STOP makes SQL
    * errors exit non-zero so tests can assert rejection. */
  private def psql(sql: String): (Int, String) =
    sh(Seq("psql", "-h", dir.toString, "-p", port.toString, "-U", "pg",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-tA", "-c", sql))

  private def psqlOk(sql: String): String = {
    val (rc, out) = psql(sql)
    assert(rc == 0, s"psql failed on [$sql]:\n$out")
    out.trim
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (new java.io.File(s"$pgBin/initdb").exists &&
        new java.io.File("/usr/bin/setpriv").exists) {
      dir = java.nio.file.Files.createTempDirectory("graft-pg").toFile
      sh(Seq("chown", "-R", "postgres:postgres", dir.toString))
      val (rcInit, _) = asPg("env", "LANG=C", s"$pgBin/initdb",
        "-D", s"$dir/data", "-U", "pg", "--auth=trust")
      if (rcInit == 0) {
        // unix socket only in the temp dir; no TCP listener
        val (rcStart, _) = asPg(s"$pgBin/pg_ctl", "-D", s"$dir/data",
          "-o", s"-k $dir -p $port -c listen_addresses=''",
          "-l", s"$dir/pg.log", "-w", "start")
        up = rcStart == 0
      }
    }
  }

  override def afterAll(): Unit = {
    if (up) asPg(s"$pgBin/pg_ctl", "-D", s"$dir/data", "-m", "fast", "stop")
    if (dir != null) sh(Seq("rm", "-rf", dir.toString))
    super.afterAll()
  }

  private def assumeUp(): Unit =
    assume(up, "no runnable Postgres in this environment " +
      "(initdb/setpriv/postgres user missing or server failed to start)")

  // the full config type surface: every branch of SchemaInit's
  // db_init.py TYPE_MAPPING, with parameterized lengths/precisions
  private val stm = SchemaInit.TableSpec("stm", Seq(
    SchemaInit.ColumnSpec("surrogate_key", "String", length = 32,
      primaryKey = true),
    SchemaInit.ColumnSpec("acc_number", "String", length = 20),
    SchemaInit.ColumnSpec("amount", "Decimal", precision = 12, scale = 2),
    SchemaInit.ColumnSpec("booked", "Date"),
    SchemaInit.ColumnSpec("loaded_at", "Timestamp"),
    SchemaInit.ColumnSpec("year", "Integer")))

  /** The exact CREATE TABLE Spark's JDBC sink issues: JdbcUtils
    * .createTable builds `CREATE TABLE <name> (<schemaString>)` with
    * the dialect's identifier quoting and the user's
    * createTableColumnTypes overrides — reproduced here verbatim. */
  private def sparkDdl(t: SchemaInit.TableSpec): String = {
    val dialect = JdbcDialects.get("jdbc:postgresql://localhost/x")
    val cols = JdbcUtils.schemaString(
      dialect,
      SchemaInit.toStructType(t),
      caseSensitive = false,
      Some(SchemaInit.jdbcColumnTypes(t)))
    s"CREATE TABLE ${dialect.quoteIdentifier(t.name)} ($cols)"
  }

  test("Spark-generated Postgres DDL parses on live pg and lands the config types") {
    assumeUp()
    psql("DROP TABLE IF EXISTS stm")
    psqlOk(sparkDdl(stm))
    // the catalog must carry the PARAMETERIZED types from the config,
    // not generic fallbacks — this is exactly what Derby couldn't
    // prove about the Postgres parser/catalog
    val got = psqlOk(
      "SELECT column_name, data_type, " +
        "coalesce(character_maximum_length, -1), " +
        "coalesce(numeric_precision, -1), coalesce(numeric_scale, -1), " +
        "is_nullable FROM information_schema.columns " +
        "WHERE table_name = 'stm' ORDER BY ordinal_position")
      .linesIterator.toSeq
    assert(got == Seq(
      "surrogate_key|character varying|32|-1|-1|NO",
      "acc_number|character varying|20|-1|-1|YES",
      "amount|numeric|-1|12|2|YES",
      "booked|date|-1|-1|-1|YES",
      // TIMESTAMP_NTZ from the config's timezone=false — bare
      // TIMESTAMP would round-trip to `timestamp WITH time zone`
      // through PostgresDialect (the seam this suite exists to pin)
      "loaded_at|timestamp without time zone|-1|-1|-1|YES",
      // pg reports integer as numeric_precision 32 (binary bits)
      "year|integer|-1|32|0|YES"))
  }

  test("dialect enforcement: the config VARCHAR(20) rejects a 21-char value") {
    assumeUp()
    psql("DROP TABLE IF EXISTS stm")
    psqlOk(sparkDdl(stm))
    val (rc, out) = psql(
      "INSERT INTO \"stm\" VALUES ('k', '" + "a" * 21 +
        "', 1.00, '2024-01-02', '2024-01-02 03:04:05', 2024)")
    assert(rc != 0 && out.contains("value too long"),
      s"pg accepted an over-length value: $out")
  }

  test("incremental-load contract holds with Postgres as the system of record") {
    assumeUp()
    import spark.implicits._
    psql("DROP TABLE IF EXISTS stm")
    psqlOk(sparkDdl(stm))

    def insert(rows: Seq[(String, String, String, Int)]): Unit =
      rows.foreach { case (k, acc, amt, yr) =>
        psqlOk("INSERT INTO \"stm\" VALUES " +
          s"('$k', '$acc', $amt, '2024-01-02', '2024-01-02 03:04:05', $yr)")
      }
    // S5 key scan: only the key column crosses (db_manager.py:56–57)
    def existing(): org.apache.spark.sql.DataFrame = {
      val keys = psqlOk("SELECT surrogate_key FROM \"stm\" ORDER BY 1")
        .linesIterator.filter(_.nonEmpty).toSeq
      keys.toDF("surrogate_key")
    }

    insert(Seq(("k1", "acc1", "10.50", 2024), ("k2", "acc2", "20.00", 2024)))
    // S6: a batch overlapping on k2 anti-joins down to k3 only
    val batch = Seq(
      ("k2", "acc2", "20.00", 2024),
      ("k3", "acc3", "30.25", 2025))
      .toDF("surrogate_key", "acc_number", "amount_raw", "year")
      .select($"surrogate_key", $"acc_number",
        $"amount_raw".cast("decimal(12,2)").as("amount"), $"year")
    val fresh = EtlOps.antiJoinNewRecords(batch, existing())
      .select("surrogate_key", "acc_number", "amount", "year")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDecimal(2).toString,
        r.getInt(3)))
      .toSeq
    assert(fresh == Seq(("k3", "acc3", "30.25", 2025)))
    insert(fresh)
    assert(psqlOk("SELECT count(*) FROM \"stm\"") == "3")
    // idempotence: replaying the same batch anti-joins to zero rows
    assert(EtlOps.antiJoinNewRecords(batch, existing()).isEmpty)
  }
}
