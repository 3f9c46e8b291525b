package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's end-to-end flow (SURVEY.md §3 EP1/EP3), one lazy
  * Spark plan per logical dataset:
  *
  *   list files (S1) → route by filename regex + config (S3/S4)
  *   → per-file: csv scan (S2) → select/rename (P1/P2) → transform
  *     (F1–F8, P3, P4)
  *   → unionByName accumulate (U1)
  *   → anti-join vs loaded keys (J1) → append sink (S6)
  *
  * Error semantics: the reference skips a file on any per-file failure
  * and keeps going (data_manager.py:121–139). Plan *construction*
  * failures (bad name, missing config, missing columns) are caught here
  * per file; data-level parse failures become nulls (EtlOps try_*
  * variants) rather than killing a distributed job.
  */
object EtlPipeline {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** S3 — filename metadata: the config regex must yield exactly
    * (bank, accType, mappingType), else the file is skipped
    * (data_manager.py:143–159). The reference uses `re.match`, which
    * anchors at the START of the name (not a full match, not a search),
    * so we use `Matcher.lookingAt` — a pattern matching mid-name must
    * NOT route the file. */
  def extractFileMeta(config: EtlConfig, fileName: String): Option[(String, String, String)] = {
    val m = config.filePattern.pattern.matcher(fileName)
    if (m.lookingAt() && m.groupCount == 3)
      Some((m.group(1), m.group(2), m.group(3)))
    else None
  }

  /** S4 — config routing (data_manager.py:161–170). */
  def routeConfig(config: EtlConfig, mappingType: String, bank: String): Option[FileMappingConfig] =
    config.mapping.get(mappingType).flatMap(_.get(bank))

  /** S2 — csv scan with an explicit all-string schema, pushing all
    * typing decisions into the config-driven casts. Surrogate-key parity
    * note (SURVEY.md §7.3 risk 2): the reference hashes `astype(str)` of
    * pandas-*inferred* dtypes (data_manager.py:62), so raw-text reads
    * give byte-identical keys only when pandas would infer the key
    * columns as object/string; numeric key columns render differently
    * there ("123.40" → "123.4", int-with-NaN → "123.0") and would need
    * explicit normalization to match reference-era hashes. */
  def readCsv(spark: SparkSession, path: String, sep: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(StructField(_, StringType, nullable = true)))
    spark.read
      .option("sep", sep)
      .option("encoding", "UTF-8")
      .option("header", "true")
      .schema(schema)
      .csv(path)
  }

  /** Header sniff for the all-string schema (driver-side, one file).
    * Uses Spark's own CSV reader on a header-only sample so that (a) the
    * path resolves through the Hadoop FileSystem API — HDFS/S3/local all
    * work, matching the 100 TB design notes — and (b) quoted header
    * fields containing the separator parse correctly (a naive
    * split-on-separator would mis-parse them). Limit(0) + columns reads
    * only the header line, not the data. */
  private def csvHeader(spark: SparkSession, path: String, sep: String): Seq[String] =
    spark.read
      .option("sep", sep)
      .option("encoding", "UTF-8")
      .option("header", "true")
      .csv(path)
      .columns
      .toSeq

  /** EP3 — the per-file transform (data_manager.py:20–32, 59–95):
    * stm and sec branches share key/metadata ops and differ in the
    * scalar battery applied (data_manager.py:69–87). */
  def buildFilePlan(spark: SparkSession, path: String, bank: String,
      accType: String, mappingType: String, cfg: FileMappingConfig): DataFrame = {
    val fileName = Paths.get(path).getFileName.toString
    val base = readCsv(spark, path, cfg.csvSeparator, csvHeader(spark, path, cfg.csvSeparator))
    val shaped = EtlOps.selectAndRename(cfg.originalFields)(base)
    val keyed = EtlOps.withFileMetadata(bank, accType, fileName)(
      EtlOps.withSurrogateKey(cfg.surrogateKeyColumns)(shaped))
    val transformed = mappingType match {
      case "stm" =>
        // data_manager.py:69–77: decode account, parse dt, year/ym, amount
        val p = Seq[DataFrame => DataFrame](
          EtlOps.decode("acc_number", "acc_name", cfg.accounts),
          EtlOps.parseDate("dt", cfg.dateFormat),
          EtlOps.withYear("dt", "year"),
          EtlOps.withYm("dt", "ym"),
          EtlOps.parseCommaDecimal("sum", "sum_tmp"),
          EtlOps.signedAmount("sum_tmp", "dc", "sum_signed", cfg.debitMultiplier))
        p.foldLeft(keyed)((df, f) => f(df)).withColumn("sum", col("sum_signed"))
      case "sec" =>
        // data_manager.py:78–84: parse send/effect dates, effect year/ym
        val p = Seq[DataFrame => DataFrame](
          EtlOps.parseDate("send_dt", cfg.dateFormat),
          EtlOps.parseDate("effect_dt", cfg.dateFormat),
          EtlOps.withYear("effect_dt", "effect_year"),
          EtlOps.withYm("effect_dt", "effect_ym"))
        p.foldLeft(keyed)((df, f) => f(df))
      case other =>
        throw new IllegalArgumentException(s"unknown mapping type '$other'")
    }
    EtlOps.finalProjection(cfg.desiredFields)(transformed)
  }

  /** EP1 steps 1–3 (S1 + routing + per-file plans + U1): returns one
    * unioned DataFrame per mapping type, skipping unroutable files with
    * a log line exactly like the reference (data_manager.py:121–139).
    *
    * The per-file loop is driver-side plan *construction* only — the
    * resulting union is a single lazy plan whose file scans run fully
    * parallel across the cluster.
    */
  def processCsvFiles(spark: SparkSession, dir: String, config: EtlConfig): Map[String, DataFrame] = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.toLowerCase.endsWith(".csv")).toSeq.sorted
    if (files.isEmpty)
      throw new IllegalArgumentException(s"no csv files found in $dir") // settings.py:41–44
    val plans = files.flatMap { path =>
      val name = Paths.get(path).getFileName.toString
      val routed = for {
        (bank, accType, mappingType) <- extractFileMeta(config, name)
        cfg <- routeConfig(config, mappingType, bank)
      } yield (bank, accType, mappingType, cfg)
      routed match {
        case None =>
          log.warn(s"skipping $name: unroutable (pattern/config miss)")
          None
        case Some((bank, accType, mappingType, cfg)) =>
          try Some(mappingType -> buildFilePlan(spark, path, bank, accType, mappingType, cfg))
          catch {
            case NonFatal(e) =>
              log.warn(s"skipping $name: ${e.getMessage}")
              None
          }
      }
    }
    plans.groupMap(_._1)(_._2).map { case (t, dfs) =>
      t -> dfs.reduce(_.unionByName(_))
    }
  }

  /** EP1 steps 4–6 — incremental load (J1 + S6): anti-join the batch
    * against the sink's existing keys, append only new records,
    * partitioned by the config's year-month column when present
    * (scale: partition pruning for downstream readers + bounded file
    * counts per partition). */
  def incrementalAppend(spark: SparkSession, batch: DataFrame, sinkPath: String,
      ymColumn: Option[String] = None): Long = {
    val fresh =
      if (Files.exists(Paths.get(sinkPath))) {
        val existing = spark.read.parquet(sinkPath).select("surrogate_key")
        EtlOps.antiJoinNewRecords(batch, existing)
      } else batch
    val toWrite = fresh.cache()
    try {
      val n = toWrite.count()
      if (n > 0) {
        val w = toWrite.write.mode("append")
        ymColumn.fold(w)(c => w.partitionBy(c)).parquet(sinkPath)
      }
      n
    } finally toWrite.unpersist()
  }

  /** Load-reconciliation metrics for [[incrementalAppendObserved]].
    * `nRows`/`nNullKeys` are exact; `nYmApprox` is an HLL estimate
    * (DISTINCT is disallowed in observed metrics) — treat it as a
    * sanity signal, and read the written partition directories when
    * an exact partition count matters. */
  final case class LoadMetrics(nRows: Long, nNullKeys: Long, nYmApprox: Long)

  /** Single-pass observed variant of [[incrementalAppend]]: the
    * reconciliation counters every production load wants (rows
    * appended, null surrogate keys, distinct partitions touched) ride
    * the write itself via `observe()` — ONE pass over the batch, no
    * cache, no separate count job. The 100 TB shape: instrumentation
    * must never double-scan the data it audits.
    *
    * Trade-off vs [[incrementalAppend]]: an empty batch still runs
    * the (empty) write, so prefer this on paths where batches are
    * rarely empty — or follow with [[Compaction]] which absorbs
    * stray small files anyway. */
  def incrementalAppendObserved(
      spark: SparkSession, batch: DataFrame, sinkPath: String,
      ymColumn: Option[String] = None): LoadMetrics = {
    import org.apache.spark.sql.Observation
    val fresh =
      if (Files.exists(Paths.get(sinkPath))) {
        val existing = spark.read.parquet(sinkPath).select("surrogate_key")
        EtlOps.antiJoinNewRecords(batch, existing)
      } else batch
    val obs = Observation()
    val observed = fresh.observe(obs,
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("surrogate_key"))).as("n_null_keys"),
      ymColumn.map(c => approx_count_distinct(col(c)))
        .getOrElse(lit(0L)).as("n_ym"))
    val w = observed.write.mode("append")
    ymColumn.fold(w)(c => w.partitionBy(c)).parquet(sinkPath)
    val m = obs.get
    LoadMetrics(
      m("n_rows").asInstanceOf[Long],
      m("n_null_keys").asInstanceOf[Long],
      m("n_ym").asInstanceOf[Long])
  }
}
