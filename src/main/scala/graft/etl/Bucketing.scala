package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the shuffle-amortization half of the 100 TB
  * join story (the partition-pruning half is the PARTITIONED BY layout
  * in PlanAuditSpec's ANN case).
  *
  * A fact table that is joined on the same key by every downstream
  * query (the reference joins staged transactions to the existing-key
  * set on the surrogate key for every incremental load —
  * /root/reference/utils/db_manager.py:56–57) pays one shuffle per
  * query unless its layout already guarantees co-location. Writing
  * both sides `bucketBy(n, key)` (hash-partitioned files, recorded in
  * the catalog) lets Spark plan every subsequent equi-join on that key
  * with ZERO Exchange operators: each task reads bucket i of both
  * sides. `sortBy` additionally pre-sorts within buckets so the
  * sort-merge join skips its Sort too — the join becomes a pure
  * streaming merge of co-located files.
  *
  * At 100 TB the bucket count is chosen so one bucket of the big side
  * fits an executor's scan budget (e.g. 4096 buckets for ~25 GB each);
  * bucket counts on the two sides must be equal (or integer multiples,
  * with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a catalog table hash-bucketed on `key` (and
    * optionally pre-sorted within buckets).
    *
    * The write first repartitions on the key with the SAME murmur3
    * hash partitioning the bucketing uses, so every task holds exactly
    * one bucket and each bucket lands as ONE file — the scan-side
    * sorted-bucket optimization (no per-task Sort before a merge join)
    * only engages when buckets are single files. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val w = df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Equi-join two bucketed catalog tables on their bucket keys. When
    * both sides are bucketed with the same count, the physical plan
    * has no Exchange (asserted in BucketingSpec). */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      leftKey: String,
      rightTable: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
