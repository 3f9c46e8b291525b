package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet sink directories.
  *
  * Streaming sinks and frequent incremental appends (EtlPipeline /
  * StreamOps) accrete many small files; at scale that degrades scan
  * planning (file listing), wastes parquet footer overhead, and starves
  * row-group-level pushdown. Compaction rewrites a directory into
  * ~`targetBytes` files sized for `spark.sql.files.maxPartitionBytes`-
  * aligned scans.
  *
  * Swap protocol: write to a sibling tmp dir, then rename old → bak,
  * tmp → live, delete bak. On HDFS/local renames are atomic per
  * directory; on object stores rename is copy+delete, so production
  * there should swap a table-format pointer (Iceberg/Delta-style
  * manifest) instead — this utility keeps the engine-side mechanics
  * (sizing, rewrite, validation) identical either way.
  *
  * The directory MUST be quiescent for the duration of the compaction:
  * a file appended between read planning and the swap is not in the
  * rewrite and is deleted with the old directory. Stop streaming sinks
  * (or compact the previous day's partitions only) before calling —
  * the same contract every file-level compactor without a transaction
  * log has.
  *
  * Hive-style `col=value` partition layouts are preserved: partition
  * directories are re-created by partitionBy on the same columns, so
  * downstream partition pruning and future partitioned appends keep
  * working.
  */
object Compaction {

  final case class Result(filesBefore: Int, filesAfter: Int, rows: Long)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) out += f
    }
    out.result()
  }

  /** Partition columns of a Hive-layout directory, outermost first:
    * the `col=` names on the path from the root to the first data
    * file. Empty for a flat directory. */
  private def partitionColumns(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[String] = {
    val files = dataFiles(fs, dir)
    if (files.isEmpty) return Nil
    // listed files come back scheme-qualified (file:/..., hdfs://...);
    // qualify the root the same way or the prefix strip never matches
    val root = fs.makeQualified(dir).toString
    val rel = files.head.getPath.toString.stripPrefix(root).stripPrefix("/")
    rel.split('/').toSeq.dropRight(1).takeWhile(_.contains('=')).map(_.takeWhile(_ != '='))
  }

  /** Rewrite `dir` into ceil(totalBytes / targetBytes) files (per
    * partition directory when the layout is partitioned). Row count is
    * validated before the swap — a rewrite that lost rows aborts and
    * leaves the original directory untouched. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Result = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(fs, path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val partCols = partitionColumns(fs, path)

    val df = spark.read.parquet(dir)
    val expected = df.count()
    val tmp = new Path(dir + "__compact_tmp")
    val bak = new Path(dir + "__compact_bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    // partitioned layout: repartition on the partition columns so each
    // output directory gets coalesced files (a random repartition would
    // scatter every partition's rows across all nOut tasks and write
    // nOut small files per directory — the opposite of compaction)
    val writer =
      if (partCols.isEmpty) df.repartition(nOut).write
      else df.repartition(nOut, partCols.map(org.apache.spark.sql.functions.col): _*)
        .write.partitionBy(partCols: _*)
    writer.parquet(tmp.toString)

    val got = spark.read.parquet(tmp.toString).count()
    if (got != expected) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction aborted: rewrite has $got rows, source has $expected")
    }
    if (!fs.rename(path, bak)) throw new IllegalStateException(s"cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore
      throw new IllegalStateException(s"cannot promote $tmp; original restored")
    }
    fs.delete(bak, true)
    Result(before.size, dataFiles(fs, path).size, expected)
  }
}
