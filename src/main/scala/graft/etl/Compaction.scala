package graft.etl

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
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
  * Hive-style `col=value` layouts are compacted one leaf directory at
  * a time: each partition directory is rewritten in place to its own
  * ceil(bytes/target) files, so (a) per-directory sizing is exact even
  * under heavy partition skew, (b) partition values never round-trip
  * through Spark's partition-type inference (a string `month=01` stays
  * the directory name `month=01` — the compactor never materializes
  * it as a column), and (c) pruning and future partitioned appends
  * keep working unchanged. The driver loops over leaf directories —
  * bounded by partition count; at very large partition counts run the
  * loop over a subset (e.g. yesterday's partitions) per invocation.
  *
  * Swap protocol (per leaf): write to a sibling tmp dir, then rename
  * old → bak, tmp → live, delete bak. On HDFS/local renames are atomic
  * per directory; on object stores rename is copy+delete, so
  * production there should swap a table-format pointer (Iceberg/
  * Delta-style manifest) instead — this utility keeps the engine-side
  * mechanics (sizing, rewrite, validation) identical either way.
  *
  * The directory MUST be quiescent for the duration of the compaction:
  * a file appended between read planning and the swap is not in the
  * rewrite and is deleted with the old directory. Stop streaming sinks
  * (or compact only closed partitions) before calling — the same
  * contract every file-level compactor without a transaction log has.
  */
object Compaction {

  final case class Result(filesBefore: Int, filesAfter: Int, rows: Long)

  private def dataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[FileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) out += f
    }
    out.result()
  }

  /** Leaf data directories (the dirs that directly hold parquet
    * files) — one entry, the root itself, for a flat layout. */
  private def leafDirs(files: Seq[FileStatus]): Seq[Path] =
    files.map(_.getPath.getParent).distinct

  /** Compact one flat directory of parquet files in place. */
  private def compactLeaf(spark: SparkSession, fs: FileSystem, dir: Path,
      files: Seq[FileStatus], targetBytes: Long): Result = {
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir.toString)
    val expected = df.count()
    val tmp = new Path(dir.toString + "__compact_tmp")
    val bak = new Path(dir.toString + "__compact_bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    df.repartition(nOut).write.parquet(tmp.toString)

    val got = spark.read.parquet(tmp.toString).count()
    if (got != expected) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction aborted at $dir: rewrite has $got rows, source has $expected")
    }
    if (!fs.rename(dir, bak)) throw new IllegalStateException(s"cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // restore
      throw new IllegalStateException(s"cannot promote $tmp; original restored")
    }
    fs.delete(bak, true)
    Result(files.size, dataFiles(fs, dir).size, expected)
  }

  /** Rewrite `dir` (flat or Hive-partitioned) into ~targetBytes files
    * per leaf directory. Row counts are validated per leaf before each
    * swap — a rewrite that lost rows aborts that leaf and leaves it
    * untouched. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Result = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = dataFiles(fs, root)
    val byLeaf = all.groupBy(_.getPath.getParent)
    leafDirs(all).map(d => compactLeaf(spark, fs, d, byLeaf(d), targetBytes))
      .foldLeft(Result(0, 0, 0L)) { (a, b) =>
        Result(a.filesBefore + b.filesBefore, a.filesAfter + b.filesAfter, a.rows + b.rows)
      }
  }
}
