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

  /** Rewrite `dir` into ceil(totalBytes / targetBytes) files. Row count
    * is validated before the swap — a rewrite that lost rows aborts and
    * leaves the original directory untouched. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Result = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(fs, path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(dir)
    val expected = df.count()
    val tmp = new Path(dir + "__compact_tmp")
    val bak = new Path(dir + "__compact_bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    df.repartition(nOut).write.parquet(tmp.toString)

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
