package graft

/** Driver-run benchmark: every query at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout (the bench gate). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()
    spark.sparkContext.setLogLevel("WARN")
    // uncounted warm-up: JIT + codegen + shuffle machinery, so the
    // first measured query isn't charged the JVM's startup costs
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // sorted order: deterministic run sequence -> per-query timings
    // comparable across rounds. Best-of-2 per query: this box shows
    // multi-x transient noise under external load, and the driver
    // benches a single process — min-of-two bounds the exposure.
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // a crashed query must read as a failure (-1), never as a fast run
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t1, ok1) = once(fn)
      val (t2, ok2) = once(fn)
      name -> (if (ok1 && ok2) math.min(t1, t2) else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // the driver's artifact capture keeps only the TAIL of sbt output,
    // which once truncated the per-query map mid-JSON and made five
    // untouched queries look regressed — persist the full line too so
    // the record is lossless regardless of how stdout is clipped
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/bench_full.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
