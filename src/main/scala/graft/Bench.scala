package graft

/** Driver-run benchmark: every query at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout (the bench gate). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional arg: comma-separated query names for a targeted local
    // perf loop (the driver passes no args -> full surface)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val spark = Harness.session()
    spark.sparkContext.setLogLevel("WARN")
    // uncounted warm-up: JIT + codegen + shuffle machinery, so the
    // first measured query isn't charged the JVM's startup costs
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // sorted order: deterministic run sequence -> per-query timings
    // comparable across rounds. Best-of-3 per query: this box shows
    // multi-x transient noise under external load, and the driver
    // benches a single process — min-of-three bounds the exposure and
    // every raw run lands in bench_full.json so a round-over-round
    // scare can be adjudicated from the artifact alone, no rerun.
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Canary protocol (VERDICT r11 item 4): ten never-touched queries,
    // run as INTERLEAVED passes — one single-run pass of all ten every
    // ~45 main-loop queries plus one before the first and one after
    // the last, each stamped with its loop position and the box load
    // average AT THAT MOMENT. The r11 driver bench proved end-of-run
    // canaries measure the wrong window: a mid-run load tide inflated
    // 241 queries ×1.5 while the closing canary block read ×0.66
    // (faster!) because the tide had passed. Per-window samples let
    // bench_compare.py normalize each query by the drift of its
    // NEAREST canary pass instead of one global (possibly inverted)
    // ratio.
    // r12 addition: the original ten are all sub-0.3s scan-aggs, and
    // the r12 close proved a box-state mode that slows mid-weight
    // shuffle/CPU queries ~2x while leaving tiny scans at par (63
    // false-flagged queries, adjudicated by an r11-code A/B) - three
    // canaries FROM that cluster make the next such tide visible in
    // the canary channel itself
    val canaryNames = Seq(
      "q01_pricing_summary", "q02_surrogate_key", "q06_try_numeric",
      "q07_signed_amount", "q11_filter_project", "q13_left_join",
      "q14_distinct", "q123_chisq_independence", "q127_trimmed_stats",
      "q156_ohlc_bars",
      "q224_ks_test", "q230_sprt", "q115_phash_neardup")
    def loadavgNow: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }
    val canaryPasses =
      scala.collection.mutable.ArrayBuffer[(Int, String, Seq[(String, Double)])]()
    def canaryPass(pos: Int): Unit = if (only.isEmpty) {
      val la = loadavgNow
      val ts = canaryNames.flatMap { n =>
        SparkEntry.queries.get(n).map(fn => (n, once(fn)._1))
      }
      canaryPasses += ((pos, la, ts))
    }
    // a crashed query must read as a failure (-1), never as a fast run
    val mainSeq = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = mainSeq.zipWithIndex.map { case ((name, fn), idx) =>
      if (idx % 45 == 0) canaryPass(idx)
      val runs = Seq.fill(3)(once(fn))
      val best = if (runs.forall(_._2)) runs.map(_._1).min else -1.0
      (name, best, runs.map(_._1))
    }
    canaryPass(mainSeq.size)
    // legacy per-canary summary (kept for cross-round compare with
    // r10/r11 artifacts): MEDIAN across this run's interleaved passes
    val canaries = canaryNames.flatMap { n =>
      val ts = canaryPasses.flatMap(_._3.collect { case (`n`, t) => t })
        .sorted
      if (ts.isEmpty) None else Some((n, ts(ts.size / 2)))
    }
    val loadavg = loadavgNow
    val canaryJson = canaries.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val passJson = canaryPasses.map { case (pos, la, ts) =>
      val tj = ts.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      s"""{"pos":$pos,"loadavg":[$la],"t":$tj}"""
    }.mkString("[", ",", "]")
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the driver's artifact capture is head-bounded and the per-query
    // map alone overflows it (r6's BENCH artifact ended mid-JSON with
    // no recoverable total) — so emit a SHORT self-sufficient total
    // line FIRST, then the full per-query line; any bounded prefix of
    // stdout now contains a parseable {"metric":"total",...} record
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"canaries":$canaryJson,"canary_passes":$passJson,"loadavg":[$loadavg],"sf":"$sfDir"}"""
    println(line)
    // the driver's artifact capture keeps only the TAIL of sbt output,
    // which once truncated the per-query map mid-JSON and made five
    // untouched queries look regressed — persist the full line too so
    // the record is lossless regardless of how stdout is clipped.
    // bench_full.json additionally carries the raw per-run timings
    // behind each best-of-3 number (same key order as "queries").
    val raw = results
      .map { case (k, _, rs) => s"\"" + k + "\":" + rs.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"raw":$raw,"canaries":$canaryJson,"canary_passes":$passJson,"loadavg":[$loadavg],"sf":"$sfDir"}"""
    // a FILTERED run must not clobber the full-surface artifact the
    // closing summary is derived from (verify_pass.py --summary)
    val artifact =
      if (only.isEmpty) "target/bench_full.json" else "target/bench_some.json"
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(artifact),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // ...and LAST as well: r6's artifact was clipped on BOTH ends (it
    // started and ended mid-map), so bracket the long line with the
    // short record — a bounded capture from either end now contains a
    // complete total
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
