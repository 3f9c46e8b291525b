package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev harness: time individual queries (2 runs each, same session
  * config as [[Bench]]) without the full bench sweep. Also reports
  * per-run job/stage/task counts and cumulative executor task time —
  * the fixed-overhead profile (a query that runs 20 jobs on KB-sized
  * data is paying scheduler latency, not compute). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: BenchOne <queryName>...|all <sfDir>")
      sys.exit(2)
    }
    val sfDir = args.last
    val names =
      if (args.length == 2 && args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else { val n = args.dropRight(1).toSeq; Harness.requireKnown(n); n }
    val spark = Harness.session()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      }
    })
    for (name <- names; i <- 1 to 2) {
      val (j0, s0, k0, n0) = (jobs.get, stages.get, tasks.get, taskNanos.get)
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => println(s"[benchone] $name FAILED: $e"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat before reading counters
      Thread.sleep(150)
      println(f"[benchone] $name run$i $wall%.2fs rows=$n jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0} taskTime=${(taskNanos.get - n0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
