package graft

/** Dev harness: write `.explain("formatted")` for named queries to
  * files (`<outDir>/<query>_<tag>.txt`) — the optimization rounds'
  * before/after plan evidence (plans/rNN/). `all` dumps every query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: PlanDump <queryName>...|all <sfDir> <outDir> [tag]")
      sys.exit(2)
    }
    val tag = if (args.length >= 4) args.last else "plan"
    val (names0, sfDir, outDir) =
      if (args.length >= 4) (args.dropRight(3), args(args.length - 3), args(args.length - 2))
      else (args.dropRight(2), args(args.length - 2), args(args.length - 1))
    val names =
      if (names0.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else { Harness.requireKnown(names0.toSeq); names0.toSeq }
    val spark = Harness.session()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val txt =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
