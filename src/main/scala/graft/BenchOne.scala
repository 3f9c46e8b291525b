package graft

/** Dev harness: time individual queries (2 runs each, same session
  * config as [[Bench]]) without the full bench sweep. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: BenchOne <queryName>... <sfDir>")
      sys.exit(2)
    }
    val sfDir = args.last
    val names = args.dropRight(1)
    Harness.requireKnown(names)
    val spark = Harness.session()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[benchone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
