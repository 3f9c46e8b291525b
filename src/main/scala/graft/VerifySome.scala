package graft

import java.nio.file.{Files, Paths}

/** Dev harness: dump a SUBSET of queries (same layout as [[Verify]])
  * for tools/check_oracle.py — fast iteration on one query without
  * rerunning the whole surface. */
object VerifySome {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: VerifySome <sfDir> <outDir> <queryName>...")
      sys.exit(2)
    }
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    Harness.requireKnown(names)
    val spark = Harness.session()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // GRAFT_KEEP_GOING=1: survey ALL failures instead of dying at the
    // first (the degenerate-corpus crash probe wants the full list —
    // q345's r11 crash aborted the run and hid six queries behind it)
    val keepGoing = sys.env.get("GRAFT_KEEP_GOING").contains("1")
    var failed = List.empty[String]
    for (n <- names) {
      try {
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$n")
        println(s"[verifysome] wrote $n")
      } catch {
        case e: Throwable if keepGoing =>
          failed ::= n
          println(s"[verifysome] FAILED $n: ${e.toString.take(300)}")
      }
    }
    if (failed.nonEmpty) {
      println(s"[verifysome] ${failed.size} FAILED: ${failed.reverse.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${Harness.jsonEscape(k)}: ${Harness.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
