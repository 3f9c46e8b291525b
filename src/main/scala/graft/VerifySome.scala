package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Dev harness: dump a subset of queries for tools/check_oracle.py. */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[verifysome] wrote $n")
    }
    val sqls = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    Files.write(Paths.get(s"$outDir/oracle_sql.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
