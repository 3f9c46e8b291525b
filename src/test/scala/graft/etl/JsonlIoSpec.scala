package graft.etl

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

class JsonlIoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  private def writeCorpus(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    lines.foreach(w.println)
    w.close()
    dir.getAbsolutePath
  }

  private val good = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
    """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
    """{"doc_id": 3, "text": "missing lang field"}""")
  private val bad = Seq(
    """{"doc_id": 4, "text": "unterminated""",
    """not json at all""")

  test("reads conforming lines under the contract schema, quarantines the rest") {
    val path = writeCorpus(scala.util.Random.shuffle(good ++ bad))
    val df = JsonlIo.read(spark, path, schema)
    val clean = JsonlIo.goodRecords(df)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(clean.count() == 3)
    assert(clean.filter(col("doc_id") === 2).select("lang")
      .collect().head.getString(0) == "fr")
    // a missing OPTIONAL field is null, not corrupt
    assert(clean.filter(col("doc_id") === 3).select("lang")
      .collect().head.isNullAt(0))
    val dead = JsonlIo.badRecords(df).collect()
      .map(_.getAs[String](JsonlIo.CorruptCol)).toSet
    assert(dead == bad.toSet, "dead-letter feed must carry the raw lines")
  }

  test("audit counts lines, corruption, and per-field nulls in one pass") {
    val path = writeCorpus(good ++ bad)
    val row = JsonlIo.audit(JsonlIo.read(spark, path, schema)).collect().head
    assert(row.getAs[Long]("n_lines") == 5)
    assert(row.getAs[Long]("n_corrupt") == 2)
    assert(row.getAs[Long]("null_doc_id") == 0)
    assert(row.getAs[Long]("null_text") == 0)
    assert(row.getAs[Long]("null_lang") == 1)
  }
}
