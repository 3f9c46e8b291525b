package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** SCD Type-2 build: versioning, interval chaining, tie and null
  * semantics on handcrafted change streams. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def build(rows: Seq[(Long, String, Timestamp, Long)]) =
    Scd.buildType2(
      rows.toDF("ent", "attr", "t", "id"),
      entity = "ent", attr = "attr", orderBy = "t", tiebreak = "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2))

  test("stable attribute collapses to one open version") {
    val out = build(Seq(
      (1L, "A", ts("2024-01-01"), 1L),
      (1L, "A", ts("2024-02-01"), 2L),
      (1L, "A", ts("2024-03-01"), 3L)))
    assert(out === Seq((1L, 1L, "A", ts("2024-01-01"), None, true)))
  }

  test("flip-flop A,B,A yields three chained versions") {
    val out = build(Seq(
      (1L, "A", ts("2024-01-01"), 1L),
      (1L, "B", ts("2024-02-01"), 2L),
      (1L, "A", ts("2024-03-01"), 3L)))
    assert(out === Seq(
      (1L, 1L, "A", ts("2024-01-01"), Some(ts("2024-02-01")), false),
      (1L, 2L, "B", ts("2024-02-01"), Some(ts("2024-03-01")), false),
      (1L, 3L, "A", ts("2024-03-01"), None, true)))
    // intervals chain: each valid_to equals the next valid_from
    out.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a._5.contains(b._4))
      case _         =>
    }
  }

  test("same-timestamp observations resolve by the tiebreak column") {
    val t0 = ts("2024-01-01")
    val out = build(Seq(
      (1L, "B", t0, 2L), // same instant, higher id → ordered second
      (1L, "A", t0, 1L)))
    assert(out.map(v => (v._2, v._3)) === Seq((1L, "A"), (2L, "B")))
  }

  test("null attribute is a real version and null→value is a change") {
    val out = build(Seq(
      (1L, null, ts("2024-01-01"), 1L),
      (1L, null, ts("2024-02-01"), 2L), // no change (null <=> null)
      (1L, "A", ts("2024-03-01"), 3L)))
    assert(out.map(v => (v._2, Option(v._3))) ===
      Seq((1L, None), (2L, Some("A"))))
  }

  test("q66 plan shuffles once: both windows share the entity partitioning") {
    val plan = Scd.q66Scd2.build(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one shuffle, plan:\n$plan")
  }

  test("entities version independently") {
    val out = build(Seq(
      (1L, "A", ts("2024-01-01"), 1L),
      (2L, "X", ts("2024-01-01"), 2L),
      (2L, "Y", ts("2024-02-01"), 3L)))
    assert(out.count(_._1 == 1L) === 1)
    assert(out.count(_._1 == 2L) === 2)
    // exactly one current version per entity
    assert(out.groupBy(_._1).forall(_._2.count(_._6) == 1))
  }
}
