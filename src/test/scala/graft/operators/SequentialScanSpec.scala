package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q126's distributed secondary-sort scan vs the sequential
  * definition on adversarial in-memory data — many keys, shuffled
  * input order, forced small partition count, so per-partition
  * boundary resets between adjacent users are actually exercised
  * (the oracle gate only sees the real table's layout). */
class SequentialScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clamped-balance scan == sequential fold on shuffled multi-key data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 40 users x ~50 events, deltas mixed sign, presented UNSORTED
    val rows = rnd.shuffle((1 to 2000).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100000).toLong, i.toLong,
        (rnd.nextInt(2001) - 1000).toLong)
    }.toSeq)
    val expected = rows
      .groupBy(_._1).view.mapValues { evs =>
        var bal = 0L; var clamps = 0L; var peak = 0L
        evs.sortBy(e => (e._2, e._3)).foreach { case (_, _, _, d) =>
          val nb = bal + d
          if (nb < 0) { clamps += 1; bal = 0L } else bal = nb
          if (bal > peak) peak = bal
        }
        (bal, clamps, peak)
      }.toMap
    val got = Packing.clampedBalance(spark,
        rows.toDF("user_id", "us", "event_id", "d"), partitions = Some(7))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }
}
