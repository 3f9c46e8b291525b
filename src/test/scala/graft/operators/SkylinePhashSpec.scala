package graft.operators

import graft.TestSpark
import graft.multimodal.{Media, Phash, Ppm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties the q110/q115 oracle gates cannot probe: the skyline's
  * two-stage prune against brute force on adversarial tie patterns,
  * and the pigeonhole losslessness of the phash banding. */
class SkylinePhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bruteSkyline(rows: Seq[(Long, String, Double, Int)]): Set[Long] =
    rows.filter { case (_, _, pr, sz) =>
      !rows.exists { case (_, _, qr, qz) =>
        (qr < pr && qz >= sz) || (qr <= pr && qz > sz)
      }
    }.map(_._1).toSet

  test("skyline two-stage prune == brute force, incl. duplicate points and ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small value domains force heavy price/size ties across bucket
    // boundaries — the regime where the strictness bookkeeping matters
    val rows: Seq[(Long, String, Double, Int)] = (0L until 400L).map { i =>
      (i, s"p$i", 900.0 + rnd.nextInt(40) * 0.5, 1 + rnd.nextInt(8))
    } ++ Seq( // exact duplicates of an extreme point: both must be kept
      (400L, "dup1", 900.0, 8), (401L, "dup2", 900.0, 8))
    val df = rows.toDF("p_partkey", "p_name", "p_retailprice", "p_size")
    val got = Skyline.skyline(df).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    assert(got == bruteSkyline(rows))
  }

  test("phash banded candidates are lossless at hamming <= 3 (pigeonhole)") {
    // any pair with < 4 differing bits leaves at least one of the 4
    // 16-bit bands untouched, so the band equi-join must surface it
    val rnd = new scala.util.Random(11)
    val base = Array.fill(4)(rnd.nextInt(1 << 16).toLong)
    for (_ <- 1 to 200) {
      val flips = rnd.nextInt(4) // 0..3 bit flips
      val other = base.clone()
      for (_ <- 0 until flips) {
        val bit = rnd.nextInt(64)
        other(bit / 16) ^= (1L << (bit % 16))
      }
      assert(base.indices.exists(k => base(k) == other(k)),
        s"no shared band after $flips flips")
    }
  }

  test("aHash bands match a per-pixel reference on a decoded raster") {
    import spark.implicits._
    val docs = spark.range(0, 30)
      .select(col("id").as("doc_id"), lit("t").as("text"),
        lit("en").as("lang"), lit("src").as("source"), lit(1L).as("n_chars"))
    val got = Phash.aHashBands(spark, Media.ingestPpm(spark, docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (id <- 0L until 30L) {
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id / 9) % 9).toInt
      val img = Ppm.decode(Ppm.encode(w, h, (x, y) =>
        (((id + x) % 256).toInt << 16) | (((id + y) % 256).toInt << 8) | ((x ^ y) % 256))).get
      val gray = (0 until 64).map { i =>
        val sx = (i % 8) * w / 8; val sy = (i / 8) * h / 8
        val p = (sy * w + sx) * 3
        ((img.pixels(p) & 0xff) + (img.pixels(p + 1) & 0xff) + (img.pixels(p + 2) & 0xff)) / 3
      }
      val mean = gray.sum / 64
      val exp = (0 until 4).map { k =>
        (0 until 16).map(j => if (gray(k * 16 + j) > mean) 1L << j else 0L).sum
      }
      assert(got(id) == ((exp(0), exp(1), exp(2), exp(3))), s"id=$id")
    }
  }
}
