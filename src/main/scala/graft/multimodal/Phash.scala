package graft.multimodal

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image hashing over the REAL PPM codec: the aHash
  * (average-hash) near-duplicate pass an image-corpus curation
  * pipeline runs before training — decode, downsample to an 8×8
  * luma grid, threshold against the grid mean, compare 64-bit
  * signatures by Hamming distance.
  *
  * Everything is integer math on decoded bytes (nearest-neighbor
  * sampling, floor divisions), so the signature is a pure function of
  * the pixel content — the DuckDB oracle replays it in closed form
  * from doc_id (ingestPpm's raster formula) WITHOUT touching a pixel:
  * a header-parse or sampling bug on the Spark side breaks the hash
  * match.
  *
  * Scale design: signatures are 4×16-bit bands; candidate pairs come
  * from an equi-join on (band index, band value) — the LSH banding
  * shape, so the corpus is never all-paired. With threshold ≤ 3 and 4
  * bands the banding is provably LOSSLESS (pigeonhole: < 4 differing
  * bits cannot touch all 4 bands), which is why the brute-force
  * oracle is the exact gate, not an approximation of it. The final
  * report aggregates per distance, so output stays O(threshold) at
  * any corpus size.
  */
object Phash {

  /** (asset_id, b0..b3): the 64-bit aHash as four 16-bit bands,
    * computed from genuinely decoded PPM payloads. */
  def aHashBands(spark: org.apache.spark.sql.SparkSession,
      assets: org.apache.spark.sql.Dataset[Media.MediaAsset]): DataFrame = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        Ppm.decode(a.payload).map { img =>
          val w = img.width; val h = img.height
          val gray = new Array[Int](64)
          var i = 0
          while (i < 64) {
            val sx = (i % 8) * w / 8
            val sy = (i / 8) * h / 8
            val p = (sy * w + sx) * 3
            gray(i) = ((img.pixels(p) & 0xff) + (img.pixels(p + 1) & 0xff) +
              (img.pixels(p + 2) & 0xff)) / 3
            i += 1
          }
          val mean = gray.sum / 64
          val bands = new Array[Long](4)
          i = 0
          while (i < 64) {
            if (gray(i) > mean) bands(i / 16) |= (1L << (i % 16))
            i += 1
          }
          (a.asset_id, bands(0), bands(1), bands(2), bands(3))
        }
      }
    }.toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  val q115PhashNeardup: QueryDef = QueryDef(
    "q115_phash_neardup",
    """WITH g AS (
      |  SELECT doc_id, i,
      |    ( ((doc_id + ((i % 8) * (8 + doc_id % 9)) // 8) % 256)
      |    + ((doc_id + ((i // 8) * (8 + (doc_id // 9) % 9)) // 8) % 256)
      |    + (xor(((i % 8) * (8 + doc_id % 9)) // 8,
      |           ((i // 8) * (8 + (doc_id // 9) % 9)) // 8) % 256) ) // 3 AS gray
      |  FROM documents, unnest(range(0, 64)) AS r(i)),
      |m AS (SELECT doc_id, sum(gray) // 64 AS mean FROM g GROUP BY doc_id),
      |bits AS (SELECT g.doc_id, g.i,
      |           CASE WHEN g.gray > m.mean THEN 1 ELSE 0 END AS bit
      |         FROM g JOIN m ON g.doc_id = m.doc_id),
      |bands AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN i // 16 = 0 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS b0,
      |    CAST(sum(CASE WHEN i // 16 = 1 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS b1,
      |    CAST(sum(CASE WHEN i // 16 = 2 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS b2,
      |    CAST(sum(CASE WHEN i // 16 = 3 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS b3
      |  FROM bits GROUP BY doc_id),
      |p AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb,
      |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |       + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
      |  FROM bands a JOIN bands b ON a.doc_id < b.doc_id)
      |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
      |  min(ida * 1000000 + idb) AS min_pair_key,
      |  max(ida * 1000000 + idb) AS max_pair_key
      |FROM p WHERE hamming <= 3 GROUP BY hamming ORDER BY hamming""".stripMargin) { (s, dir) =>
    val bands = aHashBands(s, Media.ingestPpm(s, Tables.documents(s, dir)))
      .localCheckpoint() // feeds the band join twice + the hash attach
    val keyed = bands.select(col("doc_id"), explode(array(
        struct(lit(0).as("bi"), col("b0").as("bv")),
        struct(lit(1).as("bi"), col("b1").as("bv")),
        struct(lit(2).as("bi"), col("b2").as("bv")),
        struct(lit(3).as("bi"), col("b3").as("bv")))).as("k"))
      .select(col("doc_id"), col("k.bi").as("bi"), col("k.bv").as("bv"))
    val cand = keyed.select(col("bi"), col("bv"), col("doc_id").as("ida"))
      .join(keyed.select(col("bi"), col("bv"), col("doc_id").as("idb")),
        Seq("bi", "bv"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
    val ha = bands.select(col("doc_id").as("ida"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = bands.select(col("doc_id").as("idb"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, Seq("ida")).join(hb, Seq("idb"))
      .withColumn("hamming", expr(
        "CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"))
      .filter(col("hamming") <= 3)
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("ida") * 1000000 + col("idb")).as("min_pair_key"),
        max(col("ida") * 1000000 + col("idb")).as("max_pair_key"))
      .orderBy("hamming")
  }

  val all: Seq[QueryDef] = Seq(q115PhashNeardup)
}
