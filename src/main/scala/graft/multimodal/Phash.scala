package graft.multimodal

import graft.CkptOps

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
    // SIGNATURE DICTIONARY: perceptual hashes repeat heavily (that is
    // the point of near-dup detection), so doc-level banding puts every
    // identical-signature doc in one bucket and the candidate join goes
    // quadratic in the duplicate-class size — the classic LSH hot
    // bucket. Collapse to distinct signatures first: each class keeps
    // (n, two smallest ids, two largest ids), which is sufficient to
    // reconstruct EXACT pair counts and the min/max pair keys, and the
    // banded join then runs over the dictionary (bounded by signature
    // diversity, not corpus size).
    val sigW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .orderBy(col("doc_id"))
    val sigWd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .orderBy(col("doc_id").desc)
    val sigs = aHashBands(s, Media.ingestPpm(s, Tables.documents(s, dir)))
      .withColumn("rn", row_number().over(sigW))
      .withColumn("rd", row_number().over(sigWd))
      .groupBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .agg(count(lit(1)).as("n"),
        min(when(col("rn") === 1, col("doc_id"))).as("min1"),
        min(when(col("rn") === 2, col("doc_id"))).as("min2"),
        min(when(col("rd") === 1, col("doc_id"))).as("max1"),
        min(when(col("rd") === 2, col("doc_id"))).as("max2"))
      .withColumn("sig_id", col("min1"))
      .ckpt() // feeds the band join twice + both sides below
    // same-signature classes: C(n,2) pairs, all at hamming 0
    val within = sigs.filter(col("n") >= 2).select(
      lit(0L).as("hamming"),
      expr("(n * (n - 1)) div 2").as("pairs"),
      (col("min1") * 1000000 + col("min2")).as("min_key"),
      (col("max2") * 1000000 + col("max1")).as("max_key"))
    // cross-class candidates from the banded dictionary join
    val keyed = sigs.select(col("sig_id"), explode(array(
        struct(lit(0).as("bi"), col("b0").as("bv")),
        struct(lit(1).as("bi"), col("b1").as("bv")),
        struct(lit(2).as("bi"), col("b2").as("bv")),
        struct(lit(3).as("bi"), col("b3").as("bv")))).as("k"))
      .select(col("sig_id"), col("k.bi").as("bi"), col("k.bv").as("bv"))
    val cand = keyed.select(col("bi"), col("bv"), col("sig_id").as("sa"))
      .join(keyed.select(col("bi"), col("bv"), col("sig_id").as("sb")),
        Seq("bi", "bv"))
      .filter(col("sa") < col("sb"))
      .select(col("sa"), col("sb")).distinct()
    val left = sigs.select(col("sig_id").as("sa"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"),
      col("n").as("na"), col("min1").as("amin"), col("max1").as("amax"))
    val right = sigs.select(col("sig_id").as("sb"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"),
      col("n").as("nb"), col("min1").as("bmin"), col("max1").as("bmax"))
    val across = cand.join(left, Seq("sa")).join(right, Seq("sb"))
      .withColumn("hamming", expr(
        "CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"))
      .filter(col("hamming").between(1, 3))
      .select(col("hamming"),
        (col("na") * col("nb")).as("pairs"),
        (least(col("amin"), col("bmin")) * 1000000 +
          greatest(col("amin"), col("bmin"))).as("min_key"),
        (least(col("amax"), col("bmax")) * 1000000 +
          greatest(col("amax"), col("bmax"))).as("max_key"))
    within.unionByName(across)
      .groupBy(col("hamming"))
      .agg(sum(col("pairs")).as("n_pairs"),
        min(col("min_key")).as("min_pair_key"),
        max(col("max_key")).as("max_pair_key"))
      .orderBy("hamming")
  }

  /** q140 — audio level audit through the REAL WAV codec: decode each
    * PCM payload (RIFF chunk walk, little-endian 16-bit samples) and
    * report per sample-rate the integer level stats — total samples,
    * summed |amplitude|, peak, and near-clipping count. The loudness/
    * clipping QA pass an audio-corpus ingest runs.
    *
    * Same gate contract as q63/q64: the oracle replays the generator's
    * closed-form samples in SQL arithmetic, so a header-parse or
    * byte-order bug on the decode path breaks the hash match — DuckDB
    * never touches a byte. All stats are int64. */
  val q140AudioLevels: QueryDef = QueryDef(
    "q140_audio_levels",
    """WITH a AS (
      |  SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS rate, 64 + doc_id % 100 AS n
      |  FROM documents),
      |s AS (
      |  SELECT a.doc_id, a.rate,
      |    abs(((a.doc_id * 31 + i * 17) % 65536) - 32768) AS av
      |  FROM a, unnest(range(0, CAST(a.n AS BIGINT))) AS r(i))
      |SELECT CAST(rate AS BIGINT) AS sample_rate,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_assets,
      |  CAST(count(*) AS BIGINT) AS total_samples,
      |  CAST(sum(av) AS BIGINT) AS sum_abs,
      |  CAST(max(av) AS BIGINT) AS max_abs,
      |  CAST(count(CASE WHEN av >= 32000 THEN 1 END) AS BIGINT) AS n_loud
      |FROM s GROUP BY rate ORDER BY sample_rate""".stripMargin) { (s, dir) =>
    import s.implicits._
    Media.ingestWav(s, Tables.documents(s, dir))
      .mapPartitions { it =>
        it.flatMap { a =>
          Wav.decode(a.payload).map { au =>
            var sumAbs = 0L; var maxAbs = 0L; var loud = 0L
            au.samples.foreach { sm =>
              val v = math.abs(sm.toLong)
              sumAbs += v
              if (v > maxAbs) maxAbs = v
              if (v >= 32000) loud += 1
            }
            (au.sampleRate.toLong, au.samples.length.toLong, sumAbs, maxAbs, loud)
          }
        }
      }
      .toDF("sample_rate", "ns", "sum_abs", "max_abs", "loud")
      .groupBy(col("sample_rate"))
      .agg(count(lit(1)).as("n_assets"), sum(col("ns")).as("total_samples"),
        sum(col("sum_abs")).as("sum_abs"), max(col("max_abs")).as("max_abs"),
        sum(col("loud")).as("n_loud"))
      .orderBy("sample_rate")
  }

  val all: Seq[QueryDef] = Seq(q115PhashNeardup, q140AudioLevels)
}
