package graft.multimodal

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Driver-facing query surface for the multimodal plumbing. */
object MediaQueries {

  /** Binary-column metadata pass — ingest schema, payload sizes, and
    * content fingerprints, verifiable in SQL because the deterministic
    * ingest is reconstructible by the oracle. */
  val q60MediaMeta: QueryDef = QueryDef(
    "q60_media_meta",
    """WITH a AS (
      |  SELECT doc_id AS asset_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    (CASE doc_id % 3 WHEN 0 THEN 'PNG0' WHEN 1 THEN 'RIFF' ELSE 'FTYP' END) || text AS payload,
      |    octet_length(encode(text)) + 4 AS payload_bytes
      |  FROM documents)
      |SELECT kind, count(*) AS n_assets, CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
      |  min(md5(payload)) AS min_fp, max(md5(payload)) AS max_fp
      |FROM a GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
    Media.ingest(s, Tables.documents(s, dir)).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("payload_bytes")).as("total_bytes"),
        min(md5(col("payload"))).as("min_fp"),
        max(md5(col("payload"))).as("max_fp"))
      .orderBy("kind")
  }

  /** Full decode pipeline — ingest → codec-affine repartition →
    * per-partition decode (stub codec for these foreign-magic
    * payloads, real batch shape) → feature aggregate. ORACLE-GATED
    * even through the mapPartitions stage: the stub's dims derive
    * from `java.util.Arrays.hashCode` over the body bytes, which the
    * SQL twin reproduces exactly — a list_reduce of the 31·h + b
    * recurrence with explicit 32-bit signed wrapping, trunc division
    * emulated as `(h - h % d) // d` (DuckDB `//` floors where Java
    * truncates), over `ord()` per char (the corpus is ASCII, the
    * same equivalence q24's rolling-hash oracle already relies on). */
  val q61MediaFeatures: QueryDef = QueryDef(
    "q61_media_features",
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    text, octet_length(encode(text)) AS blen
      |  FROM documents),
      |h AS (
      |  SELECT kind, blen,
      |    list_reduce(
      |      list_prepend(CAST(1 AS BIGINT),
      |        list_transform(range(1, length(text) + 1),
      |                       i -> CAST(ord(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, c) -> ((((a * 31 + c) + 2147483648) % 4294967296 + 4294967296) % 4294967296) - 2147483648) AS hh
      |  FROM b),
      |m AS (
      |  SELECT kind,
      |    16 + abs(hh % 1024) AS width,
      |    16 + abs(((hh - (hh % 1024)) // 1024) % 1024) AS height,
      |    CASE kind WHEN 'image' THEN 1
      |              WHEN 'audio' THEN 1 + blen // 64
      |              ELSE 1 + blen // 256 END AS n_frames
      |  FROM h)
      |SELECT kind, count(*) AS n_assets,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |  CAST(min(width) AS INT) AS min_w, CAST(max(width) AS INT) AS max_w,
      |  CAST(min(height) AS INT) AS min_h, CAST(max(height) AS INT) AS max_h
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
    val features = Media.decode(s, Media.ingest(s, Tables.documents(s, dir)))
    features.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_frames")).as("total_frames"),
        min(col("width")).as("min_w"),
        max(col("width")).as("max_w"),
        min(col("height")).as("min_h"),
        max(col("height")).as("max_h"))
      .orderBy("kind")
  }

  /** Frame sampling plumbing over the decoded features (stride 10) —
    * ORACLE-GATED: video assets take the deterministic stub codec
    * (`Media.decodeStub`: n_frames = 1 + body_bytes/256 where body is
    * the doc text), so the sampled-frame counts are closed-form from
    * `octet_length` and DuckDB verifies the whole decode→seek→sample
    * chain without touching a frame. */
  val q62FrameSample: QueryDef = QueryDef(
    "q62_frame_sample",
    """WITH v AS (
      |  SELECT doc_id AS asset_id,
      |    1 + octet_length(encode(text)) // 256 AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT asset_id,
      |  CAST(1 + (n_frames - 1) // 10 AS BIGINT) AS n_sampled,
      |  CAST(((n_frames - 1) // 10) * 10 AS INT) AS max_idx
      |FROM v ORDER BY asset_id LIMIT 100""".stripMargin) { (s, dir) =>
    val features = Media.decode(s, Media.ingest(s, Tables.documents(s, dir)))
    Media.sampleFrames(features.toDF(), stride = 10)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sampled"), max(col("frame_idx")).as("max_idx"))
      .orderBy("asset_id")
      .limit(100)
  }

  /** REAL codec, oracle-gated: Spark encodes each doc into an actual
    * P6 PPM and decodes it back through the mapPartitions codec stage;
    * the oracle computes the same dims in closed form from doc_id
    * (ingestPpm's w = 8 + id%9, h = 8 + (id/9)%9). A decode bug —
    * header parse, pixel count, dimension swap — breaks the hash
    * match, so the binary round trip is verified by DuckDB arithmetic
    * without DuckDB ever touching a pixel. */
  val q63ImageDecode: QueryDef = QueryDef(
    "q63_image_decode",
    """SELECT CAST(8 + doc_id % 9 AS INT) AS width,
      |  CAST(8 + (doc_id // 9) % 9 AS INT) AS height,
      |  count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Media.decode(s, Media.ingestPpm(s, Tables.documents(s, dir))).toDF()
      .groupBy(col("width"), col("height"))
      .agg(
        count(lit(1)).as("n"),
        min(col("asset_id")).as("min_id"),
        max(col("asset_id")).as("max_id"))
      .orderBy("width", "height")
  }

  /** REAL audio codec, oracle-gated (same contract as q63): Spark
    * encodes actual PCM WAVs and decodes them back through the codec
    * stage; the oracle derives rate / sample / chunk counts in closed
    * form from doc_id (ingestWav's rate = 8000 + id%8*1000,
    * n = 64 + id%100, chunks = 1 + (n-1)//64). */
  val q64AudioDecode: QueryDef = QueryDef(
    "q64_audio_decode",
    """SELECT CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
      |  count(*) AS n_assets,
      |  CAST(sum(1 + (64 + doc_id % 100 - 1) // 64) AS BIGINT) AS total_chunks,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Media.decode(s, Media.ingestWav(s, Tables.documents(s, dir))).toDF()
      .groupBy(col("width").as("sample_rate"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_frames")).as("total_chunks"),
        min(col("asset_id")).as("min_id"),
        max(col("asset_id")).as("max_id"))
      .orderBy("sample_rate")
  }

  /** REAL compressed-image codec, oracle-gated: Spark DEFLATE-encodes
    * the closed-form rasters ([[Media.ingestZppm]]) and the decode
    * stage genuinely inflates them back. The oracle derives the dims
    * histogram in closed form from doc_id — if the inflate path broke,
    * decode would fall through to the stub's hash-derived dims and the
    * hash compare would fail, so this gate proves the decompression
    * actually ran. */
  val q76CompressedDecode: QueryDef = QueryDef(
    "q76_compressed_decode",
    """SELECT CAST(8 + doc_id % 9 AS INT) AS width,
      |  CAST(8 + (doc_id // 9) % 9 AS INT) AS height,
      |  count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Media.decode(s, Media.ingestZppm(s, Tables.documents(s, dir))).toDF()
      .groupBy(col("width"), col("height"))
      .agg(
        count(lit(1)).as("n"),
        min(col("asset_id")).as("min_id"),
        max(col("asset_id")).as("max_id"))
      .orderBy("width", "height")
  }

  /** REAL video codec, oracle-gated (same contract as q76): Spark
    * builds motion-ZPPM containers and the decode stage walks the real
    * frame index and inflates frame 0; dims and frame counts come out
    * of the codec, the oracle derives them in closed form from doc_id
    * (ingestVid: dims per the PPM formula, n_frames = 1 + id%7). */
  val q77VideoDecode: QueryDef = QueryDef(
    "q77_video_decode",
    """SELECT CAST(8 + doc_id % 9 AS INT) AS width,
      |  CAST(8 + (doc_id // 9) % 9 AS INT) AS height,
      |  count(*) AS n,
      |  CAST(sum(1 + doc_id % 7) AS BIGINT) AS total_frames,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Media.decode(s, Media.ingestVid(s, Tables.documents(s, dir))).toDF()
      .groupBy(col("width"), col("height"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_frames")).as("total_frames"),
        min(col("asset_id")).as("min_id"),
        max(col("asset_id")).as("max_id"))
      .orderBy("width", "height")
  }

  /** q153 — scene-cut detection through the REAL video codec: decode
    * every consecutive frame pair of every motion-ZPPM asset (lazy
    * per-frame seek — only adjacent pairs inflate), sum the absolute
    * byte deltas of the raw RGB planes, and report per frame-width:
    * videos, transitions, total motion energy, and transitions whose
    * energy crosses the cut threshold — the shot-boundary statistic a
    * video-curation pipeline computes before frame sampling.
    *
    * The oracle replays the pixel generator in closed form (R drifts
    * +1 per frame with a 255→0 wrap, G is static, B is the xor
    * pattern), so a stubbed or wrong decode hash-mismatches — the
    * q115/q140 real-codec contract.
    *
    * Scale design: one mapPartitions pass per asset (frames decode
    * two-at-a-time, O(frame) memory), partial-aggregable sums per
    * width; output is |widths| rows. */
  val q153SceneCuts: QueryDef = {
    val T = 2000L // cut threshold: abs-byte-delta sum per transition
    QueryDef(
      "q153_scene_cuts",
      s"""WITH v AS (
         |  SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w,
         |    CAST(8 + (doc_id // 9) % 9 AS BIGINT) AS h,
         |    CAST(1 + doc_id % 7 AS BIGINT) AS nf
         |  FROM documents),
         |tr AS (
         |  SELECT v.doc_id, v.w, v.h, t.f
         |  FROM v, unnest(range(0, v.nf - 1)) AS t(f) WHERE v.nf > 1),
         |px AS (
         |  SELECT tr.doc_id, tr.w, tr.f,
         |    abs(CAST((tr.doc_id + x.x + tr.f + 1) % 256 AS BIGINT) -
         |        CAST((tr.doc_id + x.x + tr.f) % 256 AS BIGINT)) +
         |    abs(CAST(xor(xor(x.x, y.y), tr.f + 1) AS BIGINT) -
         |        CAST(xor(xor(x.x, y.y), tr.f) AS BIGINT)) AS d
         |  FROM tr, unnest(range(0, tr.w)) AS x(x), unnest(range(0, tr.h)) AS y(y)),
         |pt AS (
         |  SELECT doc_id, w, f, CAST(sum(d) AS BIGINT) AS delta
         |  FROM px GROUP BY doc_id, w, f),
         |a1 AS (SELECT w, CAST(count(*) AS BIGINT) AS n_videos FROM v GROUP BY w),
         |a2 AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n_transitions,
         |    CAST(sum(delta) AS BIGINT) AS total_delta,
         |    CAST(count(CASE WHEN delta >= $T THEN 1 END) AS BIGINT) AS n_cuts
         |  FROM pt GROUP BY w)
         |SELECT a1.w AS width, a1.n_videos,
         |  coalesce(a2.n_transitions, 0) AS n_transitions,
         |  coalesce(a2.total_delta, 0) AS total_delta,
         |  coalesce(a2.n_cuts, 0) AS n_cuts
         |FROM a1 LEFT JOIN a2 ON a2.w = a1.w
         |ORDER BY width""".stripMargin) { (s, dir) =>
      import s.implicits._
      val assets = Media.ingestVid(s, Tables.documents(s, dir))
      // (width, per-transition delta) rows + (width) per video, via the
      // REAL container walk and per-frame inflate
      val rows = assets.flatMap { a =>
        val v = Vid.decode(a.payload).get
        def img(i: Int): Ppm.Image = v.frame(i).get
        var prev = img(0)
        val out = Seq.newBuilder[(Long, Long, Boolean)] // (width, delta, isVideoRow)
        out += ((prev.width.toLong, 0L, true))
        (1 until v.nFrames).foreach { i =>
          val cur = img(i)
          var dsum = 0L
          var k = 0
          val pa = prev.pixels; val pb = cur.pixels
          while (k < pa.length) {
            dsum += math.abs((pa(k) & 0xff) - (pb(k) & 0xff))
            k += 1
          }
          out += ((cur.width.toLong, dsum, false))
          prev = cur
        }
        out.result()
      }.toDF("width", "delta", "is_video")
      val a1 = rows.filter(col("is_video"))
        .groupBy(col("width")).agg(count(lit(1)).as("n_videos"))
      val a2 = rows.filter(!col("is_video"))
        .groupBy(col("width"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(col("delta")).as("total_delta"),
          count(when(col("delta") >= T, 1)).as("n_cuts"))
      a1.join(a2, Seq("width"), "left")
        .select(col("width"), col("n_videos"),
          coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
          coalesce(col("total_delta"), lit(0L)).as("total_delta"),
          coalesce(col("n_cuts"), lit(0L)).as("n_cuts"))
        .orderBy("width")
    }
  }

  val all: Seq[QueryDef] =
    Seq(q60MediaMeta, q61MediaFeatures, q62FrameSample, q63ImageDecode,
      q64AudioDecode, q76CompressedDecode, q77VideoDecode, q153SceneCuts)
}
