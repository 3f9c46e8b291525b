package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — image/audio/video as opaque `binary`
  * columns with typed metadata, and a decode/feature-extract stage
  * whose Spark-side shape (schema, partitioning, per-partition batch
  * iteration) is real while the actual codec is a deterministic stub
  * (no image/audio libraries in this environment; SURVEY.md §7.2
  * Phase 3 / builder prompt).
  *
  * Scale design (100 TB of media):
  *  - blobs ride in a `binary` column next to their metadata — one
  *    scan, no tiny-file reads; `spark.sql.files.maxPartitionBytes`
  *    bounds partition memory, so executors never hold more than a
  *    partition of blobs;
  *  - decode runs via `mapPartitions`: per-partition iterator-to-
  *    iterator, streaming — a real decoder (JNI codec, ONNX runtime)
  *    would be initialized once per partition, not per row (the same
  *    batch shape `mapInPandas` gives Python);
  *  - `repartition(kind)` gives codec affinity (each partition holds
  *    one media kind, so one decoder instance serves the partition);
  *  - features come back as a fixed-width `Array[Float]` column ready
  *    for the [[graft.operators.Similarity]] ANN path.
  */
object Media {

  /** An ingested asset: opaque payload + typed metadata. */
  final case class MediaAsset(
      asset_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      meta_source: String,
      payload_bytes: Long)

  /** Decoded features — what a real decoder would emit. */
  final case class MediaFeatures(
      asset_id: Long,
      kind: String,
      width: Int, // images/video: pixel dims; audio: sample rate
      height: Int,
      n_frames: Int, // video frame count / audio chunk count; image: 1
      feature: Array[Float]) // fixed-width embedding from the content

  /** ASCII container magics (stand-ins for \x89PNG / RIFF / ftyp). */
  val Magics: Map[String, String] =
    Map("image" -> "PNG0", "audio" -> "RIFF", "video" -> "FTYP")

  val FeatureDim = 16

  /** Deterministic fake ingest: documents become media assets — the
    * text's UTF-8 bytes prefixed with the kind's magic. Real systems
    * would read blob files here; everything downstream only sees the
    * (binary, metadata) schema, so the swap is local to this method. */
  def ingest(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    val kind = element_at(
      map(lit(0), lit("image"), lit(1), lit("audio"), lit(2), lit("video")),
      (col("doc_id") % 3).cast("int"))
    val magic = element_at(
      map(Magics.toSeq.flatMap { case (k, m) => Seq(lit(k), lit(m)) }: _*), kind)
    docs.select(
        col("doc_id").as("asset_id"),
        kind.as("kind"),
        concat(magic, col("text")).cast("binary").as("payload"),
        col("source").as("meta_source"),
        octet_length(col("text")).cast("long").plus(4).as("payload_bytes"))
      .as[MediaAsset]
  }

  /** Deterministic real-image ingest: every doc becomes a P6 PPM whose
    * dims and pixels are pure functions of doc_id — actually decodable
    * by [[Ppm.decode]], so the decode/resize path below runs a REAL
    * codec for these assets (stub only remains for the compressed-
    * format stand-ins). */
  def ingestPpm(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)].map { case (id, src) =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id / 9) % 9).toInt
      val payload = Ppm.encode(w, h, (x, y) =>
        (((id + x) % 256).toInt << 16) | (((id + y) % 256).toInt << 8) | ((x ^ y) % 256))
      MediaAsset(id, "image", payload, src, payload.length.toLong)
    }
  }

  /** Deterministic COMPRESSED-image ingest: the same closed-form P6
    * rasters as [[ingestPpm]], DEFLATE-wrapped by the real [[Zppm]]
    * codec — the decode path below genuinely decompresses them. */
  def ingestZppm(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)].map { case (id, src) =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id / 9) % 9).toInt
      val payload = Zppm.encode(Ppm.encode(w, h, (x, y) =>
        (((id + x) % 256).toInt << 16) | (((id + y) % 256).toInt << 8) | ((x ^ y) % 256)))
      MediaAsset(id, "image", payload, src, payload.length.toLong)
    }
  }

  /** Deterministic real-VIDEO ingest: every doc becomes a motion-ZPPM
    * ([[Vid]]) of 1 + id%7 independently DEFLATE-compressed frames
    * whose dims follow the ingestPpm formula and whose pixels vary per
    * frame index — each frame genuinely decodable through
    * [[Zppm]]→[[Ppm]]. */
  def ingestVid(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)].map { case (id, src) =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id / 9) % 9).toInt
      val n = 1 + (id % 7).toInt
      val frames = (0 until n).map { f =>
        Zppm.encode(Ppm.encode(w, h, (x, y) =>
          (((id + x + f) % 256).toInt << 16) | (((id + y) % 256).toInt << 8) | ((x ^ y ^ f) % 256)))
      }
      val payload = Vid.encode(frames)
      MediaAsset(id, "video", payload, src, payload.length.toLong)
    }
  }

  /** Deterministic real-audio ingest: every doc becomes an actual PCM
    * WAV whose rate and sample count are pure functions of doc_id —
    * decodable by [[Wav.decode]], same real-codec contract as
    * [[ingestPpm]]. */
  def ingestWav(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)].map { case (id, src) =>
      val rate = 8000 + (id % 8).toInt * 1000
      val n = 64 + (id % 100).toInt
      val samples = Array.tabulate(n)(i => (((id * 31 + i * 17) % 65536) - 32768).toShort)
      val payload = Wav.encode(rate, samples)
      MediaAsset(id, "audio", payload, src, payload.length.toLong)
    }
  }

  /** Decode a PCM WAV into real features: rate/channels as dims, one
    * "frame" per 64-sample chunk, and normalized RMS / mean / zero-
    * crossing-rate + amplitude histogram from the actual samples. */
  private def decodeWav(a: MediaAsset, au: Wav.Audio): MediaFeatures = {
    val s = au.samples
    var sumSq = 0.0; var sum = 0.0; var zc = 0
    val hist = new Array[Float](FeatureDim - 3)
    var i = 0
    while (i < s.length) {
      val v = s(i).toDouble
      sumSq += v * v; sum += v
      if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
      hist(((s(i) >> 8) + 128) % hist.length) += 1f
      i += 1
    }
    val n = math.max(s.length, 1)
    val feature = Array(
      (math.sqrt(sumSq / n) / 32768.0).toFloat,
      (sum / n / 32768.0).toFloat,
      zc.toFloat / n) ++ hist.map(_ / n)
    MediaFeatures(a.asset_id, a.kind, au.sampleRate, au.channels,
      1 + (s.length - 1) / 64, feature)
  }

  /** Decode a P6 payload into real features: true dims, 1 frame, and a
    * feature vector of per-channel means plus a pixel-byte histogram —
    * all computed from actual decoded pixels. */
  private def decodePpm(a: MediaAsset, img: Ppm.Image): MediaFeatures = {
    val px = img.pixels
    val sums = new Array[Long](3)
    val hist = new Array[Float](FeatureDim - 3)
    var i = 0
    while (i < px.length) {
      sums(i % 3) += px(i) & 0xff
      hist((px(i) & 0xff) % hist.length) += 1f
      i += 1
    }
    val nPix = math.max(px.length / 3, 1).toFloat
    val feature =
      sums.map(s => s / nPix / 255f) ++ hist.map(_ / math.max(px.length, 1))
    MediaFeatures(a.asset_id, a.kind, img.width, img.height, 1, feature)
  }

  /** DECODE STUB — deterministic fake of the codec stage for the
    * compressed-format stand-ins (no PNG/RIFF/MP4 libraries in this
    * environment); this derives same-shaped outputs from the bytes so
    * the pipeline is testable end-to-end. The mapPartitions batch
    * shape, schema, and partitioning are the real contract — and P6
    * payloads take the real [[Ppm]] codec path instead. */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val body = a.payload.drop(4) // strip container magic
    val h = java.util.Arrays.hashCode(body)
    // fake dims: stable functions of content size/hash
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val frames = a.kind match {
      case "image" => 1
      case "audio" => 1 + body.length / 64 // "chunks"
      case _       => 1 + body.length / 256 // "frames"
    }
    // fake feature: byte histogram folded to FeatureDim and scaled
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < body.length) {
      hist((body(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    val n = math.max(body.length, 1).toFloat
    MediaFeatures(a.asset_id, a.kind, width, height, frames, hist.map(_ / n))
  }

  /** The decode stage: codec-affine partitioning + per-partition
    * streaming decode. Swap `decodeStub` for a real codec and nothing
    * else changes. */
  /** Codec-affine split: kind alone would collapse to <= 3 partitions
    * (one per media type) — a salt keeps each partition single-kind
    * while spreading every kind over many tasks. */
  private def codecPartitions(assets: Dataset[MediaAsset]) =
    assets.repartition(col("kind"), pmod(col("asset_id"), lit(16)))

  def decode(spark: SparkSession, assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import spark.implicits._
    codecPartitions(assets).mapPartitions(_.map { a =>
      if (Vid.isVid(a.payload))
        Vid.decode(a.payload).flatMap(v => v.frame(0).map(v -> _)) match {
          case Some((v, f0)) => // real container walk + frame-0 inflate
            decodePpm(a, f0).copy(n_frames = v.nFrames)
          case None => decodeStub(a)
        }
      else (if (Zppm.isZppm(a.payload)) Zppm.decode(a.payload) // real DEFLATE+P6
            else Ppm.decode(a.payload)) match {
        case Some(img) => decodePpm(a, img) // real image codec
        case None => Wav.decode(a.payload) match {
          case Some(au) => decodeWav(a, au) // real audio codec
          case None => decodeStub(a)
        }
      }
    })
  }

  /** RESIZE STUB — deterministic fake of the resample stage: a real
    * implementation would rescale pixel data; this derives the target
    * dims and a proportionally truncated payload so downstream schema
    * and size accounting behave exactly as with a real resizer. Runs
    * in the same mapPartitions batch shape as decode. */
  def resizeStub(maxDim: Int)(a: MediaAsset): MediaAsset = {
    val f = decodeStub(a)
    val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
    if (scale >= 1.0) a
    else {
      val body = a.payload.drop(4)
      val keep = math.max(1, (body.length * scale * scale).toInt)
      a.copy(
        payload = a.payload.take(4) ++ body.take(keep),
        payload_bytes = keep.toLong + 4)
    }
  }

  /** The resize stage — codec-affine, streaming per partition, same
    * swap-point contract as [[decode]]: P6 payloads get a REAL
    * nearest-neighbor resample + re-encode; stand-in formats keep the
    * size-accounting stub. */
  def resize(spark: SparkSession, assets: Dataset[MediaAsset], maxDim: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    codecPartitions(assets).mapPartitions(_.map { a =>
      if (Vid.isVid(a.payload)) resizeVid(a, maxDim)
      else resizeStill(a, maxDim)
    })
  }

  /** REAL video resize: every frame decoded, resampled, re-compressed
    * back into the container — never the truncating stub, which would
    * leave a payload that claims VID8 but no longer parses. A corrupt
    * container passes through unchanged (resize is not a validator). */
  private def resizeVid(a: MediaAsset, maxDim: Int): MediaAsset =
    Vid.decode(a.payload) match {
      case None => a
      case Some(v) =>
        val frames = (0 until v.nFrames).map { i =>
          v.frame(i) match {
            case None => return a // one bad frame: leave the asset intact
            case Some(img) =>
              val r = Ppm.resizeNearest(img, maxDim)
              Zppm.encode(Ppm.encode(r.width, r.height, (x, y) => {
                val s = (y * r.width + x) * 3
                ((r.pixels(s) & 0xff) << 16) | ((r.pixels(s + 1) & 0xff) << 8) | (r.pixels(s + 2) & 0xff)
              }))
          }
        }
        val p = Vid.encode(frames)
        a.copy(payload = p, payload_bytes = p.length.toLong)
    }

  private def resizeStill(a: MediaAsset, maxDim: Int): MediaAsset = {
      val zipped = Zppm.isZppm(a.payload)
      (if (zipped) Zppm.decode(a.payload) else Ppm.decode(a.payload)) match {
        case Some(img) =>
          val r = Ppm.resizeNearest(img, maxDim)
          if (r eq img) a
          else {
            val ppm = Ppm.encode(r.width, r.height, (x, y) => {
              val s = (y * r.width + x) * 3
              ((r.pixels(s) & 0xff) << 16) | ((r.pixels(s + 1) & 0xff) << 8) | (r.pixels(s + 2) & 0xff)
            })
            // stay in the asset's own container: compressed in,
            // compressed out
            val p = if (zipped) Zppm.encode(ppm) else ppm
            a.copy(payload = p, payload_bytes = p.length.toLong)
          }
        case None =>
          // audio has no spatial dims: resizing a real WAV is identity
          // (a rate resample would be the real op here). Truncating it
          // through the stub would destroy its decodability.
          if (Wav.isWav(a.payload)) a else resizeStub(maxDim)(a)
      }
  }

  /** Frame sampling — keep every `stride`-th frame index per video;
    * the plumbing for a decoder that can seek. Pure plan, no UDF. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .filter(col("kind") === "video")
      .select(
        col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
