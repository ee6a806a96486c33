package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}

/** Opaque media payload with typed metadata — the multimodal column model:
  * image/audio/video travel as `binary` plus a metadata struct; operators
  * never interpret bytes on the driver.
  */
case class MediaMeta(width: Int, height: Int, format: String, duration_ms: Long)
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
    meta: MediaMeta)
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
    brightness: Double, aspect: Double)
case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal-column plumbing for training-data pipelines.
  *
  * The Spark-side contract is real and tested — schema (binary + struct
  * metadata), partition-parallel batch iteration, typed outputs. IMAGE
  * payloads are genuine binary PPM (P6) files and `extractFeatures`
  * REALLY decodes them (pure-JVM header parse + raster scan, no codec
  * dependency): `brightness` is the actual pixel mean, `aspect` comes
  * from the decoded header. Audio/video payloads stay opaque byte chains
  * with a stub decode (no pure-JVM codec exists for them here); a
  * production deployment swaps the stub for a per-partition codec call
  * (JNI/FFI library loaded once per executor) and nothing else changes.
  *
  * Scale posture: `mapPartitions` keeps decode streaming and executor-local;
  * payload bytes never shuffle (features are extracted before any wide
  * operation), and batch size bounds peak native memory.
  */
object Multimodal {

  val decodeBatchSize = 32

  /** Fills `dst` from `from` with a deterministic sha-256 chain seeded by
    * `seed` — every run and every partitioning produces identical bytes.
    */
  private def shaChain(seed: String, dst: Array[Byte], from: Int): Unit = {
    val md = MessageDigest.getInstance("SHA-256")
    var block = md.digest(seed.getBytes("UTF-8"))
    var off = from
    while (off < dst.length) {
      val len = math.min(block.length, dst.length - off)
      System.arraycopy(block, 0, dst, off, len)
      block = md.digest(block)
      off += len
    }
  }

  /** Deterministic media corpus. Images are REAL binary PPM (P6): ASCII
    * header + w×h×3 raw RGB raster (sha-chain pixels), so the decode path
    * exercises an actual self-describing format end to end. Audio/video
    * are opaque `bytesPerItem`-sized chains (decode stays stubbed).
    */
  def generate(spark: SparkSession, n: Long, bytesPerItem: Int = 4096)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val w = 64 + (id % 16).toInt * 32
      val h = 64 + (id % 9).toInt * 32
      val payload =
        if (kind == "image") {
          val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
          val out = new Array[Byte](header.length + w * h * 3)
          System.arraycopy(header, 0, out, 0, header.length)
          shaChain(s"graft:$id", out, header.length)
          out
        } else {
          val out = new Array[Byte](bytesPerItem)
          shaChain(s"graft:$id", out, 0)
          out
        }
      MediaRecord(id, kind, payload,
        MediaMeta(w, h, kind match {
          case "image" => "ppm"; case "audio" => "wav"; case _ => "mp4"
        }, if (kind == "image") 0L else 1000L + (id % 60) * 1000L))
    }
  }

  /** Pure-JVM PPM (P6) decoder: parses `P6 <ws> <width> <ws> <height> <ws>
    * <maxval> <single-ws>` (with `#` comments allowed in the header, per the
    * format) followed by the raw RGB raster, and returns
    * (width, height, mean raster intensity in [0,1]) — or None when the
    * bytes are not a well-formed P6 with maxval ≤ 255 and a full raster.
    */
  private[operators] def decodePpm(b: Array[Byte]): Option[(Int, Int, Double)] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (i < b.length && isWs(b(i))) { i += 1; moved = true }
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
          moved = true
        }
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      var v = 0; var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    i += 1 // exactly one whitespace byte separates maxval from the raster
    val need = w.toLong * h * 3
    if (i + need > b.length) return None
    var sum = 0L
    var j = i
    val end = i + need.toInt
    while (j < end) { sum += (b(j) & 0xff); j += 1 }
    Some((w, h, sum.toDouble / need / maxval))
  }

  /** Per-batch decode: images go through the real PPM decoder (brightness =
    * actual pixel mean, aspect from the decoded header); other kinds fall
    * back to the stub (whole-payload byte mean, metadata aspect) until a
    * codec is wired in.
    */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      decodePpm(r.payload) match {
        case Some((w, h, mean)) if r.kind == "image" =>
          MediaFeatures(r.media_id, r.kind, r.payload.length, mean,
            w.toDouble / h.toDouble)
        case _ =>
          var sum = 0L
          var i = 0
          while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
          MediaFeatures(r.media_id, r.kind, r.payload.length,
            sum.toDouble / r.payload.length / 255.0,
            r.meta.width.toDouble / r.meta.height.toDouble)
      }
    }

  /** Feature extraction: batched, partition-local, streaming. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(batch => decodeBatch(batch.toSeq))
    }
  }

  /** Frame sampling: split the payload into `nFrames` contiguous slices
    * (a real impl seeks keyframes; the batch/slice plumbing is identical).
    * The LAST frame absorbs the division remainder, so concatenating the
    * frames in order always reassembles the payload byte-for-byte —
    * payload lengths are not generally divisible by nFrames (a PPM image
    * is header + w·h·3).
    */
  def frameSample(ds: Dataset[MediaRecord], nFrames: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val step = math.max(r.payload.length / nFrames, 1)
      (0 until nFrames).iterator.map { f =>
        // Both bounds clamp to payload.length: with payloads shorter than
        // nFrames, step clamps to 1 and f*step can run past the end —
        // trailing frames come back empty instead of throwing.
        val from = math.min(f * step, r.payload.length)
        val until = if (f == nFrames - 1) r.payload.length
          else math.min(from + step, r.payload.length)
        MediaFrame(r.media_id, f,
          java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }
}
