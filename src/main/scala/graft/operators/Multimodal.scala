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
  * metadata), partition-parallel batch iteration, typed outputs — while the
  * decode step itself is STUBBED with a deterministic fake (this environment
  * has no image/audio codecs). A production deployment replaces
  * `decodeStub` with a per-partition codec call (JNI/FFI library loaded once
  * per executor, fed batches of payloads); nothing else changes.
  *
  * Scale posture: `mapPartitions` keeps decode streaming and executor-local;
  * payload bytes never shuffle (features are extracted before any wide
  * operation), and batch size bounds peak native memory.
  */
object Multimodal {

  val decodeBatchSize = 32

  /** Deterministic fake media corpus: payload bytes are a sha-256 chain
    * seeded by media_id, so every run and every partitioning produces
    * identical binaries.
    */
  def generate(spark: SparkSession, n: Long, bytesPerItem: Int = 4096)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val md = MessageDigest.getInstance("SHA-256")
      val payload = new Array[Byte](bytesPerItem)
      var block = md.digest(s"graft:$id".getBytes("UTF-8"))
      var off = 0
      while (off < bytesPerItem) {
        val len = math.min(block.length, bytesPerItem - off)
        System.arraycopy(block, 0, payload, off, len)
        block = md.digest(block)
        off += len
      }
      val w = 64 + (id % 16).toInt * 32
      val h = 64 + (id % 9).toInt * 32
      MediaRecord(id, kind, payload,
        MediaMeta(w, h, kind match {
          case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
        }, if (kind == "image") 0L else 1000L + (id % 60) * 1000L))
    }
  }

  /** STUB decode: a real implementation hands `batch` to a codec library and
    * reads pixels/samples; the fake derives "brightness" from payload bytes
    * so tests can assert exact values.
    */
  private def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(r.media_id, r.kind, r.payload.length,
        sum.toDouble / r.payload.length / 255.0,
        r.meta.width.toDouble / r.meta.height.toDouble)
    }

  /** Feature extraction: batched, partition-local, streaming. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(batch => decodeStub(batch.toSeq))
    }
  }

  /** Frame sampling: split the payload into `nFrames` evenly-sized slices
    * (a real impl seeks keyframes; the batch/slice plumbing is identical).
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
        val until = math.min(from + step, r.payload.length)
        MediaFrame(r.media_id, f,
          java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }
}
