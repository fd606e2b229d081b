package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (the north-star "multimodal columns" surface):
 * image/audio/video payloads ride as opaque `binary` columns next to typed
 * metadata, flowing through select/filter/join/write untouched. The Spark
 * side — schema, batching, partition safety — is real. Decoding:
 * [[decodeWav]] is a REAL codec (RIFF/PCM-16 needs no library — pure
 * byte-buffer parsing); compressed formats (JPEG/MP3/H.264) remain behind
 * the clearly-marked deterministic [[decodeStub]] because their decode
 * libraries are not in this environment.
 *
 * Scale notes: payload bytes never reach the driver; metadata extraction is
 * scan-only column work; [[decodeStub]] uses mapPartitions so a real codec
 * drops in with per-partition (batch) amortization, the same shape a
 * Pandas-UDF/Arrow pipeline has in PySpark.
 */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /**
   * Metadata extraction — pure column expressions over the binary payload:
   * byte length, emptiness, a stable content hash for exact dedup. No decode
   * needed, so this path is fully codegen'd.
   */
  def extractMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)).cast("long"))
      .withColumn("is_empty",
        coalesce(octet_length(col(payloadCol)) === 0, lit(true)))
      .withColumn("content_hash", sha2(col(payloadCol), 256))

  /** One decoded audio frame: REAL features from the WAV/PCM codec. */
  case class AudioFrame(media_id: Long, frame_no: Int, n_samples: Int, rms: Double)

  /**
   * REAL audio decoder: RIFF/WAVE PCM-16 payloads are parsed with plain
   * byte-buffer arithmetic (PCM needs no codec library), split into
   * `framesPerItem` windows, and reduced to per-frame RMS energy — the
   * canonical audio quality/VAD feature. Runs inside mapPartitions, so
   * payload bytes never reach the driver and a row's cost amortizes over
   * its partition batch exactly like the stub's contract. Payloads that
   * are not well-formed PCM-16 WAV emit no frames (total, never throws).
   */
  def decodeWav(df: DataFrame, framesPerItem: Int = 4,
      idCol: String = "media_id", payloadCol: String = "payload"): Dataset[AudioFrame] = {
    implicit val enc = Encoders.product[AudioFrame]
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          parseWavPcm16(Option(payload).getOrElse(Array.emptyByteArray)) match {
            case Some(samples) if samples.length > 0 =>
              val n = samples.length
              (0 until framesPerItem).iterator.map { f =>
                val from = f * n / framesPerItem
                val until = (f + 1) * n / framesPerItem
                var sumSq = 0.0
                var i = from
                while (i < until) {
                  val s = samples(i) / 32768.0; sumSq += s * s; i += 1
                }
                val cnt = until - from
                AudioFrame(id, f, cnt,
                  if (cnt == 0) 0.0 else math.sqrt(sumSq / cnt))
              }
            case _ => Iterator.empty
          }
        }
      }
  }

  /**
   * Minimal RIFF/WAVE chunk walker for PCM-16 data. Returns None for
   * anything not a well-formed PCM-16 WAV (wrong magic, truncated chunks,
   * compressed audio format, other bit depths). Odd-sized chunks carry a
   * pad byte per the RIFF spec.
   */
  private[operators] def parseWavPcm16(bytes: Array[Byte]): Option[Array[Short]] = {
    import java.nio.{ByteBuffer, ByteOrder}
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    if (tag4() != "RIFF") return None
    buf.getInt // declared RIFF size; trust actual buffer bounds instead
    if (tag4() != "WAVE") return None
    var fmtOk = false
    var data: Option[Array[Short]] = None
    while (buf.remaining >= 8 && data.isEmpty) {
      val id = tag4()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining) return None
      id match {
        case "fmt " if size >= 16 =>
          val p = buf.position()
          val audioFormat = buf.getShort
          buf.getShort // channels (samples stay interleaved for RMS)
          buf.getInt; buf.getInt; buf.getShort // rate, byterate, align
          val bits = buf.getShort
          fmtOk = audioFormat == 1 && bits == 16
          buf.position(p + size + (size & 1))
        case "data" if fmtOk =>
          val out = new Array[Short](size / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          data = Some(out)
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    data
  }

  /** One decoded "frame": deterministic fake features in place of pixels. */
  case class DecodedFrame(media_id: Long, frame_no: Int, feature: Double)

  /**
   * STUB decoder. A real implementation would decode image/audio bytes and
   * emit per-frame features; this environment has no codec libraries, so the
   * stub derives a deterministic pseudo-feature from the payload bytes —
   * keeping the interface, batching shape, and schema contract real and
   * testable. Swap the body for an actual codec; the plan shape holds.
   */
  def decodeStub(df: DataFrame, framesPerItem: Int = 4,
      idCol: String = "media_id", payloadCol: String = "payload"): Dataset[DecodedFrame] = {
    implicit val enc = Encoders.product[DecodedFrame]
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          (0 until framesPerItem).iterator.map { f =>
            // ??? real codec goes here; deterministic fake: a byte-sum
            // "feature" per synthetic frame window.
            val slice = if (bytes.isEmpty) Array.emptyByteArray
              else bytes.slice(f * bytes.length / framesPerItem,
                (f + 1) * bytes.length / framesPerItem)
            DecodedFrame(id, f, slice.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble)
          }
        }
      }
  }
}
