package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (the north-star "multimodal columns" surface):
 * image/audio/video payloads ride as opaque `binary` columns next to typed
 * metadata, flowing through select/filter/join/write untouched. The Spark
 * side — schema, batching, partition safety — is real; the codec itself is
 * a clearly-marked deterministic STUB (the decode libraries are not in this
 * environment).
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
