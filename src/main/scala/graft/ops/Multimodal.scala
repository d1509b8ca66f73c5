package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` columns with typed metadata, processed by
  * per-partition batch transforms.
  *
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` produces a deterministic fake feature vector
  * derived from the bytes. Everything around it — the binary schema, the
  * partition-batched execution shape (`mapPartitions`, the Scala analogue
  * of a batched `mapInPandas`), metadata typing, and the join-back by id —
  * is real and tested (MultimodalSpec).
  *
  * Scale notes: payloads stay columnar until the decode stage; the decode
  * is embarrassingly parallel per partition with no shuffle;
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory when the
  * source is `binaryFile`.
  */
object Multimodal {

  /** Typed record entering the decode stage. */
  case class MediaRow(media_id: Long, payload: Array[Byte])
  /** Typed record leaving the decode stage. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, width: Int,
                           height: Int, feature: Array[Double])

  /** Wrap a text column as an opaque binary payload (stand-in for real
    * media bytes from `spark.read.format("binaryFile")`). */
  def asBinary(df: DataFrame, id: String, payloadCol: String): DataFrame =
    df.select(col(id).as("media_id").cast("long"),
      col(payloadCol).cast("binary").as("payload"))

  /** STUB — a real implementation would decode the image/audio here
    * (e.g. javax.imageio / ffmpeg bindings). This deterministic fake
    * derives pseudo-dimensions and a tiny feature vector from the raw
    * bytes so downstream plumbing is fully exercisable and testable. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val n = bytes.length
    val width = 1 + (n % 640)
    val height = 1 + ((n * 7) % 480)
    val feature = Array.tabulate(4) { i =>
      if (n == 0) 0.0 else bytes(i % n).toDouble / 128.0
    }
    (width, height, feature)
  }

  /** Partition-batched decode/feature-extract — the Scala analogue of a
    * batched Pandas UDF: one iterator per partition, constant memory,
    * no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.payload.length.toLong, w, h, f)
      }
    }
  }

  /** End-to-end: DataFrame with (id, payload-able column) → features
    * DataFrame, ready to join back on media_id. */
  def pipeline(df: DataFrame, id: String, payloadCol: String): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    extractFeatures(asBinary(df, id, payloadCol).as[MediaRow]).toDF()
  }
}
