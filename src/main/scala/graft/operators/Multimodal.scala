package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed by a partition-wise "decoder".
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[StubDecoder.decode]]) — but the
  * Spark-side plumbing is real: a typed Dataset of (id, payload bytes), a
  * `mapPartitions` decoder invoked once per batch of rows (the Scala twin of
  * a Pandas-UDF-over-mapInPandas pipeline), and a typed feature schema out.
  * Swapping [[StubDecoder]] for a JNI/ONNX decoder changes no plan shape.
  *
  * Scale: decode is a narrow map — no shuffle; payload bytes never cross the
  * network. Partition sizing (`spark.sql.files.maxPartitionBytes`) is the
  * only knob that matters at 100 TB of media.
  */
object Multimodal {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Long, fake_width: Long,
      fake_height: Long, n_frames: Long, checksum_prefix: String)

  /** STUB decoder: deterministic pseudo-features of the raw bytes. A real
    * deployment replaces the body with an actual codec; the signature
    * (Iterator-to-Iterator, batch-friendly, no per-row setup) is the part
    * that matters for Spark. */
  object StubDecoder {
    def decode(rows: Iterator[Payload]): Iterator[MediaFeatures] = {
      // One digest instance per partition, not per row (same pattern a real
      // decoder needs for its native context).
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { p =>
        val n = p.payload.length.toLong
        md.reset()
        val hex = md.digest(p.payload).map("%02x".format(_)).mkString
        MediaFeatures(p.doc_id, n, 64 + n % 512, 64 + (n / 7) % 512, 1 + n % 16, hex.substring(0, 8))
      }
    }
  }

  /** Documents' text bytes standing in for a media payload column: the
    * binary-column pipeline end-to-end (encode → mapPartitions decode →
    * typed features). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[Payload] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Payload]
    payloads.mapPartitions(StubDecoder.decode).toDF()
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_offset: Long, frame_hash: String)

  /** Frame sampling for video-style payloads: each payload expands to its
    * deterministic frame count (STUB: derived from byte length), one row
    * per sampled frame with a byte offset and a per-frame checksum. The
    * shape is the real thing — an Iterator-to-Iterator flatMap over binary
    * payloads, rows exploding within the partition (no shuffle, no driver
    * involvement), exactly how a real keyframe sampler runs at 100 TB. */
  def frameSamples(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[Payload] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Payload]
    payloads.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
      rows.flatMap { p =>
        val n = p.payload.length.toLong
        val frames = 1 + n % 16
        val step = n / frames
        md.reset()
        val payloadHash = hex(md.digest(p.payload))
        (0L until frames).iterator.map { i =>
          md.reset()
          val fh = hex(md.digest(s"$payloadHash:$i".getBytes("UTF-8")))
          FrameRow(p.doc_id, i, i * step, fh)
        }
      }
    }.toDF()
  }

  val frameSamplesSql: String =
    """WITH p AS (
      |  SELECT doc_id, md5(text) AS payload_hash,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents)
      |SELECT doc_id, i AS frame_idx,
      |  i * (n // (1 + n % 16)) AS frame_offset,
      |  md5(payload_hash || ':' || CAST(i AS VARCHAR)) AS frame_hash
      |FROM p, LATERAL (SELECT unnest(generate_series(0, 1 + n % 16 - 1)) AS i) g""".stripMargin

  /** The oracle reproduces the stub's arithmetic in SQL (md5 of the UTF-8
    * text bytes == md5 of the string in DuckDB). */
  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 512 AS fake_width,
      |  64 + (CAST(octet_length(encode(text)) AS BIGINT) // 7) % 512 AS fake_height,
      |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 16 AS n_frames,
      |  substr(md5(text), 1, 8) AS checksum_prefix
      |FROM documents""".stripMargin
}
