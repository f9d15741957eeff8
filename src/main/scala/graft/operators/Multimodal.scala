package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed by a partition-wise decoder.
  *
  * The image path is REAL: payloads are structurally valid PNG / JPEG
  * containers (genuine signatures, big-endian IHDR / SOF0 dimension fields,
  * CRC-32-checked chunks, zlib-deflated PNG data, 64 KiB-segmented JPEG
  * comment blocks), and [[ImageHeaders.decode]] parses them the way any
  * ingest pipeline must — magic-byte dispatch, chunk walk, marker walk,
  * CRC verification, inflate — in pure JVM (public container formats; no
  * codec library needed for header metadata). What stays stubbed, honestly:
  * PIXEL decoding (the payload carried inside the container is document
  * text, not a renderable bitmap) and the video frame counter in
  * [[frameSamples]] — the container has no media codecs.
  *
  * Scale: encode and decode are narrow maps — no shuffle; payload bytes
  * never cross the network. Partition sizing
  * (`spark.sql.files.maxPartitionBytes`) is the only knob that matters at
  * 100 TB of media.
  */
object Multimodal {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, width: Long, height: Long,
      payload_bytes: Long, n_frames: Long, checksum_prefix: String)

  /** Pure-JVM builders and parsers for the PNG and JPEG container headers
    * (public formats: PNG per RFC 2083 / ISO 15948, JPEG per ITU T.81).
    * Builders produce structurally valid files; [[decode]] trusts NOTHING
    * it didn't parse — it dispatches on the signature, walks the container,
    * verifies PNG chunk CRCs, and recovers both the dimensions and the
    * embedded payload bytes, so a corrupted container comes back `None`
    * instead of garbage fields. */
  object ImageHeaders {
    val PngSignature: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def readBe32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    private def readBe16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

    private def crc32(parts: Array[Byte]*): Int = {
      val c = new java.util.zip.CRC32
      parts.foreach(c.update)
      c.getValue.toInt
    }

    private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val t = ctype.getBytes("US-ASCII")
      be32(data.length) ++ t ++ data ++ be32(crc32(t, data))
    }

    /** Minimal valid PNG: signature, IHDR (true big-endian dims, 8-bit
      * RGBA), one IDAT holding the zlib-DEFLATED payload, IEND. Every chunk
      * carries its real CRC-32. */
    def png(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0)
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(payload)
      deflater.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      PngSignature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Minimal valid JPEG: SOI, JFIF APP0, SOF0 (baseline; true big-endian
      * height then width, 3 components), the payload carried as ≤ 64 KiB
      * COM segments (the JPEG metadata channel — segment lengths are
      * 16-bit, so large payloads split), EOI. */
    def jpeg(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def seg(marker: Int, data: Array[Byte]): Unit = {
        out.write(0xFF); out.write(marker)
        out.write(((data.length + 2) >> 8) & 0xFF); out.write((data.length + 2) & 0xFF)
        out.write(data)
      }
      out.write(0xFF); out.write(0xD8) // SOI
      seg(0xE0, "JFIF\u0000".getBytes("US-ASCII") ++ Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
      // SOF0: precision 8, height, width, 3 components (YCbCr, no subsampling)
      seg(0xC0, Array[Byte](8,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
        ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
        3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
      payload.grouped(65533).foreach(p => seg(0xFE, p)) // COM segments
      out.write(0xFF); out.write(0xD9) // EOI
      out.toByteArray
    }

    case class Decoded(format: String, width: Int, height: Int, payload: Array[Byte])

    /** Marker values that are a start-of-frame carrying dimensions (SOF0-15
      * minus the non-frame DHT/JPG/DAC slots). */
    private def isSof(m: Int): Boolean =
      m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

    private def decodePng(b: Array[Byte]): Option[Decoded] = {
      if (b.length < 33 || !b.take(8).sameElements(PngSignature)) return None
      var w = -1; var h = -1
      val data = new java.io.ByteArrayOutputStream()
      var i = 8
      while (i + 12 <= b.length) {
        val len = readBe32(b, i)
        if (len < 0 || i + 12 + len > b.length) return None
        val ctype = new String(b, i + 4, 4, "US-ASCII")
        val body = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        if (readBe32(b, i + 8 + len) != crc32(ctype.getBytes("US-ASCII"), body))
          return None // corrupted chunk
        ctype match {
          case "IHDR" if len >= 8 => w = readBe32(body, 0); h = readBe32(body, 4)
          case "IDAT" => data.write(body)
          case "IEND" =>
            if (w < 0) return None
            val inflater = new java.util.zip.Inflater()
            inflater.setInput(data.toByteArray)
            val out = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            try {
              while (!inflater.finished()) {
                val n = inflater.inflate(tmp)
                if (n == 0 && inflater.needsInput()) return None // truncated stream
                out.write(tmp, 0, n)
              }
            } catch { case _: java.util.zip.DataFormatException => return None }
            finally inflater.end()
            return Some(Decoded("png", w, h, out.toByteArray))
          case _ => // ancillary chunk: skip
        }
        i += 12 + len
      }
      None // no IEND
    }

    private def decodeJpeg(b: Array[Byte]): Option[Decoded] = {
      if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
      var w = -1; var h = -1
      val data = new java.io.ByteArrayOutputStream()
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xFF) != 0xFF) return None // lost marker sync
        val marker = b(i + 1) & 0xFF
        if (marker == 0xD9) // EOI
          return if (w >= 0) Some(Decoded("jpeg", w, h, data.toByteArray)) else None
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2 // standalone
        else {
          if (i + 4 > b.length) return None
          val len = readBe16(b, i + 2)
          if (len < 2 || i + 2 + len > b.length) return None
          if (isSof(marker)) {
            if (len < 7) return None
            h = readBe16(b, i + 5); w = readBe16(b, i + 7)
          } else if (marker == 0xFE) // COM: the payload channel
            data.write(b, i + 4, len - 2)
          else if (marker == 0xDA) // SOS: entropy data follows, not handled
            return if (w >= 0) Some(Decoded("jpeg", w, h, data.toByteArray)) else None
          i += 2 + len
        }
      }
      None // no EOI
    }

    /** Magic-byte dispatch → full container parse. `None` for anything that
      * is not a well-formed PNG/JPEG (bad signature, truncation, CRC
      * mismatch, missing IHDR/SOF). */
    def decode(b: Array[Byte]): Option[Decoded] =
      if (b.length >= 8 && b.take(8).sameElements(PngSignature)) decodePng(b)
      else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) decodeJpeg(b)
      else None
  }

  /** Partition-wise media decoder: Iterator-to-Iterator, one digest
    * instance per partition (the same shape a native-codec decoder needs
    * for its context). Dimensions and payload come from PARSING the
    * container ([[ImageHeaders.decode]]); a malformed payload degrades to
    * an explicit `unknown` row rather than failing the pipeline (at 100 TB
    * some fraction of scraped media is always corrupt). */
  object MediaDecoder {
    def decode(rows: Iterator[Payload]): Iterator[MediaFeatures] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString
      rows.map { p =>
        ImageHeaders.decode(p.payload) match {
          case Some(d) =>
            md.reset()
            val n = d.payload.length.toLong
            MediaFeatures(p.doc_id, d.format, d.width.toLong, d.height.toLong,
              n, 1 + n % 16, hex(md.digest(d.payload)).substring(0, 8))
          case None =>
            md.reset()
            MediaFeatures(p.doc_id, "unknown", 0L, 0L, p.payload.length.toLong,
              0L, hex(md.digest(p.payload)).substring(0, 8))
        }
      }
    }
  }

  /** Binary-column pipeline end-to-end: wrap each document's text bytes in
    * a REAL image container (even doc_ids → PNG, odd → JPEG, so both
    * parsers run), then recover format, dimensions, payload size and
    * checksum by PARSING the container in a partition-wise decoder. The
    * oracle recomputes the expected values from the text — equality proves
    * the encode → binary header → decode round trip is byte-exact (the
    * dimension fields really traverse big-endian container headers, the
    * payload really survives deflate/inflate and COM segmentation). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[Payload] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Payload]
      .mapPartitions(_.map { p =>
        val n = p.payload.length
        val w = 64 + n % 512
        val h = 64 + (n / 7) % 512
        val container =
          if (p.doc_id % 2 == 0) ImageHeaders.png(p.payload, w, h)
          else ImageHeaders.jpeg(p.payload, w, h)
        Payload(p.doc_id, container)
      })
    payloads.mapPartitions(MediaDecoder.decode).toDF()
  }

  /** The oracle recomputes every field from the document text: dims from
    * the same arithmetic the encoder wrote INTO the container (so a decode
    * that misreads endianness/offsets hash-mismatches), checksum/size from
    * the text bytes the decoder must recover out of the container. */
  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 512 AS width,
      |  64 + (CAST(octet_length(encode(text)) AS BIGINT) // 7) % 512 AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
      |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 16 AS n_frames,
      |  substr(md5(text), 1, 8) AS checksum_prefix
      |FROM documents""".stripMargin

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_offset: Long, frame_hash: String)

  /** Frame sampling for video-style payloads: each payload expands to its
    * deterministic frame count (STUB: derived from byte length — the
    * container has no video codecs), one row per sampled frame with a byte
    * offset and a per-frame checksum. The shape is the real thing — an
    * Iterator-to-Iterator flatMap over binary payloads, rows exploding
    * within the partition (no shuffle, no driver involvement), exactly how
    * a real keyframe sampler runs at 100 TB. */
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
}
