package graft.mm

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL container-header codec for the multimodal seam — the round-11
  * answer to "the decode is a stub": pure-JVM parsers for the three
  * ubiquitous image containers, run inside the same typed
  * `mapPartitions` batch seam as [[Multimodal.decodeFeatures]] (the
  * production shape: per-batch codec amortization, streaming rows, no
  * shuffle). No codec libraries exist in this container, so the
  * PIXEL decode stays out of scope — but the header parse is the part
  * of a metadata-extraction stage that is pure byte arithmetic, and
  * this one is real:
  *
  *   - PNG:  8-byte signature, IHDR chunk (big-endian u32 dims at
  *           offsets 16/20), CRC32 over chunk type+data VERIFIED
  *           against the stored CRC (a corrupted header quarantines,
  *           not mis-reports).
  *   - JPEG: SOI then a marker walk (each segment: 0xFF marker +
  *           big-endian u16 length) to the first SOF0/SOF2-family
  *           frame header; height/width big-endian u16 at +5/+7.
  *   - GIF:  GIF87a/GIF89a magic, LITTLE-endian u16 logical-screen
  *           dims at offsets 6/8 (the one little-endian container —
  *           the parse-don't-assume case).
  *
  * Malformed bytes follow the q_jsonl_ingest `_corrupt_record`
  * discipline: a loud QUARANTINE ROW (container='corrupt', dims=-1,
  * err naming the failure) — never a throw that kills the partition,
  * never a silent drop.
  *
  * The test corpus plants REAL bytes: [[buildPng]]/[[buildJpeg]]/
  * [[buildGif]] emit spec-valid files whose dims derive from doc_id
  * arithmetic, so the DuckDB oracle recomputes the expected output
  * WITHOUT parsing — hash-exact proof the parser reads actual bytes
  * (reference's pipeline has no media stage; this family is the
  * scope extension, SURVEY §2F).
  */
object MediaCodec {

  // ---------------------------------------------------------------- builders

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Long): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le16(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Minimal spec-valid PNG: signature + IHDR (8-bit RGB) + IEND.
    * `corruptCrc` flips the stored IHDR CRC — byte-identical layout,
    * detectably wrong checksum.
    */
  def buildPng(width: Long, height: Long, corruptCrc: Boolean = false): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0)
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ ihdrData
    val crc = new CRC32
    crc.update(typeAndData)
    val crcV = if (corruptCrc) crc.getValue ^ 0xdeadbeefL else crc.getValue
    val iendType = "IEND".getBytes("US-ASCII")
    val iendCrc = new CRC32
    iendCrc.update(iendType)
    sig ++ be32(13) ++ typeAndData ++ be32(crcV) ++
      be32(0) ++ iendType ++ be32(iendCrc.getValue)
  }

  /** Minimal JPEG skeleton: SOI + APP0/JFIF + SOF0 carrying the dims +
    * EOI. No entropy-coded data — a metadata extractor never needs it.
    */
  def buildJpeg(width: Long, height: Long): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(height) ++ be16(width) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val eoi = Array(0xff, 0xd9).map(_.toByte)
    soi ++ app0 ++ sof0 ++ eoi
  }

  /** Minimal GIF89a: magic + logical screen descriptor + trailer. */
  def buildGif(width: Long, height: Long): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      Array[Byte](0, 0, 0, 0x3b)

  // ---------------------------------------------------------------- parser

  /** Parse a container header: Right((container, width, height)) or
    * Left(err). Total — never throws on arbitrary bytes (every read is
    * bounds-checked); the quarantine path is a VALUE.
    */
  def parseHeader(bytes: Array[Byte]): Either[String, (String, Long, Long)] = {
    if (bytes == null || bytes.length < 10) return Left("truncated_header")

    def u8(i: Int): Int = bytes(i) & 0xff
    def beU32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def beU16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    def leU16(i: Int): Long = ((u8(i + 1) << 8) | u8(i)).toLong

    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      // signature(8) + len(4) + "IHDR"(4) + data(13) + crc(4) = 33
      if (bytes.length < 33) return Left("truncated_header")
      if (beU32(8) != 13L) return Left("bad_ihdr_length")
      val chunkType = new String(bytes, 12, 4, "US-ASCII")
      if (chunkType != "IHDR") return Left("missing_ihdr")
      val crc = new CRC32
      crc.update(bytes, 12, 17) // type + 13 data bytes
      if ((crc.getValue & 0xffffffffL) != beU32(29)) return Left("bad_crc")
      return Right(("png", beU32(16), beU32(20)))
    }

    if (bytes.length >= 10 &&
      new String(bytes, 0, 6, "US-ASCII").matches("GIF8[79]a")) {
      return Right(("gif", leU16(6), leU16(8)))
    }

    if (u8(0) == 0xff && u8(1) == 0xd8) {
      // marker walk: each segment is FF <marker> <BE u16 len incl. itself>
      var i = 2
      while (i + 1 < bytes.length) {
        if (u8(i) != 0xff) return Left("bad_marker")
        val marker = u8(i + 1)
        if (marker == 0xd9 || marker == 0xda) return Left("no_sof") // EOI / SOS
        // every other marker carries a big-endian length (incl. itself)
        if (i + 3 >= bytes.length) return Left("truncated_header")
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        val len = beU16(i + 2)
        if (isSof) {
          if (i + 9 > bytes.length) return Left("truncated_header")
          return Right(("jpeg", beU16(i + 7), beU16(i + 5)))
        }
        if (len < 2) return Left("bad_segment_length")
        i += 2 + len.toInt
      }
      return Left("truncated_header")
    }

    Left("unknown_container")
  }

  // ---------------------------------------------------------------- corpus + query

  /** Planted-dims arithmetic — shared by the builder (what goes INTO
    * the bytes) and the DuckDB oracle (what must come OUT of the
    * parse). u16-safe for JPEG/GIF.
    */
  private[mm] def plantedWidth(docId: Long): Long = 1L + math.floorMod(docId * 7L + 3L, 512L)
  private[mm] def plantedHeight(docId: Long): Long = 1L + math.floorMod(docId * 13L + 5L, 512L)

  /** The planted real-bytes asset table: container cycles
    * png/jpeg/gif by doc_id%3; every 17th doc is TRUNCATED to its
    * first 6 bytes (the mid-transfer crawl shape) and every png with
    * doc_id%23==0 carries a flipped IHDR CRC (the bit-rot shape).
    * Built in the typed seam — each payload is REAL container bytes
    * the parser must actually read.
    */
  def realAssets(documents: DataFrame): Dataset[Multimodal.MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].map { id =>
      val (w, h) = (plantedWidth(id), plantedHeight(id))
      val full = math.floorMod(id, 3L) match {
        case 0L => Multimodal.MediaAsset(id, "png",
          buildPng(w, h, corruptCrc = math.floorMod(id, 23L) == 0L))
        case 1L => Multimodal.MediaAsset(id, "jpeg", buildJpeg(w, h))
        case _ => Multimodal.MediaAsset(id, "gif", buildGif(w, h))
      }
      if (math.floorMod(id, 17L) == 0L) full.copy(payload = full.payload.take(6)) else full
    }
  }

  private final case class DecodedHeader(
      doc_id: Long, container: String, width: Long, height: Long, err: String)

  /** q138: real header decode over planted real-format bytes — the
    * [[Multimodal.decodeFeatures]] batch seam with [[parseHeader]] as
    * the codec call. Output per asset: (doc_id, container, width,
    * height, err) with quarantine rows (container='corrupt', dims=-1)
    * for malformed payloads. The oracle recomputes every row from the
    * planting arithmetic alone ⇒ hash-exact evidence the parser reads
    * the actual bytes.
    */
  def mediaDecode(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    realAssets(documents).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          parseHeader(a.payload) match {
            case Right((container, w, h)) => DecodedHeader(a.doc_id, container, w, h, "")
            case Left(err) => DecodedHeader(a.doc_id, "corrupt", -1L, -1L, err)
          }
        }
      }
    }.toDF()
  }

  /** DuckDB twin of [[mediaDecode]]: pure planting arithmetic — no
    * byte parsing, which is the point of the cross-check.
    */
  def sqlMediaDecode: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 17 = 0 THEN 'corrupt'
      |       WHEN doc_id % 3 = 0 AND doc_id % 23 = 0 THEN 'corrupt'
      |       ELSE ['png', 'jpeg', 'gif'][(doc_id % 3) + 1] END AS container,
      |  CAST(CASE WHEN doc_id % 17 = 0 OR (doc_id % 3 = 0 AND doc_id % 23 = 0) THEN -1
      |       ELSE 1 + (doc_id * 7 + 3) % 512 END AS BIGINT) AS width,
      |  CAST(CASE WHEN doc_id % 17 = 0 OR (doc_id % 3 = 0 AND doc_id % 23 = 0) THEN -1
      |       ELSE 1 + (doc_id * 13 + 5) % 512 END AS BIGINT) AS height,
      |  CASE WHEN doc_id % 17 = 0 THEN 'truncated_header'
      |       WHEN doc_id % 3 = 0 AND doc_id % 23 = 0 THEN 'bad_crc'
      |       ELSE '' END AS err
      |FROM documents""".stripMargin
}
