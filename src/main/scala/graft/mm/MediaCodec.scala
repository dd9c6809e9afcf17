package graft.mm

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.Ckpt.CkptOps

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

  // ------------------------------------------------------------ pixel codec

  /** Spec-valid PNG WITH PIXEL DATA: 8-bit RGB rows, one IDAT chunk
    * (zlib-deflated), each row carrying the PNG filter `filterOf(y)`
    * (0=None 1=Sub 2=Up 3=Average 4=Paeth) — exercising every filter
    * type the decoder must reverse, not just the one the encoder
    * likes.
    */
  def buildPngPixels(
      width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int),
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(width >= 1 && height >= 1)
    val stride = width * 3
    val raw = Array.ofDim[Byte](height * stride) // unfiltered RGB
    for (y <- 0 until height; x <- 0 until width) {
      val (r, g, b) = pixel(x, y)
      val o = y * stride + x * 3
      raw(o) = r.toByte; raw(o + 1) = g.toByte; raw(o + 2) = b.toByte
    }
    val filtered = new java.io.ByteArrayOutputStream()
    for (y <- 0 until height) {
      val f = filterOf(y) % 5
      filtered.write(f)
      var i = 0
      while (i < stride) {
        val cur = raw(y * stride + i) & 0xff
        val left = if (i >= 3) raw(y * stride + i - 3) & 0xff else 0
        val up = if (y >= 1) raw((y - 1) * stride + i) & 0xff else 0
        val upLeft = if (y >= 1 && i >= 3) raw((y - 1) * stride + i - 3) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => (cur - left) & 0xff
          case 2 => (cur - up) & 0xff
          case 3 => (cur - (left + up) / 2) & 0xff
          case _ => (cur - paeth(left, up, upLeft)) & 0xff
        }
        filtered.write(enc)
        i += 1
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idatData = out.toByteArray
    val idatType = "IDAT".getBytes("US-ASCII")
    val idatCrc = new CRC32
    idatCrc.update(idatType); idatCrc.update(idatData)
    val header = buildPng(width.toLong, height.toLong)
    // splice IDAT before IEND: header = sig(8) + IHDR(25) + IEND(12)
    val beforeIend = header.length - 12
    header.take(beforeIend) ++
      be32(idatData.length.toLong) ++ idatType ++ idatData ++ be32(idatCrc.getValue) ++
      header.drop(beforeIend)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG pixel decode: IHDR parse (via [[parseHeader]]'s
    * validations), IDAT concat + zlib inflate, per-row UNFILTER of
    * all five PNG filter types, emitting raw 8-bit RGB. Total — every
    * malformation is a Left, never a throw: wrong color layout,
    * truncated/corrupt IDAT streams, bad filter bytes, short pixel
    * data.
    */
  def decodePixels(bytes: Array[Byte]): Either[String, (Int, Int, Array[Byte])] =
    parseHeader(bytes) match {
      case Left(e) => Left(e)
      case Right(("png", w, h)) =>
        if (bytes(24) != 8 || bytes(25) != 2) Left("unsupported_color_layout")
        else if (w < 1 || h < 1 || w > (1 << 20) || h > (1 << 20)) Left("bad_dimensions")
        else decodeIdat(bytes, w.toInt, h.toInt)
      case Right(_) => Left("not_a_png")
    }

  private def decodeIdat(bytes: Array[Byte], w: Int, h: Int): Either[String, (Int, Int, Array[Byte])] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def beU32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    // walk chunks, concatenating IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var i = 33 // after signature + IHDR
    while (i + 8 <= bytes.length) {
      val len = beU32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > bytes.length) return Left("truncated_chunk")
      val ctype = new String(bytes, i + 4, 4, "US-ASCII")
      if (ctype == "IDAT") idat.write(bytes, i + 8, len.toInt)
      if (ctype == "IEND") i = bytes.length
      else i += 12 + len.toInt
    }
    val compressed = idat.toByteArray
    if (compressed.isEmpty) return Left("missing_idat")
    val stride = w * 3
    val expected = h * (stride + 1)
    val inflated = new Array[Byte](expected)
    // inf.end() must run on EVERY exit (including the early Left
    // returns): Inflater holds native memory until finalization, and a
    // long-lived executor decoding many corrupt payloads would
    // otherwise accumulate off-heap usage
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(compressed)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(inflated, off, expected - off)
        if (n == 0 && inf.needsInput()) return Left("truncated_idat")
        off += n
      }
      if (off < expected) return Left("truncated_idat")
    } catch {
      case _: java.util.zip.DataFormatException => return Left("corrupt_idat")
    } finally inf.end()
    // unfilter
    val raw = Array.ofDim[Byte](h * stride)
    for (y <- 0 until h) {
      val f = inflated(y * (stride + 1)) & 0xff
      if (f > 4) return Left("bad_filter_type")
      var i2 = 0
      while (i2 < stride) {
        val enc = inflated(y * (stride + 1) + 1 + i2) & 0xff
        val left = if (i2 >= 3) raw(y * stride + i2 - 3) & 0xff else 0
        val up = if (y >= 1) raw((y - 1) * stride + i2) & 0xff else 0
        val upLeft = if (y >= 1 && i2 >= 3) raw((y - 1) * stride + i2 - 3) & 0xff else 0
        val cur = f match {
          case 0 => enc
          case 1 => (enc + left) & 0xff
          case 2 => (enc + up) & 0xff
          case 3 => (enc + (left + up) / 2) & 0xff
          case _ => (enc + paeth(left, up, upLeft)) & 0xff
        }
        raw(y * stride + i2) = cur.toByte
        i2 += 1
      }
    }
    Right((w, h, raw))
  }

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

  private[mm] final case class DecodedHeader(
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

  /** Planted-pixel arithmetic — shared by the builder (what goes INTO
    * the IDAT) and the oracle (what the REAL decode must recover).
    */
  private[mm] def pixelDims(docId: Long): (Int, Int) =
    ((8L + math.floorMod(docId, 9L)).toInt, (8L + math.floorMod(docId, 7L)).toInt)

  private[mm] def pixelAt(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
    math.floorMod(x * 7L + y * 13L + docId, 256L).toInt,
    math.floorMod(x * 3L + y * 5L + 2L * docId, 256L).toInt,
    math.floorMod(x + y + 3L * docId, 256L).toInt)

  private[mm] final case class DecodedPixels(
      doc_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, err: String)

  /** q142: REAL pixel decode — the #44 feature-extractor stub replaced
    * by an actual image codec for the one container a pure JVM can
    * fully decode: each doc becomes an 8-bit RGB PNG whose pixels
    * derive from doc_id arithmetic, rows cycling through ALL FIVE PNG
    * filter types; the decoder inflates the IDAT and reverses the
    * filters, and the emitted per-channel pixel SUMS are integers the
    * DuckDB oracle recomputes from the planting arithmetic alone —
    * hash-exact proof the zlib+unfilter path recovered every byte (a
    * wrong Paeth branch or off-by-one stride fails the hash). Every
    * 19th doc ships WITHOUT its IDAT (the mid-transfer shape) and
    * must quarantine as missing_idat, not throw.
    */
  def mediaPixels(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { id =>
          val (w, h) = pixelDims(id)
          val payload =
            if (math.floorMod(id, 19L) == 0L) buildPng(w.toLong, h.toLong) // no IDAT
            else buildPngPixels(w, h, (x, y) => pixelAt(id, x, y), y => (id + y).toInt)
          decodePixels(payload) match {
            case Right((dw, dh, raw)) =>
              var (sr, sg, sb) = (0L, 0L, 0L)
              var i = 0
              while (i < raw.length) {
                sr += raw(i) & 0xff; sg += raw(i + 1) & 0xff; sb += raw(i + 2) & 0xff
                i += 3
              }
              DecodedPixels(id, dw.toLong, dh.toLong, sr, sg, sb, "")
            case Left(err) => DecodedPixels(id, -1L, -1L, -1L, -1L, -1L, err)
          }
        }
      }
    }.toDF()
  }

  /** DuckDB twin of [[mediaPixels]]: the planting arithmetic summed
    * over the pixel grid — zero byte decoding, which is the point.
    */
  def sqlMediaPixels: String =
    """WITH mpg AS (
      |  SELECT doc_id,
      |    8 + doc_id % 9 AS w,
      |    8 + doc_id % 7 AS h
      |  FROM documents
      |), mpx AS (
      |  SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM mpg
      |), mpc AS (
      |  SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM mpx
      |), mps AS (
      |  SELECT doc_id, w, h,
      |    sum((x * 7 + y * 13 + doc_id) % 256) AS sr,
      |    sum((x * 3 + y * 5 + 2 * doc_id) % 256) AS sg,
      |    sum((x + y + 3 * doc_id) % 256) AS sb
      |  FROM mpc GROUP BY 1, 2, 3
      |)
      |SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE w END AS BIGINT) AS width,
      |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE h END AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE sr END AS BIGINT) AS sum_r,
      |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE sg END AS BIGINT) AS sum_g,
      |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE sb END AS BIGINT) AS sum_b,
      |  CASE WHEN doc_id % 19 = 0 THEN 'missing_idat' ELSE '' END AS err
      |FROM mps""".stripMargin

  // ------------------------------------------------------------- WAV codec

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Spec-valid RIFF/WAVE file, 16-bit PCM, interleaved LE samples.
    * Every file carries a 7-byte (ODD-length) `JUNK` chunk BEFORE
    * `fmt ` so a parser that assumes fmt at offset 12 — or forgets
    * RIFF's word-alignment pad byte after odd-sized chunks — reads
    * garbage and fails the hash gate. `fmtCode` other than 1 plants a
    * non-PCM encoding; `includeData=false` plants the mid-transfer
    * shape (header landed, samples didn't).
    */
  def buildWav(
      channels: Int, sampleRateHz: Long, nFrames: Int,
      sample: (Int, Int) => Int,
      fmtCode: Int = 1, includeData: Boolean = true): Array[Byte] = {
    require(channels >= 1 && sampleRateHz >= 1 && nFrames >= 0)
    val blockAlign = channels * 2L
    val junk = "JUNK".getBytes("US-ASCII") ++ le32(7) ++
      Array.fill(7)(0xaa.toByte) ++ Array[Byte](0) // odd size ⇒ pad byte
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(fmtCode.toLong) ++ le16(channels.toLong) ++ le32(sampleRateHz) ++
      le32(sampleRateHz * blockAlign) ++ le16(blockAlign) ++ le16(16L)
    val data =
      if (!includeData) Array.empty[Byte]
      else {
        val payload = Array.ofDim[Byte](nFrames * channels * 2)
        var f = 0
        while (f < nFrames) {
          var c = 0
          while (c < channels) {
            val s = sample(f, c)
            val o = (f * channels + c) * 2
            payload(o) = (s & 0xff).toByte
            payload(o + 1) = ((s >> 8) & 0xff).toByte
            c += 1
          }
          f += 1
        }
        "data".getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload
      }
    val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  final case class WavInfo(
      channels: Long, sampleRateHz: Long, nFrames: Long,
      durationMs: Long, sumAbs: Long, peakAbs: Long)

  /** REAL RIFF/WAVE decode: magic + form-type check, word-aligned
    * chunk walk (RIFF pads odd-sized chunks — the planted JUNK chunk
    * exists to catch a parser that doesn't), `fmt ` field parse
    * (LITTLE-endian throughout — the opposite convention from
    * PNG/JPEG), PCM-16 gate, then a full s16 sample decode with
    * integer sum-of-abs / peak-abs. Total: every malformation is a
    * Left, never a throw.
    */
  def parseWav(bytes: Array[Byte]): Either[String, WavInfo] =
    wavDataWindow(bytes).map { case (channels, rate, dataAt, dataLen) =>
      def u8(i: Int): Int = bytes(i) & 0xff
      def leS16(i: Int): Int = ((u8(i) | (u8(i + 1) << 8)) << 16) >> 16
      val nFrames = dataLen / (channels * 2)
      var (sumAbs, peakAbs) = (0L, 0L)
      var o = dataAt
      val end = dataAt + dataLen.toInt
      while (o < end) {
        val a = math.abs(leS16(o).toLong)
        sumAbs += a
        if (a > peakAbs) peakAbs = a
        o += 2
      }
      WavInfo(channels.toLong, rate, nFrames,
        nFrames * 1000L / rate, sumAbs, peakAbs)
    }

  /** The shared RIFF walk + fmt parse behind [[parseWav]] and
    * [[wavSamples]]: Right((channels, rate, dataAt, dataLen)) after
    * every structural gate, Left with the SAME error precedence the
    * original monolithic parser established (the q143 oracle encodes
    * it — truncation before fmt code before missing data).
    */
  private def wavDataWindow(
      bytes: Array[Byte]): Either[String, (Int, Long, Int, Long)] = {
    if (bytes == null || bytes.length < 12) return Left("truncated_header")
    def u8(i: Int): Int = bytes(i) & 0xff
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leU32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    if (new String(bytes, 0, 4, "US-ASCII") != "RIFF") return Left("not_riff")
    if (new String(bytes, 8, 4, "US-ASCII") != "WAVE") return Left("not_wave")

    var fmtAt = -1
    var dataAt = -1
    var dataLen = 0L
    var i = 12
    while (i + 8 <= bytes.length) {
      val ctype = new String(bytes, i, 4, "US-ASCII") // chunk id, then LE u32 size
      val size = leU32(i + 4)
      if (i + 8 + size > bytes.length) return Left("truncated_chunk")
      if (ctype == "fmt ") fmtAt = i + 8
      if (ctype == "data") { dataAt = i + 8; dataLen = size }
      i += 8 + size.toInt + (size.toInt & 1) // RIFF word alignment
    }
    if (fmtAt < 0) return Left("missing_fmt")
    if (fmtAt + 16 > bytes.length) return Left("truncated_chunk")
    val audioFormat = leU16(fmtAt)
    val channels = leU16(fmtAt + 2)
    val rate = leU32(fmtAt + 4)
    val bits = leU16(fmtAt + 14)
    if (audioFormat != 1 || bits != 16) return Left("unsupported_encoding")
    if (channels < 1 || rate < 1) return Left("bad_fmt")
    if (dataAt < 0) return Left("missing_data")
    if (dataLen % (channels * 2) != 0) return Left("ragged_data")
    Right((channels, rate, dataAt, dataLen))
  }

  /** The full interleaved s16 sample stream — the decode surface the
    * audio FINGERPRINT family ([[AudioFp]]) hashes from, sharing every
    * structural gate with [[parseWav]].
    */
  private[mm] def wavSamples(bytes: Array[Byte]): Either[String, Array[Int]] =
    wavDataWindow(bytes).map { case (_, _, dataAt, dataLen) =>
      def u8(i: Int): Int = bytes(i) & 0xff
      def leS16(i: Int): Int = ((u8(i) | (u8(i + 1) << 8)) << 16) >> 16
      val out = Array.ofDim[Int](dataLen.toInt / 2)
      var k = 0
      var o = dataAt
      val end = dataAt + dataLen.toInt
      while (o < end) {
        out(k) = leS16(o)
        k += 1
        o += 2
      }
      out
    }

  /** Planted-audio arithmetic — shared by the builder and the oracle.
    * Samples span the full signed-16-bit range so a sign-extension or
    * endianness bug in the decoder shifts the sums.
    */
  private[mm] def wavChannels(docId: Long): Int = (1L + math.floorMod(docId, 2L)).toInt
  private[mm] def wavRate(docId: Long): Long = 8000L + 1000L * math.floorMod(docId, 4L)
  private[mm] def wavFrames(docId: Long): Int = (40L + math.floorMod(docId, 61L)).toInt
  private[mm] def wavSample(docId: Long, frame: Int, ch: Int): Int =
    (math.floorMod(docId * 31L + frame * 17L + ch * 1009L, 65536L) - 32768L).toInt

  private[mm] final case class DecodedWav(
      doc_id: Long, channels: Long, sample_rate_hz: Long, n_frames: Long,
      duration_ms: Long, sum_abs: Long, peak_abs: Long, err: String)

  /** q143: REAL audio decode — the audio modality joins #138/#142's
    * real-bytes discipline: each doc becomes a spec-valid RIFF/WAVE
    * PCM-16 file whose channel count, sample rate, frame count, and
    * every SAMPLE VALUE derive from doc_id arithmetic; the decoder
    * walks the word-aligned chunk stream (past a planted odd-sized
    * JUNK chunk), parses the little-endian fmt fields, and decodes
    * the full interleaved s16 stream into integer sum-abs / peak-abs
    * the DuckDB oracle recomputes from the planting arithmetic alone
    * — a misread endianness, a missed pad byte, a sign-extension slip,
    * or a skipped channel fails the hash. Corruption plants: every
    * 13th doc truncated to 9 bytes (truncated_header), every 29th a
    * non-PCM fmt code (unsupported_encoding), every 31st ships
    * headers but no data chunk (missing_data) — all quarantine rows,
    * never throws. Runs in the same typed mapPartitions batch seam as
    * the rest of the family (batch-amortized codec, no shuffle).
    */
  def mediaWav(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { id =>
          val full = buildWav(
            wavChannels(id), wavRate(id), wavFrames(id),
            (f, c) => wavSample(id, f, c),
            fmtCode = if (math.floorMod(id, 29L) == 0L) 3 else 1,
            includeData = math.floorMod(id, 31L) != 0L)
          val payload = if (math.floorMod(id, 13L) == 0L) full.take(9) else full
          parseWav(payload) match {
            case Right(w) => DecodedWav(id, w.channels, w.sampleRateHz,
              w.nFrames, w.durationMs, w.sumAbs, w.peakAbs, "")
            case Left(err) => DecodedWav(id, -1L, -1L, -1L, -1L, -1L, -1L, err)
          }
        }
      }
    }.toDF()
  }

  /** DuckDB twin of [[mediaWav]]: the planting arithmetic summed over
    * the (frame, channel) grid — zero byte decoding, which is the
    * point. Corruption precedence mirrors the builder: truncation is
    * checked before the fmt code, the fmt code before the missing
    * data chunk.
    */
  def sqlMediaWav: String =
    """WITH wg AS (
      |  SELECT doc_id,
      |    1 + doc_id % 2 AS ch,
      |    8000 + 1000 * (doc_id % 4) AS rate,
      |    40 + doc_id % 61 AS nf
      |  FROM documents
      |), wf AS (
      |  SELECT doc_id, ch, rate, nf, unnest(range(0, nf)) AS f FROM wg
      |), wc AS (
      |  SELECT doc_id, ch, rate, nf, f, unnest(range(0, ch)) AS c FROM wf
      |), ws AS (
      |  SELECT doc_id, ch, rate, nf,
      |    sum(abs((doc_id * 31 + f * 17 + c * 1009) % 65536 - 32768)) AS sum_abs,
      |    max(abs((doc_id * 31 + f * 17 + c * 1009) % 65536 - 32768)) AS peak_abs
      |  FROM wc GROUP BY 1, 2, 3, 4
      |), wv AS (
      |  SELECT *, (doc_id % 13 = 0 OR doc_id % 29 = 0 OR doc_id % 31 = 0) AS bad
      |  FROM ws
      |)
      |SELECT doc_id,
      |  CAST(CASE WHEN bad THEN -1 ELSE ch END AS BIGINT) AS channels,
      |  CAST(CASE WHEN bad THEN -1 ELSE rate END AS BIGINT) AS sample_rate_hz,
      |  CAST(CASE WHEN bad THEN -1 ELSE nf END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN bad THEN -1 ELSE nf * 1000 // rate END AS BIGINT) AS duration_ms,
      |  CAST(CASE WHEN bad THEN -1 ELSE sum_abs END AS BIGINT) AS sum_abs,
      |  CAST(CASE WHEN bad THEN -1 ELSE peak_abs END AS BIGINT) AS peak_abs,
      |  CASE WHEN doc_id % 13 = 0 THEN 'truncated_header'
      |       WHEN doc_id % 29 = 0 THEN 'unsupported_encoding'
      |       WHEN doc_id % 31 = 0 THEN 'missing_data'
      |       ELSE '' END AS err
      |FROM wv""".stripMargin

  // ----------------------------------------------------- GIF frame walk

  /** Spec-valid ANIMATED GIF89a: logical screen descriptor with a
    * 2-entry global color table, a comment extension (so the walker
    * must skip a generic extension, not just GCEs), then per frame a
    * Graphic Control Extension (LE u16 delay in centiseconds) + image
    * descriptor (LE u16 frame dims) + LZW-min-code byte + one planted
    * data sub-block, and the 0x3B trailer. The sub-block DATA is
    * opaque (the walker skips by length — the same realness level as
    * #138's JPEG skeleton: container structure real, entropy payload
    * absent).
    */
  def buildGifAnim(
      screenW: Long, screenH: Long, frames: Int,
      delayCs: Int => Long, frameW: Int => Long, frameH: Int => Long,
      subLen: Int => Int,
      subByte: (Int, Int) => Int = (_, _) => 0x55): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(screenW)); out.write(le16(screenH))
    out.write(0x80) // GCT present, size bits 0 ⇒ 2 entries (6 bytes)
    out.write(0); out.write(0)
    out.write(Array[Byte](0, 0, 0, -1, -1, -1)) // the 2-entry GCT
    // a comment extension: generic sub-block skipping is exercised
    out.write(0x21); out.write(0xfe); out.write(3)
    out.write("gft".getBytes("US-ASCII")); out.write(0)
    for (f <- 0 until frames) {
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0) // packed
      out.write(le16(delayCs(f)))
      out.write(0); out.write(0) // transparent idx + block terminator
      out.write(0x2c) // image descriptor
      out.write(le16(0L)); out.write(le16(0L))
      out.write(le16(frameW(f))); out.write(le16(frameH(f)))
      out.write(0) // no local color table
      out.write(2) // LZW min code size
      val l = math.max(1, math.min(255, subLen(f)))
      out.write(l)
      out.write(Array.tabulate(l)(j => (subByte(f, j) & 0xff).toByte))
      out.write(0) // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  final case class GifFrames(
      screenW: Long, screenH: Long, nFrames: Long,
      totalDelayCs: Long, maxFrameW: Long, maxFrameH: Long)

  /** REAL GIF89a block walk: magic + logical-screen parse (global
    * color table skipped by its PACKED-FIELD size, not assumed),
    * then the block stream — extensions (GCE delays captured,
    * anything else skipped sub-block by sub-block), image descriptors
    * (local color table honored, LZW data skipped by sub-block
    * length), trailer required. Total — truncated streams, bogus
    * block introducers, and malformed GCEs all return Left.
    */
  def parseGifFrames(bytes: Array[Byte]): Either[String, GifFrames] =
    walkGif(bytes) { case (sw, sh, frames) =>
      var totalDelay = 0L
      var maxW = 0L
      var maxH = 0L
      frames.foreach { f =>
        totalDelay += f.delayCs
        if (f.w > maxW) maxW = f.w
        if (f.h > maxH) maxH = f.h
      }
      GifFrames(sw, sh, frames.length.toLong, totalDelay, maxW, maxH)
    }

  /** One walked frame: dims, its GCE delay, and the CONTENT SIGNATURE
    * — the first 8 bytes of the frame's concatenated LZW data
    * sub-block payload packed little-endian into one Long (injective
    * on those bytes by construction; top byte masked to 7 bits so the
    * value stays non-negative in engines without unsigned 64-bit).
    * The signature is what the frame-level dedup family ([[GifDedup]])
    * joins on — two frames are "the same picture" iff their payload
    * bytes agree.
    */
  private[mm] final case class WalkedFrame(w: Long, h: Long, delayCs: Long, sig: Long)

  /** The shared GIF89a block walk behind [[parseGifFrames]] and
    * [[GifDedup]]: identical structural gates and error precedence
    * (the q144 oracle encodes them); the result builder sees the full
    * frame list once the trailer is reached.
    */
  private[mm] def walkGif[A](bytes: Array[Byte])(
      build: (Long, Long, Vector[WalkedFrame]) => A): Either[String, A] = {
    if (bytes == null || bytes.length < 13) return Left("truncated_header")
    def u8(i: Int): Int = bytes(i) & 0xff
    def leU16v(i: Int): Long = ((u8(i + 1) << 8) | u8(i)).toLong
    if (!new String(bytes, 0, 6, "US-ASCII").matches("GIF8[79]a"))
      return Left("unknown_container")
    val (sw, sh) = (leU16v(6), leU16v(8))
    val packed = u8(10)
    var i = 13 + (if ((packed & 0x80) != 0) 3 << ((packed & 7) + 1) else 0)

    /** Skip a sub-block chain starting at `j`; -1 = truncated. */
    def skipSubBlocks(j0: Int): Int = {
      var j = j0
      while (true) {
        if (j >= bytes.length) return -1
        val l = u8(j)
        if (l == 0) return j + 1
        if (j + 1 + l > bytes.length) return -1
        j += 1 + l
      }
      -1
    }

    /** Pack the chain's first 8 payload bytes LE; assumes the chain
      * was already validated by [[skipSubBlocks]].
      */
    def chainSig(j0: Int): Long = {
      var sig = 0L
      var k = 0
      var j = j0
      while (k < 8) {
        val l = u8(j)
        if (l == 0) return sig
        var p = 0
        while (p < l && k < 8) {
          val b = if (k == 7) u8(j + 1 + p) & 0x7f else u8(j + 1 + p)
          sig |= b.toLong << (8 * k)
          p += 1
          k += 1
        }
        j += 1 + l
      }
      sig
    }

    var frames = Vector.empty[WalkedFrame]
    var pendingDelay = 0L
    while (true) {
      if (i >= bytes.length) return Left("missing_trailer")
      u8(i) match {
        case 0x3b =>
          return Right(build(sw, sh, frames))
        case 0x21 =>
          if (i + 2 >= bytes.length) return Left("truncated_block")
          val label = u8(i + 1)
          if (label == 0xf9) {
            // GCE: one 4-byte sub-block (packed, LE u16 delay, trans idx)
            if (u8(i + 2) != 4 || i + 7 >= bytes.length) return Left("bad_gce")
            pendingDelay = leU16v(i + 4)
          }
          val next = skipSubBlocks(i + 2)
          if (next < 0) return Left("truncated_block")
          i = next
        case 0x2c =>
          if (i + 10 > bytes.length) return Left("truncated_block")
          val (fw, fh) = (leU16v(i + 5), leU16v(i + 7))
          val ipacked = u8(i + 9)
          val lct = if ((ipacked & 0x80) != 0) 3 << ((ipacked & 7) + 1) else 0
          var j = i + 10 + lct
          if (j >= bytes.length) return Left("truncated_block")
          j += 1 // LZW minimum code size byte
          val next = skipSubBlocks(j)
          if (next < 0) return Left("truncated_block")
          frames :+= WalkedFrame(fw, fh, pendingDelay, chainSig(j))
          pendingDelay = 0L
          i = next
        case _ => return Left("bad_block_intro")
      }
    }
    Left("missing_trailer") // unreachable
  }

  /** Planted-animation arithmetic — shared by the builder and the
    * oracle. Delays are centiseconds (the GIF unit).
    */
  private[mm] def gifNFrames(docId: Long): Int = (1L + math.floorMod(docId, 7L)).toInt
  private[mm] def gifDelayCs(docId: Long, f: Int): Long =
    2L + math.floorMod(docId * 5L + f * 3L, 30L)
  private[mm] def gifFrameW(docId: Long, f: Int): Long =
    1L + math.floorMod(docId * 3L + f, 64L)
  private[mm] def gifFrameH(docId: Long, f: Int): Long =
    1L + math.floorMod(docId * 11L + f * 5L, 48L)

  private[mm] final case class DecodedGif(
      doc_id: Long, screen_w: Long, screen_h: Long, n_frames: Long,
      total_delay_cs: Long, max_frame_w: Long, max_frame_h: Long, err: String)

  /** q144: REAL animated-GIF frame enumeration — the "video"
    * modality's frame walk made real at the container level: each doc
    * becomes a spec-valid multi-frame GIF89a whose frame count,
    * per-frame delays, and per-frame dims derive from doc_id
    * arithmetic; the decoder walks the actual block stream (global
    * color table by packed-field size, generic extension skipping,
    * GCE delay capture, per-frame sub-block chains, trailer) and the
    * DuckDB oracle recomputes every output from the planting
    * arithmetic alone — a mis-sized color table, a skipped extension
    * label, or a sub-block length slip fails the hash. Corruption
    * plants: every 13th doc truncated 2 bytes short (the walker dies
    * inside the last frame's sub-block chain ⇒ truncated_block),
    * every 23rd doc's trailer overwritten with a bogus block
    * introducer (bad_block_intro). Same typed batch seam as the rest
    * of the family.
    */
  def mediaGifFrames(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { id =>
          val full = buildGifAnim(
            plantedWidth(id), plantedHeight(id), gifNFrames(id),
            f => gifDelayCs(id, f), f => gifFrameW(id, f), f => gifFrameH(id, f),
            f => (1L + math.floorMod(id + f, 200L)).toInt)
          val payload =
            if (math.floorMod(id, 13L) == 0L) full.take(full.length - 2)
            else if (math.floorMod(id, 23L) == 0L) {
              val b = full.clone(); b(b.length - 1) = 0x7f.toByte; b
            } else full
          parseGifFrames(payload) match {
            case Right(g) => DecodedGif(id, g.screenW, g.screenH, g.nFrames,
              g.totalDelayCs, g.maxFrameW, g.maxFrameH, "")
            case Left(err) => DecodedGif(id, -1L, -1L, -1L, -1L, -1L, -1L, err)
          }
        }
      }
    }.toDF()
  }

  /** DuckDB twin of [[mediaGifFrames]]: planting arithmetic over the
    * frame range — no byte walking. Truncation precedence mirrors the
    * builder (%13 truncates before %23 can corrupt the trailer).
    */
  def sqlMediaGifFrames: String =
    """WITH gg AS (
      |  SELECT doc_id,
      |    1 + (doc_id * 7 + 3) % 512 AS sw,
      |    1 + (doc_id * 13 + 5) % 512 AS sh,
      |    1 + doc_id % 7 AS nf
      |  FROM documents
      |), gf AS (
      |  SELECT doc_id, sw, sh, nf, unnest(range(0, nf)) AS f FROM gg
      |), gs AS (
      |  SELECT doc_id, sw, sh, nf,
      |    sum(2 + (doc_id * 5 + f * 3) % 30) AS total_delay,
      |    max(1 + (doc_id * 3 + f) % 64) AS max_w,
      |    max(1 + (doc_id * 11 + f * 5) % 48) AS max_h
      |  FROM gf GROUP BY 1, 2, 3, 4
      |), gv AS (
      |  SELECT *, (doc_id % 13 = 0 OR doc_id % 23 = 0) AS bad FROM gs
      |)
      |SELECT doc_id,
      |  CAST(CASE WHEN bad THEN -1 ELSE sw END AS BIGINT) AS screen_w,
      |  CAST(CASE WHEN bad THEN -1 ELSE sh END AS BIGINT) AS screen_h,
      |  CAST(CASE WHEN bad THEN -1 ELSE nf END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN bad THEN -1 ELSE total_delay END AS BIGINT) AS total_delay_cs,
      |  CAST(CASE WHEN bad THEN -1 ELSE max_w END AS BIGINT) AS max_frame_w,
      |  CAST(CASE WHEN bad THEN -1 ELSE max_h END AS BIGINT) AS max_frame_h,
      |  CASE WHEN doc_id % 13 = 0 THEN 'truncated_block'
      |       WHEN doc_id % 23 = 0 THEN 'bad_block_intro'
      |       ELSE '' END AS err
      |FROM gv""".stripMargin

  // ------------------------------------------------ perceptual hash (dHash)

  /** Planted-image arithmetic for the PERCEPTUAL-HASH family — the
    * near-dup structure the planting deliberately creates: images are
    * keyed by GROUP `doc_id div 48` (consecutive ids share a picture —
    * the crawl-local duplicate shape, and the property that keeps the
    * pair graph LINEAR in the corpus: clique size is ≤48 at ANY scale,
    * where a modulus-keyed group grows with the corpus and makes every
    * pair-emitting consumer quadratic — measured at sf1 before the
    * re-plant: exp 1.28 on q_image_dedup) with a per-doc VARIANT
    * `doc_id % 3`:
    *
    *   v0: the base picture
    *   v1: the base +7 on every channel (a re-encode/brightness shift
    *       — different bytes, same picture; dHash is gradient-based
    *       so the hash is IDENTICAL by construction)
    *   v2: one 4×4 block brightened by +64 (a local edit — flips at
    *       most the 2 dHash bits whose comparisons touch that block)
    *
    * Base channels are bounded < 160 so neither perturbation can
    * clamp (160+64+7 < 256 even stacked — they never stack, but the
    * margin is the proof).
    */
  private[graft] val phashW = 36 // 9 block columns × 4 px
  private[graft] val phashH = 32 // 8 block rows    × 4 px
  private[graft] def phashPixelAt(docId: Long, x: Int, y: Int): (Int, Int, Int) = {
    val g = docId / 48L
    val v = math.floorMod(docId, 3L)
    val add =
      if (v == 1L) 7
      else if (v == 2L && x / 4 == (g % 9L).toInt && y / 4 == (g % 8L).toInt) 64
      else 0
    (math.floorMod(x * 7L + y * 13L + g * 31L, 160L).toInt + add,
      math.floorMod(x * 3L + y * 5L + g * 17L, 160L).toInt + add,
      math.floorMod(x + y + g * 11L, 160L).toInt + add)
  }

  /** dHash over decoded RGB bytes: 9×8 grid of 4×4-block gray sums
    * (gray = r+g+b — block sizes are equal so sums ARE means up to the
    * constant, and integer sums keep both engines exact), bit k=i·8+j
    * set iff S(j+1,i) > S(j,i), packed as FOUR 16-bit bands (the
    * SimHash banding unit, and it sidesteps 1<<63 sign traps in both
    * engines). Exposed for the spec's driver-side recomputation.
    */
  private[graft] def dhashBands(raw: Array[Byte], w: Int, h: Int): Array[Long] = {
    val s = Array.ofDim[Long](9, 8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        s(x / 4)(y / 4) += (raw(o) & 0xff) + (raw(o + 1) & 0xff) + (raw(o + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val bands = Array.fill(4)(0L)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        if (s(j + 1)(i) > s(j)(i)) {
          val k = i * 8 + j
          bands(k / 16) |= 1L << (k % 16)
        }
        j += 1
      }
      i += 1
    }
    bands
  }

  private[mm] final case class PhashRow(
      doc_id: Long, width: Long, height: Long,
      b0: Long, b1: Long, b2: Long, b3: Long, err: String)

  /** q148: perceptual hash (dHash) from a REAL PNG decode — the image
    * fingerprint feeding near-dup image dedup (the pHash/dHash family
    * every multimodal curation pipeline runs; Krawetz's difference
    * hash): each doc's planted PNG (rows cycling all five PNG filter
    * types) is zlib-inflated, unfiltered, block-summed, and packed to
    * four 16-bit hash bands. The DuckDB oracle recomputes the bands
    * from the planting arithmetic alone — hash-exact proof the bits
    * came from actual decoded bytes. Every 19th doc ships without its
    * IDAT and must quarantine (the family's corruption discipline).
    * Scale shape: typed mapPartitions batch seam, scan-side, zero
    * shuffles — hashing is embarrassingly parallel; all join work
    * lives in [[imageDedup]].
    */
  def imagePhash(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { id =>
          val payload =
            if (math.floorMod(id, 19L) == 0L) buildPng(phashW.toLong, phashH.toLong)
            else buildPngPixels(phashW, phashH,
              (x, y) => phashPixelAt(id, x, y), y => (id + y).toInt)
          decodePixels(payload) match {
            case Right((dw, dh, raw)) =>
              val b = dhashBands(raw, dw, dh)
              PhashRow(id, dw.toLong, dh.toLong, b(0), b(1), b(2), b(3), "")
            case Left(err) => PhashRow(id, -1L, -1L, -1L, -1L, -1L, -1L, err)
          }
        }
      }
    }.toDF()
  }

  /** The phash-bands CTE chain shared by both oracles: planting
    * arithmetic → per-block gray sums → dHash bits → four 16-bit
    * bands, ending in a `ph(doc_id, b0..b3)` relation over the
    * NON-quarantined docs plus a `phq` view that mirrors the
    * quarantine override.
    */
  private def sqlPhashCtes: String =
    s"""ig AS (
       |  SELECT doc_id, doc_id // 48 AS g, doc_id % 3 AS v FROM documents
       |), ipx AS (
       |  SELECT doc_id, g, v, unnest(range(0, $phashW)) AS x FROM ig
       |), ipxy AS (
       |  SELECT doc_id, g, v, x, unnest(range(0, $phashH)) AS y FROM ipx
       |), igr AS (
       |  SELECT doc_id, x // 4 AS bx, y // 4 AS by,
       |    ((x * 7 + y * 13 + g * 31) % 160) + ((x * 3 + y * 5 + g * 17) % 160)
       |      + ((x + y + g * 11) % 160)
       |      + 3 * (CASE WHEN v = 1 THEN 7
       |                  WHEN v = 2 AND x // 4 = g % 9 AND y // 4 = g % 8 THEN 64
       |                  ELSE 0 END) AS gray
       |  FROM ipxy
       |), ibs AS MATERIALIZED (
       |  SELECT doc_id, bx, by, sum(gray) AS s FROM igr GROUP BY 1, 2, 3
       |), ibits AS (
       |  SELECT a.doc_id, a.by AS i, a.bx AS j,
       |    CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
       |  FROM ibs a JOIN ibs b ON b.doc_id = a.doc_id AND b.by = a.by AND b.bx = a.bx + 1
       |  WHERE a.bx < 8
       |), ibands AS (
       |  SELECT doc_id, i // 2 AS band,
       |    CAST(sum(bit * (CAST(1 AS BIGINT) << ((i % 2) * 8 + j))) AS BIGINT) AS val
       |  FROM ibits GROUP BY 1, 2
       |), ph AS MATERIALIZED (
       |  SELECT doc_id,
       |    max(CASE WHEN band = 0 THEN val END) AS b0,
       |    max(CASE WHEN band = 1 THEN val END) AS b1,
       |    max(CASE WHEN band = 2 THEN val END) AS b2,
       |    max(CASE WHEN band = 3 THEN val END) AS b3
       |  FROM ibands GROUP BY 1
       |)""".stripMargin

  /** DuckDB twin of [[imagePhash]]: the planting arithmetic pushed
    * through the same block-sum/compare/pack pipeline — zero byte
    * decoding, which is the point.
    */
  def sqlImagePhash: String =
    s"""WITH $sqlPhashCtes
       |SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE $phashW END AS BIGINT) AS width,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE $phashH END AS BIGINT) AS height,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b0 END AS BIGINT) AS b0,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b1 END AS BIGINT) AS b1,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b2 END AS BIGINT) AS b2,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b3 END AS BIGINT) AS b3,
       |  CASE WHEN doc_id % 19 = 0 THEN 'missing_idat' ELSE '' END AS err
       |FROM ph""".stripMargin

  /** q149: near-duplicate IMAGE pairs via banded Hamming join over
    * the dHash — the SimHash discipline applied to the decoded-pixel
    * modality (the near-dup screen lexical dedup is blind to: two
    * re-encodes of one picture share no bytes and no text): hashes
    * split into their four 16-bit bands, candidates = pairs sharing
    * ANY band value (one (band, value) equi-join shuffle — with ≤ tau
    * = 2 flipped bits at least two bands are intact, so every true
    * pair IS a candidate by pigeonhole), verified by the exact
    * Hamming distance (bit_count over per-band XOR — never a 64-bit
    * shift). Quarantined docs are excluded; pairs are emitted once
    * (a < b, distinct before the verify so multi-band collisions
    * don't double-count). The hash frame is localCheckpoint'd —
    * one decode pass feeds both sides of the self-join.
    */
  /** Memoized, materialized [[imagePhash]] — the decode pass is shared
    * by the hash query, the pair join (both sides), and the drop
    * verdict, so it runs once per (corpus) per session (the
    * pairsCached discipline); itemized as `mm_image_phash` in the
    * bench build line via [[prewarm]].
    */
  private val phashMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  def phashCached(documents: DataFrame): DataFrame =
    phashMemo.getOrElseUpdate(documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized)(
      imagePhash(documents).boundedCheckpoint())

  /** Bench seam itemization: the shared decode pass and the persisted
    * store index (built over the incremental queries' store split).
    */
  def prewarm(documents: DataFrame): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      out += name -> ((System.nanoTime() - t0) / 1e9)
    }
    timed("mm_image_phash") { phashCached(documents); () }
    timed("mm_phash_index") {
      phashIndexDirCached(documents.filter(pmod(col("doc_id"), lit(10L)) =!= 0)); ()
    }
    out.toSeq
  }

  /** Band unpivot of a decodable phash frame: one (doc_id, bands, bi,
    * bv) row per 16-bit band — the join key unit shared by the
    * self-join ([[imageDedup]]) and the batch-vs-store screen
    * ([[imageScreenAgainst]]).
    */
  private[mm] def bandUnpivot(ph: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    ph.filter(col("err") === "")
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        explode(array((0 to 3).map(i =>
          struct(lit(i).as("bi"), col(s"b$i").as("bv"))): _*)).as("band"))
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
  }

  /** DISTINCT-HASH collapse (round 15): one row per distinct dHash
    * value with its representative (min doc_id — unique per hash, so
    * it doubles as the hash's id). Re-encoded/re-crawled images
    * duplicate heavily at EXACT hash equality (this corpus: 142k
    * decodable sf3 images → 1,233 distinct hashes), so everything
    * pairwise runs at DISTINCT-HASH cardinality and image-level
    * results EXPAND from group membership — the candidate band join
    * stops being quadratic in the duplication factor (a hot band
    * value shared by a 5k-image pile is one rep-level row), which
    * was q_image_dedup/q_image_drop's exp3 1.7/1.5 ladder tail.
    */
  private[mm] def hashGroups(ph: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    ph.filter(col("err") === "")
      .groupBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .agg(min(col("doc_id")).as("rep"))
  }

  /** (doc_id, rep) membership: every decodable image tagged with its
    * hash group's representative.
    */
  private[mm] def hashMembers(ph: DataFrame, groups: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    ph.filter(col("err") === "")
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"))
      .join(groups, Seq("b0", "b1", "b2", "b3"))
      .select(col("doc_id"), col("rep"))
  }

  /** Rep-level Hamming-≤tau pairs over the DISTINCT hashes: the banded
    * self-join at distinct-hash cardinality (lossless for tau ≤ 3 —
    * ≤ 3 flipped bits leave ≥ 1 of the 4 bands intact).
    */
  private[mm] def repPairs(groups: DataFrame, tau: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val gb = groups.select(col("rep"), col("b0"), col("b1"), col("b2"), col("b3"),
      explode(array((0 to 3).map(i =>
        struct(lit(i).as("bi"), col(s"b$i").as("bv"))): _*)).as("band"))
      .select(col("rep"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
    val l = gb.toDF("ra", "a0", "a1", "a2", "a3", "bi", "bv")
    val r = gb.toDF("rb", "c0", "c1", "c2", "c3", "bi", "bv")
    val hamming = (0 to 3).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"c$i")))).reduce(_ + _).cast("long")
    l.join(r, Seq("bi", "bv")).filter(col("ra") < col("rb"))
      .select("ra", "rb", "a0", "a1", "a2", "a3", "c0", "c1", "c2", "c3")
      .distinct()
      .select(col("ra"), col("rb"), hamming.as("hamming"))
      .filter(col("hamming") <= tau)
  }

  def imageDedup(documents: DataFrame, tau: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions._
    val ph = phashCached(documents)
    val groups = hashGroups(ph).boundedCheckpoint()
    val memb = hashMembers(ph, groups)
    // image pairs EXPAND from the rep-level graph: identical-hash
    // pairs are Hamming 0 by definition (the within-group self-join
    // is output-sized — those pairs are in the result), cross-group
    // pairs inherit their reps' Hamming (the distance depends only on
    // the hash values). Join INPUT is corpus-sized + rep-graph-sized;
    // nothing quadratic in the duplication factor ever enters a join.
    val within = memb.toDF("da", "rep").join(memb.toDF("db", "rep"), Seq("rep"))
      .filter(col("da") < col("db"))
      .select(col("da").as("a"), col("db").as("b"), lit(0L).as("hamming"))
    val cross = repPairs(groups, tau)
      .join(memb.toDF("da", "ra"), Seq("ra"))
      .join(memb.toDF("db", "rb"), Seq("rb"))
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"), col("hamming"))
    within.unionAll(cross)
  }

  /** DuckDB twin of [[imageDedup]]: the [[sqlPhashCtes]] bands pushed
    * through the same band-unpivot / equi-join / exact-Hamming verify.
    */
  def sqlImageDedup(tau: Int = 2): String =
    s"""WITH $sqlPhashCtes, iub AS (
       |  SELECT doc_id, b0, b1, b2, b3, 0 AS bi, b0 AS bv FROM ph WHERE doc_id % 19 <> 0
       |  UNION ALL
       |  SELECT doc_id, b0, b1, b2, b3, 1, b1 FROM ph WHERE doc_id % 19 <> 0
       |  UNION ALL
       |  SELECT doc_id, b0, b1, b2, b3, 2, b2 FROM ph WHERE doc_id % 19 <> 0
       |  UNION ALL
       |  SELECT doc_id, b0, b1, b2, b3, 3, b3 FROM ph WHERE doc_id % 19 <> 0
       |), icand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |    l.b0 AS a0, l.b1 AS a1, l.b2 AS a2, l.b3 AS a3,
       |    r.b0 AS c0, r.b1 AS c1, r.b2 AS c2, r.b3 AS c3
       |  FROM iub l JOIN iub r ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
       |)
       |SELECT a, b,
       |  CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
       |     + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS BIGINT) AS hamming
       |FROM icand
       |WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
       |    + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) <= $tau""".stripMargin

  /** The arbitrary-split screen core (the `screenAgainst` discipline):
    * every DECODABLE landed image probes the store's dHash bands; an
    * undecodable payload is not an image-dup risk, so it passes this
    * screen with decoded=false (the decode gate reports it separately).
    */
  def imageScreenAgainst(
      newDocs: DataFrame, storeDocs: DataFrame, tau: Int = 2): DataFrame =
    screenPhashFrames(imagePhash(newDocs), phashCached(storeDocs), tau)

  private[mm] def screenPhashFrames(batchPh: DataFrame, storePh: DataFrame, tau: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val b = bandUnpivot(batchPh).toDF("bdoc", "a0", "a1", "a2", "a3", "bi", "bv")
    val s = bandUnpivot(storePh).toDF("sdoc", "c0", "c1", "c2", "c3", "bi", "bv")
    val hamming = (0 to 3).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"c$i")))).reduce(_ + _)
    val hits = b.join(s, Seq("bi", "bv"))
      .select("bdoc", "sdoc", "a0", "a1", "a2", "a3", "c0", "c1", "c2", "c3")
      .distinct()
      .filter(hamming <= tau)
      .groupBy(col("bdoc"))
      .agg(count(lit(1)).as("n"))
      .select(col("bdoc").as("doc_id"), col("n"))
    batchPh.select(col("doc_id"), (col("err") === "").as("decoded"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("decoded"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_store_dups"))
      .withColumn("image_keep", col("n_store_dups") === 0L)
  }

  /** q154: the IMAGE modality's incremental-ingest screen — the fourth
    * screen family member (exact #107 / span #118 / embedding #108 /
    * perplexity #135 all have one; the image near-dup screen was the
    * gap): a landed batch image is kept iff NO stored image sits
    * within Hamming tau of its dHash. Store scanned never shuffled
    * beyond the band equi-join; the shared decode is ONE memoized pass
    * ([[phashCached]]) feeding both sides, the #107 `setsCached`
    * discipline.
    */
  def imageScreen(documents: DataFrame, batchMod: Long = 10, tau: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions._
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val ph = phashCached(documents)
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    screenPhashFrames(ph.filter(isBatch), ph.filter(!isBatch), tau)
  }

  /** Session-scoped registry of persisted phash-index dirs, keyed on
    * the canonicalized store plan (the shingleIndexDirCached
    * discipline): every screen against the same store probes ONE
    * persisted index — at 100 TB the index simply exists; here the
    * first touch builds it, itemized via [[prewarm]].
    */
  private val phashIdxMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String]()

  private[graft] def phashIndexDirCached(storeDocs: DataFrame): String =
    phashIdxMemo.getOrElseUpdate(storeDocs.sparkSession,
      storeDocs.queryExecution.analyzed.canonicalized)({
      val dir = java.nio.file.Files.createTempDirectory("graft_phash_idx_").toString
      PhashIndex.write(storeDocs, dir)
      dir
    })

  /** q155: [[imageScreen]] served from the PERSISTED [[PhashIndex]] —
    * identical contract; verdicts depend only on (batch image, store
    * hash content), so the disk path shares q154's DuckDB oracle
    * verbatim (the full hash-exact gate). The store side is one
    * columnar scan of the band table — no store decode per ingest.
    */
  def imageScreenDisk(documents: DataFrame, batchMod: Long = 10, tau: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions._
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val dir = phashIndexDirCached(documents.filter(!isBatch))
    PhashIndex.probe(documents.sparkSession, documents.filter(isBatch), dir, tau)
  }

  def sqlImageScreen(batchMod: Long = 10, tau: Int = 2): String =
    s"""WITH $sqlPhashCtes, isb AS (
       |  SELECT doc_id, b0, b1, b2, b3, 0 AS bi, b0 AS bv FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod = 0
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 1, b1 FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod = 0
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 2, b2 FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod = 0
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 3, b3 FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod = 0
       |), iss AS (
       |  SELECT doc_id, b0, b1, b2, b3, 0 AS bi, b0 AS bv FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod <> 0
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 1, b1 FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod <> 0
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 2, b2 FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod <> 0
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 3, b3 FROM ph
       |  WHERE doc_id % 19 <> 0 AND doc_id % $batchMod <> 0
       |), ish AS (
       |  SELECT DISTINCT b.doc_id AS bdoc, s.doc_id AS sdoc
       |  FROM isb b JOIN iss s ON b.bi = s.bi AND b.bv = s.bv
       |  WHERE bit_count(xor(b.b0, s.b0)) + bit_count(xor(b.b1, s.b1))
       |      + bit_count(xor(b.b2, s.b2)) + bit_count(xor(b.b3, s.b3)) <= $tau
       |), isc AS (
       |  SELECT bdoc AS doc_id, CAST(count(*) AS BIGINT) AS n FROM ish GROUP BY 1
       |)
       |SELECT d.doc_id, (d.doc_id % 19 <> 0) AS decoded,
       |  CAST(coalesce(isc.n, 0) AS BIGINT) AS n_store_dups,
       |  (coalesce(isc.n, 0) = 0) AS image_keep
       |FROM documents d LEFT JOIN isc ON d.doc_id = isc.doc_id
       |WHERE d.doc_id % $batchMod = 0""".stripMargin

  /** q153: the ACT for [[imageDedup]] — one verdict row per decodable
    * image: keep = the image is its perceptual cluster's FIRST member
    * (min doc_id — the Lee et al. first-wins rule the batch screen
    * (#109) also uses; images carry no quality score, and the planted
    * corpus has no resolution spread, so highest-resolution-wins would
    * tie straight back to this). Clusters are connected components of
    * the ≤tau Hamming pair graph ([[graft.dedup.Dedup.clusters]] —
    * min-label propagation, so cluster_id IS the surviving doc_id);
    * unpaired images are their own singleton cluster and always keep.
    * Quarantined payloads are EXCLUDED (they never landed as images;
    * the decode gate already reported them). Oracle: the phash CTE
    * chain + recursive transitive closure, the [[graft.dedup.Dedup
    * .sqlEmbedDedupBest]] pattern.
    */
  def imageDrop(documents: DataFrame, tau: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions._
    // connected components run at DISTINCT-HASH cardinality (round
    // 15): images with identical hash are pairwise Hamming 0, so the
    // image-level component structure IS the rep-level structure
    // expanded through group membership, and each rep is already its
    // group's min doc_id — the min-label CC over reps yields exactly
    // the image component's min doc_id. The pre-round-15 form ran CC
    // label propagation over the EXPANDED image pair graph — millions
    // of pairs re-scanned per CC round on a corpus that collapses to
    // ~1k distinct hashes.
    val ph = phashCached(documents)
    val groups = hashGroups(ph).boundedCheckpoint()
    val memb = hashMembers(ph, groups)
    // clustersCached, not clusters(): the memoized labels ARE stable
    // materialized checkpoint blocks (no extra localCheckpoint copy),
    // and repeated invocations reuse one derivation per pair graph
    // instead of leaking one labels copy each (round 16, ADVICE item)
    val labels = graft.dedup.Dedup.clustersCached(
      repPairs(groups, tau).select(col("ra").as("doc_a"), col("rb").as("doc_b")))
      .withColumnRenamed("doc_id", "rep")
    memb.join(labels, Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col("doc_id"))
  }

  def sqlImageDrop(tau: Int = 2): String =
    s"""WITH RECURSIVE $sqlPhashCtes, iub AS (
       |  SELECT doc_id, b0, b1, b2, b3, 0 AS bi, b0 AS bv FROM ph WHERE doc_id % 19 <> 0
       |  UNION ALL
       |  SELECT doc_id, b0, b1, b2, b3, 1, b1 FROM ph WHERE doc_id % 19 <> 0
       |  UNION ALL
       |  SELECT doc_id, b0, b1, b2, b3, 2, b2 FROM ph WHERE doc_id % 19 <> 0
       |  UNION ALL
       |  SELECT doc_id, b0, b1, b2, b3, 3, b3 FROM ph WHERE doc_id % 19 <> 0
       |), ipr AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM iub l JOIN iub r ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
       |      + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3)) <= $tau
       |), ipg AS (
       |  SELECT a AS src, b AS dst FROM ipr
       |  UNION
       |  SELECT b, a FROM ipr
       |), ipreach(src, x) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM ipg)
       |  UNION
       |  SELECT w.src, ipg.dst FROM ipreach w JOIN ipg ON w.x = ipg.src
       |), iplab AS (
       |  SELECT src AS doc_id, min(x) AS cluster_id FROM ipreach GROUP BY 1
       |)
       |SELECT ph.doc_id,
       |  CAST(coalesce(iplab.cluster_id, ph.doc_id) AS BIGINT) AS cluster_id,
       |  (coalesce(iplab.cluster_id, ph.doc_id) = ph.doc_id) AS keep
       |FROM ph LEFT JOIN iplab ON ph.doc_id = iplab.doc_id
       |WHERE ph.doc_id % 19 <> 0""".stripMargin

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
