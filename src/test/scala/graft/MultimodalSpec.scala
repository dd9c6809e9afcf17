package graft

import org.apache.spark.sql.functions._

import graft.mm.Multimodal

class MultimodalSpec extends SparkSpec {

  test("batched decode: features match a direct reimplementation, no rows lost") {
    val docs = Tables.documents(spark, sf)
    val out = Multimodal.decodeFeatures(docs, batchSize = 64).collect()
      .map(f => f.doc_id -> f).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === raw.keySet)
    raw.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val hist = new Array[Float](16)
      bytes.foreach(b => hist((b & 0xff) % 16) += 1f)
      val expected = hist.map(_ / math.max(bytes.length, 1).toFloat)
      val got = out(id)
      assert(got.n_bytes === bytes.length.toLong)
      assert(got.embedding.toSeq === expected.toSeq, s"doc $id histogram mismatch")
    }
  }

  test("batch shape: every batch is full except at most one tail per partition") {
    val docs = Tables.documents(spark, sf)
    val bs = 32
    val out = Multimodal.decodeFeatures(docs, batchSize = bs)
    // per partition: sizes seen must be {bs} plus at most one remainder
    val perPartition = out
      .withColumn("pid", spark_partition_id())
      .groupBy("pid", "batch_size").count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    perPartition.foreach { case (pid, rows) =>
      val tails = rows.filter(_._2 != bs)
      assert(tails.length <= 1, s"partition $pid has multiple tail batches: ${rows.toSeq}")
      tails.foreach { case (_, size, cnt) =>
        assert(cnt === size.toLong, s"partition $pid tail batch inconsistent")
      }
      rows.filter(_._2 == bs).foreach { case (_, _, cnt) =>
        assert(cnt % bs === 0)
      }
    }
    // decode is deterministic across runs
    val e1 = out.orderBy("doc_id").select("embedding").collect().map(_.getSeq[Float](0))
    val e2 = Multimodal.decodeFeatures(docs, batchSize = bs)
      .orderBy("doc_id").select("embedding").collect().map(_.getSeq[Float](0))
    assert(e1.toSeq === e2.toSeq)
  }

  test("mediaResize: aspect-preserving fit, never upscaling, exact integer arithmetic") {
    val out = Multimodal.mediaResize(Tables.documents(spark, sf)).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, ow, oh, ppm) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(ow <= 224 && oh <= 224, s"box overflow: $ow x $oh")
      assert(ppm <= 1000000L, "never upscale")
      // the longer edge determines the scale; recompute independently
      val expectPpm = math.min(math.min(224000000L / w, 224000000L / h), 1000000L)
      assert(ppm === expectPpm)
      assert(ow === w * ppm / 1000000L && oh === h * ppm / 1000000L)
    }
    // audio assets have no spatial dims and must be excluded
    assert(out.filter(col("format") === "audio").count() === 0)
  }

  test("q_media_features emits a gate-friendly shape: no array columns, stable signature") {
    val docs = Tables.documents(spark, sf)
    val out = Multimodal.mediaFeatures(docs)
    // the driver correctness gate sorts every column with pandas —
    // array columns are unhashable there, so none may ship
    out.schema.fields.foreach { f =>
      assert(!f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"column ${f.name} is an array — unhashable in the driver gate")
    }
    val sig = out.orderBy("doc_id").select("embedding_sig").head().getString(0)
    assert(sig.split(",").length === 16)
    // signature is the rounded embedding, 1:1 with the typed API
    // Locale.US explicitly: Spark's format_string always formats with
    // Locale.US, but Scala's f interpolator uses the JVM default
    val emb = Multimodal.decodeFeatures(docs).orderBy("doc_id").head().embedding
    assert(sig === emb.map(x =>
      String.format(java.util.Locale.US, "%.6f", Double.box(x.toDouble))).mkString(","))
  }

  test("MediaCodec.parseHeader reads real PNG/JPEG/GIF bytes and round-trips the builders") {
    import graft.mm.MediaCodec
    assert(MediaCodec.parseHeader(MediaCodec.buildPng(640, 480)) === Right(("png", 640L, 480L)))
    assert(MediaCodec.parseHeader(MediaCodec.buildJpeg(1, 65535)) === Right(("jpeg", 1L, 65535L)))
    assert(MediaCodec.parseHeader(MediaCodec.buildGif(300, 7)) === Right(("gif", 300L, 7L)))
    // PNG dims are u32 big-endian — exercise beyond u16
    assert(MediaCodec.parseHeader(MediaCodec.buildPng(70000, 3)) === Right(("png", 70000L, 3L)))
    // GIF is LITTLE-endian: 0x0102 stored as 02 01 — a big-endian
    // misread would report 513 as 258
    val gif = MediaCodec.buildGif(0x0102, 0x0304)
    assert((gif(6) & 0xff) === 0x02 && (gif(7) & 0xff) === 0x01)
    assert(MediaCodec.parseHeader(gif) === Right(("gif", 0x0102L, 0x0304L)))
  }

  test("MediaCodec.parseHeader quarantines malformed bytes as values, never throws") {
    import graft.mm.MediaCodec
    assert(MediaCodec.parseHeader(null) === Left("truncated_header"))
    assert(MediaCodec.parseHeader(Array.emptyByteArray) === Left("truncated_header"))
    assert(MediaCodec.parseHeader(MediaCodec.buildPng(10, 10).take(6)) === Left("truncated_header"))
    assert(MediaCodec.parseHeader(MediaCodec.buildPng(10, 10).take(20)) === Left("truncated_header"))
    assert(MediaCodec.parseHeader(MediaCodec.buildPng(10, 10, corruptCrc = true)) === Left("bad_crc"))
    assert(MediaCodec.parseHeader("this is not an image at all!".getBytes("UTF-8")) ===
      Left("unknown_container"))
    // JPEG with the SOF segment stripped (SOI + APP0 + EOI): no frame header
    val jpeg = MediaCodec.buildJpeg(5, 5)
    val noSof = jpeg.take(2 + 18) ++ jpeg.takeRight(2)
    assert(MediaCodec.parseHeader(noSof) === Left("no_sof"))
    // random garbage after SOI must not throw
    val garbage = Array[Byte](0xff.toByte, 0xd8.toByte) ++ Array.fill[Byte](40)(0x41)
    assert(MediaCodec.parseHeader(garbage).isLeft)
  }

  test("PNG pixel codec: round-trips all five filters; unfilter verified against hand-built literal bytes; malformed IDAT quarantines") {
    import graft.mm.MediaCodec
    // round-trip: every filter type, non-square dims
    val px = (x: Int, y: Int) => ((x * 11 + y) % 256, (y * 7 + 1) % 256, (x + 3 * y) % 256)
    for (f <- 0 to 4) {
      val bytes = MediaCodec.buildPngPixels(5, 3, px, _ => f)
      val Right((w, h, raw)) = MediaCodec.decodePixels(bytes)
      assert(w === 5 && h === 3)
      for (y <- 0 until 3; x <- 0 until 5) {
        val (r, g, b) = px(x, y)
        val o = y * 15 + x * 3
        assert((raw(o) & 0xff, raw(o + 1) & 0xff, raw(o + 2) & 0xff) === ((r, g, b)),
          s"filter $f pixel ($x,$y)")
      }
    }
    // mixed filters per row (the planted-query shape)
    val mixed = MediaCodec.buildPngPixels(4, 5, px, y => y)
    assert(MediaCodec.decodePixels(mixed).isRight)
    // HAND-BUILT literal stream: 2x1 RGB row under filter 1 (Sub) —
    // raw pixels (10,20,30),(13,24,35) encode as 10,20,30 then deltas
    // 3,4,5. A symmetric encoder/decoder bug cannot pass this: the
    // filtered bytes are written literally, only the decoder runs.
    locally {
      val filtered = Array[Byte](1, 10, 20, 30, 3, 4, 5)
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(filtered); deflater.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
      val idatData = out.toByteArray
      val idatType = "IDAT".getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(idatType); crc.update(idatData)
      def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val header = MediaCodec.buildPng(2, 1)
      val spliced = header.take(header.length - 12) ++
        be32(idatData.length.toLong) ++ idatType ++ idatData ++ be32(crc.getValue) ++
        header.takeRight(12)
      val Right((_, _, raw)) = MediaCodec.decodePixels(spliced)
      assert(raw.map(_ & 0xff).toSeq === Seq(10, 20, 30, 13, 24, 35),
        "Sub unfilter must add the left pixel's byte")
    }
    // malformed: no IDAT at all, truncated IDAT, garbage
    assert(MediaCodec.decodePixels(MediaCodec.buildPng(4, 4)) === Left("missing_idat"))
    val full = MediaCodec.buildPngPixels(6, 6, px, _ => 0)
    assert(MediaCodec.decodePixels(full.take(full.length - 20)).isLeft)
    assert(MediaCodec.decodePixels("gibberish not an image".getBytes("UTF-8")).isLeft)
  }

  test("q_media_pixels: planted per-channel sums recovered through the REAL zlib+unfilter decode") {
    import graft.mm.MediaCodec
    val docs = Tables.documents(spark, sf)
    val out = MediaCodec.mediaPixels(docs).cache()
    assert(out.count() === docs.count())
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    rows.foreach { case (id, (w, h, sr, sg, sb, err)) =>
      if (id % 19 == 0) {
        assert(err === "missing_idat" && w === -1L, s"doc $id must quarantine")
      } else {
        assert(err === "", s"doc $id unexpectedly quarantined: $err")
        val (ew, eh) = (8 + id % 9, 8 + id % 7)
        assert(w === ew && h === eh, s"doc $id dims")
        var (xr, xg, xb) = (0L, 0L, 0L)
        for (x <- 0 until ew.toInt; y <- 0 until eh.toInt) {
          xr += (x * 7 + y * 13 + id) % 256
          xg += (x * 3 + y * 5 + 2 * id) % 256
          xb += (x + y + 3 * id) % 256
        }
        assert((sr, sg, sb) === ((xr, xg, xb)), s"doc $id channel sums")
      }
    }
    assert(rows.values.exists(_._6 == "missing_idat"), "no quarantine plant in corpus")
  }

  test("q_media_decode: planted dims come back through the REAL parse; corrupt rows quarantine") {
    import graft.mm.MediaCodec
    val docs = Tables.documents(spark, sf)
    val out = MediaCodec.mediaDecode(docs).cache()
    assert(out.count() === docs.count(), "one verdict row per document")
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    rows.foreach { case (id, (container, w, h, err)) =>
      if (id % 17 == 0) {
        assert(container === "corrupt" && w === -1L && err === "truncated_header", s"doc $id")
      } else if (id % 3 == 0 && id % 23 == 0) {
        assert(container === "corrupt" && err === "bad_crc", s"doc $id")
      } else {
        assert(err === "", s"doc $id unexpectedly quarantined: $err")
        assert(container === Seq("png", "jpeg", "gif")((id % 3).toInt), s"doc $id")
        assert(w === 1L + (id * 7 + 3) % 512, s"doc $id width")
        assert(h === 1L + (id * 13 + 5) % 512, s"doc $id height")
      }
    }
    assert(rows.values.exists(_._4 == "truncated_header"), "no truncated plant in corpus")
    assert(rows.values.exists(_._4 == "bad_crc"), "no bad-crc plant in corpus")
  }

  test("parseWav: hand-built literal stream — sign extension, pad byte, LE fields") {
    import graft.mm.MediaCodec
    // one channel, 4 Hz, two frames: -32768 and -1 — the two values a
    // sign-extension or endianness slip mangles first. Only the
    // decoder runs against these bytes (the symmetric-bug defense).
    val wav = MediaCodec.buildWav(1, 4L, 2, {
      case (0, _) => -32768
      case _ => -1
    })
    val info = MediaCodec.parseWav(wav).fold(e => fail(s"parse failed: $e"), identity)
    assert(info.channels === 1L)
    assert(info.sampleRateHz === 4L)
    assert(info.nFrames === 2L)
    assert(info.durationMs === 500L) // 2 frames / 4 Hz
    assert(info.sumAbs === 32768L + 1L)
    assert(info.peakAbs === 32768L)
    // the builder's JUNK chunk is odd-sized: byte 12.. is "JUNK", size 7 —
    // the successful parse above PROVES the pad byte was honored (without
    // it the walk lands mid-chunk and fmt is never found)
    assert(new String(wav, 12, 4, "US-ASCII") === "JUNK")
    assert((wav(16) & 0xff) === 7)
  }

  test("parseWav: total on malformed bytes — every corruption quarantines as a value") {
    import graft.mm.MediaCodec
    val good = MediaCodec.buildWav(2, 8000L, 3, (f, c) => f * 2 + c)
    assert(MediaCodec.parseWav(good.take(9)) === Left("truncated_header"))
    assert(MediaCodec.parseWav("RIFX1234WAVE".getBytes) === Left("not_riff"))
    assert(MediaCodec.parseWav("RIFF1234WAVX".getBytes) === Left("not_wave"))
    // chop the final sample byte: the data chunk's size field now
    // overruns the payload — the walk must fail loudly, not read junk
    assert(MediaCodec.parseWav(good.take(good.length - 1)) === Left("truncated_chunk"))
    assert(MediaCodec.parseWav(
      MediaCodec.buildWav(1, 8000L, 2, (_, _) => 0, fmtCode = 3)) ===
      Left("unsupported_encoding"))
    assert(MediaCodec.parseWav(
      MediaCodec.buildWav(1, 8000L, 2, (_, _) => 0, includeData = false)) ===
      Left("missing_data"))
    // garbage never throws
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { n =>
      val bytes = Array.fill(n)(rnd.nextInt().toByte)
      MediaCodec.parseWav(bytes) // must return a value, any value
    }
  }

  test("q_media_wav: planted samples come back through the REAL decode") {
    import graft.mm.MediaCodec
    val docs = Tables.documents(spark, sf)
    val out = MediaCodec.mediaWav(docs).cache()
    assert(out.count() === docs.count(), "one row per document")
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getString(7)))).toMap
    rows.foreach { case (id, (ch, rate, nf, dur, sumAbs, peak, err)) =>
      if (id % 13 == 0) assert(err === "truncated_header" && ch === -1L, s"doc $id")
      else if (id % 29 == 0) assert(err === "unsupported_encoding", s"doc $id")
      else if (id % 31 == 0) assert(err === "missing_data", s"doc $id")
      else {
        assert(err === "", s"doc $id unexpectedly quarantined: $err")
        val (ech, erate, enf) = (1 + id % 2, 8000 + 1000 * (id % 4), 40 + id % 61)
        assert((ch, rate, nf) === ((ech, erate, enf)), s"doc $id header fields")
        assert(dur === enf * 1000 / erate, s"doc $id duration")
        var (esum, epeak) = (0L, 0L)
        for (f <- 0 until enf.toInt; c <- 0 until ech.toInt) {
          val a = math.abs(math.floorMod(id * 31 + f * 17 + c * 1009, 65536L) - 32768L)
          esum += a; if (a > epeak) epeak = a
        }
        assert((sumAbs, peak) === ((esum, epeak)), s"doc $id sample stats")
      }
    }
    assert(rows.values.exists(_._7 == "unsupported_encoding"), "no fmt plant in corpus")
    assert(rows.values.exists(_._7 == "missing_data"), "no missing-data plant in corpus")
  }

  test("parseGifFrames: hand-built stream with a LOCAL color table and a skipped extension") {
    import graft.mm.MediaCodec
    // built byte-by-byte, not via buildGifAnim — only the walker runs
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](5, 0)) // screen w = 5 (LE)
    out.write(Array[Byte](3, 0)) // screen h = 3
    out.write(0x80 | 0x01) // GCT present, size bits 1 => 4 entries, 12 bytes
    out.write(0); out.write(0)
    out.write(new Array[Byte](12)) // GCT
    out.write(0x21); out.write(0xff); out.write(2) // application ext
    out.write(Array[Byte](1, 2)); out.write(0) // 2-byte sub-block + term
    out.write(0x21); out.write(0xf9); out.write(4) // GCE, delay 300 cs
    out.write(0); out.write(Array[Byte](0x2c, 1)); out.write(0); out.write(0)
    out.write(0x2c) // image descriptor
    out.write(Array[Byte](0, 0, 0, 0)) // left, top
    out.write(Array[Byte](7, 0, 2, 0)) // 7 x 2 (LE)
    out.write(0x80 | 0x02) // LOCAL color table: size bits 2 => 8 entries, 24 bytes
    out.write(new Array[Byte](24))
    out.write(3) // LZW min code size
    out.write(2); out.write(Array[Byte](9, 9)); out.write(0) // one sub-block
    out.write(0x3b)
    val g = MediaCodec.parseGifFrames(out.toByteArray)
      .fold(e => fail(s"parse failed: $e"), identity)
    assert(g.screenW === 5L && g.screenH === 3L)
    assert(g.nFrames === 1L)
    assert(g.totalDelayCs === 0x12c.toLong) // LE 0x2c, 0x01 = 300
    assert(g.maxFrameW === 7L && g.maxFrameH === 2L)
  }

  test("q_media_gif_frames: planted animation comes back through the REAL block walk") {
    import graft.mm.MediaCodec
    val docs = Tables.documents(spark, sf)
    val out = MediaCodec.mediaGifFrames(docs).cache()
    assert(out.count() === docs.count(), "one row per document")
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getString(7)))).toMap
    rows.foreach { case (id, (sw, sh, nf, delay, mw, mh, err)) =>
      if (id % 13 == 0) assert(err === "truncated_block" && nf === -1L, s"doc $id")
      else if (id % 23 == 0) assert(err === "bad_block_intro", s"doc $id")
      else {
        assert(err === "", s"doc $id unexpectedly quarantined: $err")
        assert(sw === 1 + (id * 7 + 3) % 512 && sh === 1 + (id * 13 + 5) % 512, s"doc $id screen")
        val enf = 1 + id % 7
        assert(nf === enf, s"doc $id frame count")
        var (edelay, emw, emh) = (0L, 0L, 0L)
        for (f <- 0 until enf.toInt) {
          edelay += 2 + (id * 5 + f * 3) % 30
          emw = math.max(emw, 1 + (id * 3 + f) % 64)
          emh = math.max(emh, 1 + (id * 11 + f * 5) % 48)
        }
        assert((delay, mw, mh) === ((edelay, emw, emh)), s"doc $id frame stats")
      }
    }
    assert(rows.values.exists(_._7 == "truncated_block"), "no truncation plant in corpus")
    assert(rows.values.exists(_._7 == "bad_block_intro"), "no intro plant in corpus")
    // garbage never throws
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { n =>
      MediaCodec.parseGifFrames(Array.fill(n)(rnd.nextInt().toByte))
    }
  }
}
