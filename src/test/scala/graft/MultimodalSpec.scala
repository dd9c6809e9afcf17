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
}
