package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media assets as opaque `binary`
  * payloads plus typed metadata, with decode / frame-sampling
  * operators.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB: metadata fields are derived from the payload
  * bytes with integer arithmetic (exactly reproducible in the DuckDB
  * oracle). Everything around the stub — the binary column, the
  * schema, the explode-based frame sampling, the partitioning story —
  * is the real Spark plumbing a production pipeline would keep. To
  * plug in a real decoder, replace [[decodedMeta]]'s arithmetic with a
  * `mapPartitions` over the payload bytes (JVM codec) or a
  * `mapInPandas`-style batch UDF (Python codec); the output schema is
  * already what such a decoder produces.
  */
object Multimodal {

  /** Synthesize the media table from `documents`: every doc becomes an
    * asset whose payload is its UTF-8 bytes and whose modality cycles
    * deterministically through image/audio/video.
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      col("text").cast("binary").as("payload"))

  /** Decode-stub metadata: width/height/duration derived from byte
    * length + id with pure integer arithmetic (THE seam a real codec
    * replaces), content id = md5 of the payload.
    */
  private def decodedMeta(df: DataFrame): DataFrame =
    df
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("content_id", md5(col("payload")))
      .withColumn("width", lit(160L) + pmod(col("doc_id") * 7 + col("n_bytes"), lit(1760L)))
      .withColumn("height", lit(90L) + pmod(col("doc_id") * 13 + col("n_bytes") * 3, lit(990L)))
      .withColumn("duration_ms", lit(500L) + pmod(col("n_bytes") * 37, lit(59500L)))

  /** q30: per-asset metadata extraction (bytes -> format/dims/id). */
  def mediaMeta(documents: DataFrame): DataFrame =
    decodedMeta(mediaTable(documents))
      .select(col("doc_id"), col("format"), col("n_bytes"), col("content_id"),
        col("width"), col("height"), col("duration_ms"))

  def sqlMediaMeta: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS format,
      |    encode(text) AS payload,
      |    md5(text) AS content_id
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, format,
      |    CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      |    content_id
      |  FROM m
      |)
      |SELECT doc_id, format, n_bytes, content_id,
      |  160 + (doc_id * 7 + n_bytes) % 1760 AS width,
      |  90 + (doc_id * 13 + n_bytes * 3) % 990 AS height,
      |  500 + (n_bytes * 37) % 59500 AS duration_ms
      |FROM d""".stripMargin

  /** q31: frame-sampling plumbing — one row per sampled frame of every
    * video asset (1 fps), frame ids content-derived. The explode runs
    * inside the scan stage (no shuffle); at 100 TB the frame fan-out
    * is the classic row-multiplier you want BEFORE the expensive
    * per-frame work so it parallelizes, which is exactly this shape.
    */
  def mediaFrames(documents: DataFrame): DataFrame =
    decodedMeta(mediaTable(documents))
      .filter(col("format") === "video")
      .withColumn("n_frames", lit(1L) + (col("duration_ms") / 1000L).cast("long"))
      .select(col("doc_id"), col("content_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("frame_idx") * 1000L).as("ts_ms"),
        md5(concat(col("content_id"), lit(":"), col("frame_idx").cast("string"))).as("frame_id"))

  /** q_media_resize: resize planning for image/video assets — the
    * target geometry every thumbnailing/normalization stage needs:
    * fit each asset into a `box`×`box` square preserving aspect ratio,
    * never upscaling. All arithmetic is INTEGER (scaled by 10^6 with
    * floor division) so the computed output dimensions are
    * bit-identical in the oracle — float scale factors would round
    * differently at the boundary. The actual pixel resampling is the
    * codec-stub seam (same contract as [[decodedMeta]]): a real
    * implementation keeps exactly this plan — dims scan-side, the
    * per-asset byte work in a `mapPartitions`/`mapInPandas` batch —
    * and swaps the stub for the codec call.
    */
  def mediaResize(documents: DataFrame, box: Long = 224L): DataFrame = {
    val scaled = decodedMeta(mediaTable(documents))
      .filter(col("format").isin("image", "video"))
      // scale = min(box/w, box/h, 1) in millionths; DIV (integer floor
      // division — `/` on longs is DOUBLE division in Spark SQL)
      .withColumn("scale_ppm",
        least(expr(s"${box * 1000000L}L DIV width"),
          expr(s"${box * 1000000L}L DIV height"), lit(1000000L)))
    scaled.select(
      col("doc_id"), col("format"), col("width"), col("height"),
      expr("(width * scale_ppm) DIV 1000000").as("out_w"),
      expr("(height * scale_ppm) DIV 1000000").as("out_h"),
      col("scale_ppm"))
  }

  def sqlMediaResize(box: Long = 224L): String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS format,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents
       |), d AS (
       |  SELECT doc_id, format,
       |    160 + (doc_id * 7 + n_bytes) % 1760 AS width,
       |    90 + (doc_id * 13 + n_bytes * 3) % 990 AS height
       |  FROM m WHERE format IN ('image', 'video')
       |), s AS (
       |  SELECT *, least((${box * 1000000L}) // width, (${box * 1000000L}) // height, 1000000) AS scale_ppm
       |  FROM d
       |)
       |SELECT doc_id, format, width, height,
       |  (width * scale_ppm) // 1000000 AS out_w,
       |  (height * scale_ppm) // 1000000 AS out_h,
       |  scale_ppm
       |FROM s""".stripMargin

  // ------------------------------------------------------------------
  // Batched codec seam (mapPartitions).
  // ------------------------------------------------------------------
  final case class MediaAsset(doc_id: Long, format: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long,
      embedding: Array[Float], batch_size: Int)

  /** The imperative codec seam: typed `mapPartitions` over asset rows,
    * decoding in BATCHES of `batchSize` — the JVM analog of a
    * `mapInPandas` Arrow-batch UDF. Real codecs amortize per-batch
    * setup (model load, codec context) across the batch; the batch
    * loop, the typed schema in and out, and the recorded batch_size
    * (so tests pin the batch shape) are the production plumbing. The
    * DECODER ITSELF IS THE STUB: a deterministic 16-bin normalized
    * byte histogram stands in for the real feature extractor —
    * [[decodeBatch]] is the only function a real codec replaces.
    *
    * Scale shape: mapPartitions keeps rows streaming (only one batch
    * is materialized at a time), inherits the scan's partitioning, and
    * shuffles nothing.
    */
  def decodeFeatures(documents: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = documents.sparkSession
    import spark.implicits._
    mediaTable(documents).as[MediaAsset].mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  /** One batched "codec" call — per-batch init would live here. A
    * null payload (null source text) decodes like an empty asset
    * instead of NPE-ing the partition, matching how the expression
    * operators propagate nulls.
    */
  private[mm] def decodeBatch(batch: Seq[MediaAsset]): Seq[MediaFeatures] = {
    val bs = batch.size
    batch.map { a =>
      val bytes = if (a.payload == null) Array.emptyByteArray else a.payload
      val hist = new Array[Float](16)
      bytes.foreach(b => hist((b & 0xff) % 16) += 1f)
      val n = math.max(bytes.length, 1).toFloat
      MediaFeatures(a.doc_id, a.format, bytes.length.toLong, hist.map(_ / n), bs)
    }
  }

  /** q_media_features: the batched-decode query (rows-only gate — a
    * mapPartitions pipeline has no SQL twin; MultimodalSpec recomputes
    * the histogram directly and asserts equality).
    *
    * The driver gate canonicalizes results by sorting every column, so
    * the raw `array<float>` embedding is projected to a stable string
    * signature (6-dp components, comma-joined) — the typed embedding
    * stays on [[decodeFeatures]] for library callers.
    */
  def mediaFeatures(documents: DataFrame): DataFrame =
    decodeFeatures(documents).toDF()
      .withColumn("embedding_sig",
        concat_ws(",",
          expr("transform(embedding, x -> format_string('%.6f', CAST(x AS DOUBLE)))")))
      .drop("embedding")

  def sqlMediaFrames: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS format,
      |    encode(text) AS payload,
      |    md5(text) AS content_id
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, format,
      |    CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      |    content_id
      |  FROM m
      |), v AS (
      |  SELECT doc_id, content_id,
      |    1 + (500 + (n_bytes * 37) % 59500) // 1000 AS n_frames
      |  FROM d WHERE format = 'video'
      |), f AS (
      |  SELECT doc_id, content_id, unnest(range(0, n_frames)) AS frame_idx FROM v
      |)
      |SELECT doc_id, frame_idx, frame_idx * 1000 AS ts_ms,
      |  md5(content_id || ':' || CAST(frame_idx AS VARCHAR)) AS frame_id
      |FROM f""".stripMargin
}
