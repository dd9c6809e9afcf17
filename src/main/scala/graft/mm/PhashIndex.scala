package graft.mm

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the IMAGE near-dup store index — the
  * [[graft.dedup.ShingleIndex]]/[[graft.dedup.BloomIndex]] discipline
  * applied to the perceptual-hash screen: a 100 TB media store decodes
  * and hashes its images ONCE at index-build time; every subsequent
  * ingest batch probes the persisted band table instead of re-decoding
  * the store (the incremental contract: cost ∝ batch, store scanned
  * never rebuilt — and for images the store-side rebuild is a full
  * DECODE pass, the most expensive derivation in the library).
  *
  * Layout under `dir` (distributed parquet — the hash table at 100 TB
  * is billions of 5-long rows and lives partitioned like any table):
  *   - `hashes/`   (doc_id, b0, b1, b2, b3): one row per DECODABLE
  *                 image — the four 16-bit dHash bands. Quarantined
  *                 payloads never enter the index (they are not
  *                 images; the decode gate reported them at build).
  *   - `meta.json` n_images + the hash contract (grid geometry, band
  *                 layout) so a mismatched probe is detectable by a
  *                 human before it is wrong.
  *
  * Probe verdicts depend only on (batch image, store hash content), so
  * write → read → [[probe]] is provably row-equal to the in-session
  * [[MediaCodec.imageScreenAgainst]] — pinned in PhashSpec. [[append]]
  * row-appends the landed batch's hashes (an immutable store only
  * grows; parquet append adds files, never rewrites — crash mid-append
  * leaves the old files intact) and refreshes meta's count. Corrupt
  * layouts (missing halves, schema drift) fail loudly.
  */
object PhashIndex {

  def write(documents: DataFrame, dir: String): Unit = {
    val ph = MediaCodec.phashCached(documents).filter(col("err") === "")
      .select("doc_id", "b0", "b1", "b2", "b3")
    ph.write.mode(SaveMode.Overwrite).parquet(s"$dir/hashes")
    writeMeta(documents.sparkSession, dir)
  }

  private def writeMeta(spark: SparkSession, dir: String): Unit = {
    val n = spark.read.parquet(s"$dir/hashes").count()
    Files.createDirectories(Paths.get(dir))
    // temp-file + atomic move (the BloomIndex appendSharded
    // discipline): a crash between the hashes append and the meta
    // refresh must never leave a torn/stale meta.json alongside a
    // grown band table — readers see either the old complete meta or
    // the new complete meta
    val tmp = Paths.get(dir, ".meta.json.tmp")
    Files.write(tmp,
      (s"""{"n_images": $n, "grid": "9x8", "block": "4x4", """ +
        """"gray": "r+g+b", "bands": 4, "band_bits": 16}""")
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, "meta.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The persisted band table; loud on a missing or drifted layout. */
  def readHashes(spark: SparkSession, dir: String): DataFrame = {
    require(Files.exists(Paths.get(dir, "meta.json")),
      s"no phash index at $dir: meta.json missing")
    require(Files.exists(Paths.get(dir, "hashes")),
      s"corrupt phash index at $dir: hashes/ missing")
    val h = spark.read.parquet(s"$dir/hashes")
    require(h.columns.toSet == Set("doc_id", "b0", "b1", "b2", "b3"),
      s"corrupt phash index at $dir: hashes columns ${h.columns.mkString(",")}")
    h
  }

  /** Screen `newDocs` against the PERSISTED store hashes — the
    * [[MediaCodec.imageScreenAgainst]] contract (doc_id, decoded,
    * n_store_dups, image_keep) with the store side one columnar scan
    * of the band table instead of a decode pass.
    */
  def probe(
      spark: SparkSession, newDocs: DataFrame, dir: String, tau: Int = 2): DataFrame =
    MediaCodec.screenPhashFrames(
      MediaCodec.imagePhash(newDocs),
      readHashes(spark, dir).withColumn("err", lit("")), tau)

  /** Land a batch: append its decodable hashes, refresh the count. */
  def append(spark: SparkSession, newDocs: DataFrame, dir: String): Unit = {
    readHashes(spark, dir) // layout gate before any mutation
    MediaCodec.imagePhash(newDocs).filter(col("err") === "")
      .select("doc_id", "b0", "b1", "b2", "b3")
      .write.mode(SaveMode.Append).parquet(s"$dir/hashes")
    writeMeta(spark, dir)
  }
}
