package graft.dedup

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the store-side Bloom membership filter — the
  * [[graft.sim.PqIndex]] discipline applied to the exact-dup screen:
  * a 100 TB store builds its content-hash filter ONCE (one map-side
  * pass, [[graft.functions.BloomBuild]]) and SHIPS the bytes to every
  * ingest worker forever after; rebuilding it per landed batch would
  * re-scan the store for no reason.
  *
  * Layout under `dir`:
  *   - `filter.bin`   the self-describing filter bytes exactly as the
  *                    aggregate emits them (4-byte hash-count header +
  *                    bit array) — bitsPerKey·n/8 bytes, the bounded
  *                    artifact.
  *   - `meta.json`    n_keys / bits / num_hashes for operators and
  *                    humans sizing FP expectations.
  *
  * The filter is byte-deterministic for a given store (OR-merge is
  * order-independent), so write→read→probe is provably IDENTICAL to
  * the in-session screen — DedupSpec pins it. A corrupt (empty /
  * truncated-header) filter fails loudly. No append: adding keys to a
  * Bloom filter is an OR of the new keys' filter built at the SAME
  * (bits, hashes) — [[append]] does exactly that, and since OR is the
  * merge operation the result equals a one-shot build over the union
  * (pinned in DedupSpec).
  */
object BloomIndex {

  /** Build the filter over `keys` (a 1-column LONG frame of pre-hashed
    * content hashes) and persist it.
    */
  def write(
      keys: DataFrame, dir: String, bitsPerKey: Int = 10, numHashes: Int = 7): Unit = {
    require(bitsPerKey >= 1 && numHashes >= 1)
    val n = keys.count()
    val rawBits = math.max(64L, bitsPerKey.toLong * n)
    require(rawBits <= Int.MaxValue - 8,
      s"bloom filter of $rawBits bits exceeds the single-filter limit; shard by key range")
    val bits = (((rawBits + 7) / 8) * 8).toInt
    val kc = keys.columns.head
    val filter = keys
      .agg(graft.functions.GraftFunctions.bloomBuild(col(kc), bits, numHashes).as("f"))
      .head().getAs[Array[Byte]](0)
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "filter.bin"), filter)
    Files.write(Paths.get(dir, "meta.json"),
      s"""{"n_keys": $n, "bits": $bits, "num_hashes": $numHashes}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Read the filter bytes back; fails loudly on a missing or
    * header-only (truncated) filter.
    */
  def read(dir: String): Array[Byte] = {
    val p = Paths.get(dir, "filter.bin")
    require(Files.exists(p), s"no Bloom filter at $dir: filter.bin missing")
    val bytes = Files.readAllBytes(p)
    require(bytes.length > 4,
      s"corrupt Bloom filter at $dir: ${bytes.length} bytes is header-only")
    bytes
  }

  /** OR a batch of NEW keys into the persisted filter — the no-retrain
    * append: the batch's filter is built at the persisted geometry
    * (same bits, same hash count, read from the artifact itself) and
    * OR-merged in; because OR IS the aggregate's merge, the result is
    * byte-equal to a one-shot build over store ∪ batch.
    */
  def append(batchKeys: DataFrame, dir: String): Unit = {
    val existing = read(dir)
    val numHashes = ((existing(0) & 0xff) << 24) | ((existing(1) & 0xff) << 16) |
      ((existing(2) & 0xff) << 8) | (existing(3) & 0xff)
    val bits = (existing.length - 4) * 8
    val kc = batchKeys.columns.head
    val add = batchKeys
      .agg(graft.functions.GraftFunctions.bloomBuild(col(kc), bits, numHashes).as("f"))
      .head().getAs[Array[Byte]](0)
    val merged = existing.clone()
    var i = 4
    while (i < merged.length) { merged(i) = (merged(i) | add(i)).toByte; i += 1 }
    Files.write(Paths.get(dir, "filter.bin"), merged)
  }

  /** Probe `keys` (1-column LONG frame) against the persisted filter:
    * (key, bloom_hit). The screen half of the shipped-filter
    * lifecycle.
    */
  def probe(spark: SparkSession, keys: DataFrame, dir: String): DataFrame = {
    val filter = read(dir)
    val kc = keys.columns.head
    keys.select(col(kc),
      when(graft.functions.GraftFunctions.bloomMightContain(lit(filter), col(kc)),
        lit(1L)).otherwise(lit(0L)).as("bloom_hit"))
  }
}
