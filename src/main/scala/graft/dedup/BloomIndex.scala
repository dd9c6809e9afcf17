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
    // Keep n_keys honest across appends (insertion count, the standard
    // Bloom accounting), preserving the written geometry fields.
    val metaPath = Paths.get(dir, "meta.json")
    if (Files.exists(metaPath)) {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8))
      val nKeys = node.get("n_keys").asLong() + batchKeys.count()
      Files.write(metaPath,
        s"""{"n_keys": $nKeys, "bits": $bits, "num_hashes": $numHashes}"""
          .getBytes(StandardCharsets.UTF_8))
    }
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

  // ------------------------------------------------------------------
  // Sharded layout — the 100 TB form the single-filter limit points
  // at: a store beyond ~1.7e9 keys at 10 bits/key cannot live in one
  // JVM byte array (or one driver literal), so the filter SHARDS by
  // key residue — nShards independent filters, each bounded, built in
  // the SAME one map-side aggregate pass (groupBy(shard) instead of a
  // global agg) and persisted as a (shard, filter) parquet. The probe
  // becomes a shard-keyed EQUI-JOIN: each task carries only its
  // shard's filter bytes, so neither the driver nor any executor ever
  // holds the whole filter — the routing a production membership
  // service runs.
  // ------------------------------------------------------------------

  /** Build the sharded filter over `keys` (1-column LONG frame) —
    * uniform per-shard geometry sized from the mean shard load (keys
    * are hash values, so residue shards are balanced by construction).
    */
  def writeSharded(
      keys: DataFrame, dir: String, nShards: Int = 64,
      bitsPerKey: Int = 10, numHashes: Int = 7): Unit = {
    require(nShards >= 1 && bitsPerKey >= 1 && numHashes >= 1)
    val n = keys.count()
    val perShard = (n + nShards - 1) / math.max(nShards, 1)
    val rawBits = math.max(64L, bitsPerKey.toLong * perShard)
    require(rawBits <= Int.MaxValue - 8,
      s"bloom shard of $rawBits bits exceeds the single-filter limit; raise nShards")
    val bits = (((rawBits + 7) / 8) * 8).toInt
    val kc = keys.columns.head
    keys
      .groupBy(pmod(col(kc), lit(nShards.toLong)).as("shard"))
      .agg(graft.functions.GraftFunctions.bloomBuild(col(kc), bits, numHashes).as("filter"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/shards")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "meta.json"),
      s"""{"n_keys": $n, "n_shards": $nShards, "bits": $bits, "num_hashes": $numHashes}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Probe `keys` against the sharded filter: (key, bloom_hit). Keys
    * route to their shard's filter through one equi-join — a key whose
    * shard has no filter row (an empty store residue) is definitively
    * absent. Per-key verdicts are IDENTICAL in distribution to a
    * single filter at the same per-key geometry; members never miss
    * (pinned in DedupSpec alongside the FP ceiling).
    */
  def probeSharded(spark: SparkSession, keys: DataFrame, dir: String): DataFrame = {
    val meta = new String(Files.readAllBytes(Paths.get(dir, "meta.json")),
      StandardCharsets.UTF_8)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(meta)
    val nShards = node.get("n_shards").asInt()
    require(nShards >= 1, s"corrupt sharded Bloom index at $dir: n_shards $nShards")
    val filters = spark.read.parquet(s"$dir/shards")
      .select(col("shard").as("__bloom_shard"), col("filter").as("__bloom_filter"))
    val kc = keys.columns.head
    // The key routes through internal column names so a caller whose key
    // column is itself named "shard" or "filter" cannot be silently
    // shadowed into probing the wrong value.
    keys
      .select(col(kc).as("__bloom_key"))
      .withColumn("__bloom_shard", pmod(col("__bloom_key"), lit(nShards.toLong)))
      .join(filters, Seq("__bloom_shard"), "left")
      .select(col("__bloom_key").as(kc),
        when(col("__bloom_filter").isNotNull &&
          graft.functions.GraftFunctions.bloomMightContain(col("__bloom_filter"), col("__bloom_key")),
          lit(1L)).otherwise(lit(0L)).as("bloom_hit"))
  }

  /** OR a batch of new keys into the sharded filter — per-shard
    * no-retrain append at the persisted geometry. Shards are bounded
    * by design, so the per-shard OR streams through the driver one
    * shard at a time (at true scale the same merge runs as a
    * shard-keyed join; OR is the aggregate's merge either way, so the
    * result equals a one-shot build over the union — pinned).
    */
  def appendSharded(spark: SparkSession, batchKeys: DataFrame, dir: String): Unit = {
    val meta = new String(Files.readAllBytes(Paths.get(dir, "meta.json")),
      StandardCharsets.UTF_8)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(meta)
    val nShards = node.get("n_shards").asInt()
    val bits = node.get("bits").asInt()
    val numHashes = node.get("num_hashes").asInt()
    val nKeys = node.get("n_keys").asLong()
    val kc = batchKeys.columns.head
    val nBatch = batchKeys.count()
    val add = batchKeys
      .groupBy(pmod(col(kc), lit(nShards.toLong)).as("shard"))
      .agg(graft.functions.GraftFunctions.bloomBuild(col(kc), bits, numHashes).as("filter"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val existing = spark.read.parquet(s"$dir/shards")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val merged = (existing.keySet ++ add.keySet).toSeq.sorted.map { s =>
      (existing.get(s), add.get(s)) match {
        case (Some(a), Some(b)) =>
          require(a.length == b.length,
            s"corrupt sharded Bloom index at $dir: shard $s filter lengths " +
              s"${a.length} != ${b.length} (shards written at a different geometry " +
              "than meta.json records)")
          val m = a.clone()
          var i = 4
          while (i < m.length) { m(i) = (m(i) | b(i)).toByte; i += 1 }
          s -> m
        case (Some(a), None) => s -> a
        case (None, Some(b)) => s -> b
        case _ => sys.error("unreachable")
      }
    }
    import spark.implicits._
    // Write the merged shards BESIDE the live copy, then swap, so a
    // crash mid-write never destroys the only copy of the index: the
    // live dir is replaced only after the replacement is fully written.
    val tmp = s"$dir/shards_tmp"
    merged.toDF("shard", "filter")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    deleteRecursively(Paths.get(dir, "shards"))
    Files.move(Paths.get(tmp), Paths.get(dir, "shards"))
    // n_keys counts insertions (an upper bound on distinct stored keys,
    // like any Bloom accounting) — refreshed so sizing math stays honest
    // after appends.
    Files.write(Paths.get(dir, "meta.json"),
      s"""{"n_keys": ${nKeys + nBatch}, "n_shards": $nShards, "bits": $bits, "num_hashes": $numHashes}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.delete(f))
      } finally stream.close()
    }
  }
}
