package graft.sources

import org.apache.spark.sql.SparkSession

/** Bench-side prewarm for the per-JVM [[Scratch]] exports behind the
  * ingestion round-trip gates (q_csv_clean / q_orc_clean /
  * q_avro_clean / q_jsonl_ingest / q_partition_prune).
  *
  * Each gate's first run in a JVM pays a one-off export (parquet →
  * CSV/ORC/Avro/JSONL/partitioned-parquet) inside [[Scratch]]; without
  * this prewarm that export lands INSIDE the first consumer's
  * per-query bench timing — the same accounting problem the memoized
  * dedup/ANN seams solved with the itemized `build` line
  * ([[Bucketing.prewarm]] is the template). Forcing the exports here
  * makes the gate queries time what they claim to: the foreign-format
  * scan + standardization, not the harness's own setup write. The
  * query RESULTS are untouched — [[Scratch.materialize]] is
  * per-(kind, dir)-idempotent, so the gates read the identical files
  * either way.
  */
object Sources {

  /** Force all five scratch exports for `dir`, returning an itemized
    * (export, seconds) per build for the bench's `build` line.
    */
  def prewarm(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      out += name -> ((System.nanoTime() - t0) / 1e9)
    }
    // the viaX entries run their export eagerly (inside materialize)
    // and only PLAN the read-back, so each timing is the export cost
    timed("scratch_csv_lineitem") { Csv.lineitemViaCsv(spark, dir); () }
    timed("scratch_orc_lineitem") { Orc.lineitemViaOrc(spark, dir); () }
    timed("scratch_avro_lineitem") { Avro.lineitemViaAvro(spark, dir); () }
    timed("scratch_jsonl_documents") { Jsonl.documentsViaJsonl(spark, dir); () }
    timed("scratch_events_by_day") { Partitioned.eventsViaPartitioned(spark, dir); () }
    timed("scratch_compacted_events") { Compact.eventsViaCompacted(spark, dir); () }
    out.toSeq
  }
}
