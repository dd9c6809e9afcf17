package graft.sources

import scala.collection.concurrent.TrieMap

/** Per-JVM scratch materializations for the round-trip ingestion
  * gates (parquet → CSV/JSONL → read back): one export per
  * (kind, data directory) per JVM, under a per-JVM root that a
  * shutdown hook reclaims.
  *
  * Scratch paths are per-JVM on purpose: the TrieMap only guards THIS
  * process, and two JVMs (a bench run next to a test run) sharing one
  * fixed /tmp path would race an overwrite against a read. The
  * directory key is an md5 of the FULL dir string — a character-class
  * sanitization (`replaceAll("[^A-Za-z0-9._-]", "_")`) would map
  * distinct dirs like `/data/x` and `/data_x` to the same scratch
  * path and silently serve one dir's export for the other.
  */
private[sources] object Scratch {
  private val exported = TrieMap.empty[String, String]
  private val jvmId = java.util.UUID.randomUUID().toString.take(8)

  private lazy val root: String = {
    val r = System.getProperty("java.io.tmpdir") + s"/graft_scratch/$jvmId"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(r))
    }))
    r
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The scratch path for (kind, dir), running `write` into it exactly
    * once per JVM. Synchronized: TrieMap.getOrElseUpdate evaluates the
    * thunk OUTSIDE its atomic insert, so two concurrent first callers
    * would otherwise race overlapping overwrite-writes into the same
    * path (writes are rare one-offs; a coarse lock is fine).
    */
  def materialize(kind: String, dir: String)(write: String => Unit): String =
    exported.synchronized {
      exported.getOrElseUpdate(s"$kind|$dir", {
        val out = s"$root/$kind/${md5hex(dir)}"
        write(out)
        out
      })
    }
}
