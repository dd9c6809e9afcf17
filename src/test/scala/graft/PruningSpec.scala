package graft

/** Column-pruning regression net: the projection a query needs must
  * reach the parquet reader's ReadSchema — a scan that reads all
  * columns for a narrow aggregate multiplies 100 TB I/O by the width
  * ratio. These assertions pin the pruned scan shape for
  * representative queries over each wide table, so a refactor that
  * accidentally materializes the full row (e.g. a select("*") or an
  * opaque closure) fails here instead of surfacing as a scan-volume
  * regression on a cluster.
  */
class PruningSpec extends SparkSpec {

  /** Column-name sets of every parquet ReadSchema in the plan. The
    * metadata string length is raised first: the default 100-char
    * truncation silently drops ReadSchema tails on wide tables, which
    * would make a "forbidden column absent" assertion pass vacuously.
    */
  private def readSchemas(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val plan = planOf(df)
    val found = "ReadSchema: struct<([^>\n]*)>".r.findAllMatchIn(plan)
      .map(_.group(1).split(",").map(_.split(":")(0).trim).filter(_.nonEmpty).toSet)
      .toSeq
    assert(!plan.contains("... "), s"truncated plan metadata despite raised limit")
    found
  }

  test("q_pricing_summary scan reads only the five aggregated lineitem columns") {
    val schemas = readSchemas(SparkEntry.queries("q_pricing_summary")(spark, sf))
    assert(schemas.nonEmpty, "expected a parquet scan in the plan")
    assert(schemas.head === Set(
      "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus"),
      s"lineitem scan not pruned: ${schemas.head}")
  }

  test("q_token_stats scan never reads lang/source/n_chars") {
    val schemas = readSchemas(SparkEntry.queries("q_token_stats")(spark, sf))
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(s === Set("doc_id", "text"), s"documents scan not pruned: $s")
    }
  }

  test("q_token_entropy scan reads only (lang, text)") {
    val schemas = readSchemas(SparkEntry.queries("q_token_entropy")(spark, sf))
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(s === Set("lang", "text"), s"documents scan not pruned: $s")
    }
  }

  test("q_order_rollup lineitem scan reads exactly the rollup's five columns") {
    val schemas = readSchemas(SparkEntry.queries("q_order_rollup")(spark, sf))
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(s === Set("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"),
        s"lineitem scan not pruned: $s")
    }
  }

  test("q_knn_brute embedding scans never read the label column") {
    // bruteKnnCached may already hold a checkpointed result (memo) —
    // build the un-memoized operator directly for the plan property
    val schemas = readSchemas(
      graft.sim.Similarity.bruteKnn(Tables.embeddings(spark, sf)))
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(s === Set("vec_id", "embedding"), s"embeddings scan not pruned: $s")
    }
  }

  test("q_stream_hourly events scan never reads the props map") {
    val schemas = readSchemas(SparkEntry.queries("q_stream_hourly")(spark, sf))
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(!s.contains("props"), s"events scan reads the wide props map: $s")
    }
  }
}
