package graft

import graft.etl.Retention
import graft.sources.Csv

class CsvSpec extends SparkSpec {

  test("CSV round-trip reproduces the parquet lineitem exactly") {
    val viaCsv = Csv.lineitemViaCsv(spark, sf)
    val parquet = Tables.lineitem(spark, sf)
      .select(viaCsv.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(viaCsv.schema === parquet.schema)
    assert(viaCsv.exceptAll(parquet).isEmpty && parquet.exceptAll(viaCsv).isEmpty)
  }

  test("standardization renames raw headers and casts every mapped type") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/raw"
    Csv.writeRawLineitem(Tables.lineitem(spark, sf).limit(50), dir)
    val std = Csv.readLineitem(spark, dir)
    val types = std.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("l_orderkey") === "bigint")
    assert(types("l_linenumber") === "int")
    assert(types("l_quantity") === "double")
    assert(types("l_returnflag") === "string")
    assert(types("l_shipdate") === "timestamp_ntz")
  }

  test("cleanLines over the CSV path equals cleanLines over parquet") {
    val a = Retention.cleanLines(Csv.lineitemViaCsv(spark, sf))
    val b = Retention.cleanLines(Tables.lineitem(spark, sf))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ORC round-trip reproduces the parquet lineitem exactly, schema included") {
    val viaOrc = graft.sources.Orc.lineitemViaOrc(spark, sf)
    val parquet = Tables.lineitem(spark, sf)
      .select(viaOrc.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(viaOrc.schema === parquet.schema)
    assert(viaOrc.exceptAll(parquet).isEmpty && parquet.exceptAll(viaOrc).isEmpty)
  }

  test("JSONL round-trip reproduces the parquet documents exactly") {
    val viaJsonl = graft.sources.Jsonl.documentsViaJsonl(spark, sf)
    val parquet = Tables.documents(spark, sf)
      .select(viaJsonl.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(viaJsonl.schema === parquet.schema)
    assert(viaJsonl.exceptAll(parquet).isEmpty && parquet.exceptAll(viaJsonl).isEmpty)
  }

  test("JSONL quarantine: a malformed line surfaces in _corrupt_record, not as silent nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.json"),
      """{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}
        |{"doc_id": 2, "text": "truncated...
        |{"doc_id": 3, "text": "also good", "lang": "de", "source": "s", "n_chars": 9}
        |""".stripMargin)
    val q = graft.sources.Jsonl.readDocuments(spark, dir, quarantine = true).cache()
    val bad = q.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
    assert(bad.count() === 1)
    assert(bad.head().getString(5).startsWith("""{"doc_id": 2"""))
    val good = q.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
    assert(good.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("JSONL preserves hostile text bytes: newlines, quotes, backslashes, unicode") {
    import spark.implicits._
    val nasty = Seq(
      (0L, "line one\nline two\r\nwindows", "en", "s", 1L),
      (1L, "quotes \" and \\ backslash \t tab", "en", "s", 2L),
      (2L, "unicode: café 中文 😀 end", "zh", "s", 3L),
      (3L, null.asInstanceOf[String], "de", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/docs"
    graft.sources.Jsonl.writeDocuments(nasty, dir)
    val back = graft.sources.Jsonl.readDocuments(spark, dir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val expect = nasty.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back === expect)
  }
}
