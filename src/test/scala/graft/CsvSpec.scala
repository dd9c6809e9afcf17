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
}
