package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of one or all
  * SparkEntry queries (args: <sfDir> [queryName]). Used to check the
  * 100-TB plan properties: pushed filters, broadcast choices, absence
  * of Expand / CartesianProduct in hot paths.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) Seq(args(1)) else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate rewrites explode(expensiveArrayExpr)
      // into a pushed-down filter that re-evaluates the array expression
      // twice more per row (10x on the dedup inverted-index paths);
      // explode already skips empty/null arrays on its own.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
