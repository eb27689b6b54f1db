package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

// test-scope QA tool: sbt "Test/runMain graft.operators.PlanDump <sfDir> q1 q2 …"
// Prints the formatted physical plan of each named SparkEntry query.
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.adhesive.AdhesiveSparkExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n ===")
      println(graft.SparkEntry.queries(n)(spark, d)
        .queryExecution.explainString(FormattedMode))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
