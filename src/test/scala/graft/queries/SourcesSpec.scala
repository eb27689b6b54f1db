package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink formats beyond parquet: csv and json round-trips preserve
  * the data (the reference links DataFusion's csv/json readers without
  * exercising them — SURVEY §2b row 1; here they're exercised).
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv and json round-trips preserve nation") {
    val n = Tables.nation(spark, TestSpark.sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-src").toString

    n.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val fromCsv = spark.read.option("header", "true")
      .schema(n.schema).csv(s"$tmp/nation_csv")
    assert(fromCsv.collect().map(_.toSeq).toSet == n.collect().map(_.toSeq).toSet)

    n.write.mode("overwrite").json(s"$tmp/nation_json")
    val fromJson = spark.read.schema(n.schema).json(s"$tmp/nation_json")
    assert(fromJson.collect().map(_.toSeq).toSet == n.collect().map(_.toSeq).toSet)

    n.write.mode("overwrite").orc(s"$tmp/nation_orc")
    val fromOrc = spark.read.orc(s"$tmp/nation_orc")
    assert(fromOrc.collect().map(_.toSeq).toSet == n.collect().map(_.toSeq).toSet)
  }

  test("binaryFile source reads opaque blobs with path/length metadata") {
    // the multimodal ingestion path: raw image/audio files land as binary
    // rows (content + metadata), then flow through the mm_* operators
    val tmp = java.nio.file.Files.createTempDirectory("graft-bin")
    val payload = Array.tabulate[Byte](256)(_.toByte)
    java.nio.file.Files.write(tmp.resolve("blob-a.bin"), payload)
    java.nio.file.Files.write(tmp.resolve("blob-b.bin"), payload.take(100))
    val df = spark.read.format("binaryFile").load(tmp.toString)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val byName = df.collect()
      .map(r => r.getAs[String]("path").split('/').last ->
        r.getAs[Array[Byte]]("content")).toMap
    assert(byName("blob-a.bin").sameElements(payload))
    assert(byName("blob-b.bin").length == 100)
    // pathGlobFilter prunes at listing time (no data read for skipped files)
    assert(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*-a.bin").load(tmp.toString).count() == 1)
  }

  test("text source reads one row per line; lineSep-free wholetext mode") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-txt")
    java.nio.file.Files.write(tmp.resolve("doc.txt"),
      "alpha\nbeta\ngamma\n".getBytes("UTF-8"))
    assert(spark.read.text(tmp.toString).count() == 3)
    val whole = spark.read.option("wholetext", "true").text(tmp.toString)
    assert(whole.collect().head.getString(0) == "alpha\nbeta\ngamma\n")
  }

  test("partitioned parquet write prunes partitions on read") {
    val o = Tables.orders(spark, TestSpark.sfDir)
      .withColumn("o_year", org.apache.spark.sql.functions.year($"o_orderdate"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    o.write.mode("overwrite").partitionBy("o_year").parquet(s"$tmp/orders_part")

    val pruned = spark.read.parquet(s"$tmp/orders_part").filter($"o_year" === 1996)
    val expected = o.filter($"o_year" === 1996).count()
    assert(pruned.count() == expected)
    // partition pruning: the scan should read only the 1996 directory
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("o_year"), s"expected partition filter in scan:\n$scan")
  }
}
