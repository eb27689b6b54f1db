package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SQL write surface on managed parquet tables: CTAS, INSERT INTO
  * (append), INSERT OVERWRITE — the batch-materialization path a pipeline
  * uses to persist curated corpora between stages.
  */
class SqlDmlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("CTAS + INSERT INTO + INSERT OVERWRITE round-trip") {
    Catalog.registerAll(spark, TestSpark.sfDir)
    spark.sql("DROP TABLE IF EXISTS curated_nations")
    try {
      spark.sql("""CREATE TABLE curated_nations USING parquet AS
        SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 0""")
      val base = spark.table("curated_nations").count()
      assert(base > 0)

      spark.sql("""INSERT INTO curated_nations
        SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 1""")
      val appended = spark.table("curated_nations").count()
      assert(appended > base, "append must grow the table")

      spark.sql("""INSERT OVERWRITE curated_nations
        SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 2""")
      val overwritten = spark.table("curated_nations").count()
      val expected = spark.sql(
        "SELECT count(*) FROM nation WHERE n_regionkey = 2").head.getLong(0)
      assert(overwritten == expected, "overwrite must replace, not append")
    } finally spark.sql("DROP TABLE IF EXISTS curated_nations")
  }
}
