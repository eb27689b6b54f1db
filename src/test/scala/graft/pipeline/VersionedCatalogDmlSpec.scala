package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Row-level SQL through the DataSourceV2 catalog: `DELETE FROM vt.t`
  * plans through the table's `SupportsDelete` (long boxes →
  * `deleteRange`, typed predicates → the stats-checked COW
  * `deleteWhere`), and `UPDATE` / `MERGE INTO` on catalog identifiers
  * are rewritten by [[VersionedCatalogDmlRule]] onto the SAME pinned
  * read-compute-commit commands the regex front-end runs — one DML
  * semantics on both spellings. Key columns are declared at CREATE
  * (`TBLPROPERTIES('keys'='…')`) and persisted as field metadata in
  * the manifest-stored schema.
  */
class VersionedCatalogDmlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft-cat-dml")
      .toString
    spark.conf.set("spark.sql.catalog.vtd",
      "graft.pipeline.VersionedCatalog")
    spark.conf.set("spark.sql.catalog.vtd.warehouse", w)
    w
  }

  test("DELETE via SupportsDelete: long-box fast path, typed COW path, and whole-table truncate") {
    warehouse
    spark.sql("""CREATE TABLE vtd.del (id BIGINT, lang STRING, n BIGINT)
      TBLPROPERTIES ('stats'='id,n', 'typed'='lang')""")
    spark.sql("""INSERT INTO vtd.del
      SELECT id, concat('l', id % 3) AS lang, id * 2 AS n
      FROM range(0, 100)""")
    // long box → deleteRange (one "delete" version)
    spark.sql("DELETE FROM vtd.del WHERE id >= 90")
    assert(spark.table("vtd.del").count() == 90L)
    assert(VersionedTable.history(spark, s"$warehouse/del")
      .last._3 == "delete")
    // typed string predicate → the stats-checked COW deleteWhere
    spark.sql("DELETE FROM vtd.del WHERE lang = 'l2' AND id > 80")
    assert(spark.table("vtd.del").count() ==
      90L - (81L until 90L).count(_ % 3 == 2))
    // IN-list + IS NOT NULL translate too
    spark.sql("DELETE FROM vtd.del WHERE id IN (0, 1, 2) AND lang IS NOT NULL")
    assert(spark.table("vtd.del").where("id < 3").count() == 0L)
    // no WHERE = truncate: full-range box over the first stat column
    spark.sql("DELETE FROM vtd.del")
    assert(spark.table("vtd.del").count() == 0L)
  }

  test("UPDATE and MERGE on catalog identifiers run the pinned keyed commands; keys persist in the stored schema") {
    warehouse
    spark.sql("""CREATE TABLE vtd.kv (id BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES ('stats'='id,n', 'typed'='v', 'keys'='id')""")
    assert(VersionedTable.keyColsOf(spark, s"$warehouse/kv") == Seq("id"))
    spark.sql("""INSERT INTO vtd.kv
      SELECT id, concat('v', id) AS v, id AS n FROM range(0, 50)""")
    // keys survive data writes and metadata-only evolution
    spark.sql("ALTER TABLE vtd.kv ADD COLUMNS (extra BIGINT)")
    assert(VersionedTable.keyColsOf(spark, s"$warehouse/kv") == Seq("id"))

    spark.sql("UPDATE vtd.kv SET n = n + 100, extra = id WHERE id < 10")
    val upd = spark.table("vtd.kv").where("id < 10")
      .selectExpr("sum(n)", "sum(extra)").head
    assert(upd.getLong(0) == (0L until 10L).map(_ + 100).sum)
    assert(upd.getLong(1) == (0L until 10L).sum)

    // three-clause MERGE with SET *, explicit INSERT list, BY SOURCE
    spark.sql("""SELECT id, concat('M', id) AS v, id * 10 AS n,
        CAST(NULL AS BIGINT) AS extra
      FROM range(40, 60)""").createOrReplaceTempView("kv_src")
    spark.sql("""MERGE INTO vtd.kv t USING kv_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, s.n)
      WHEN NOT MATCHED BY SOURCE AND t.id < 5 THEN DELETE""")
    val after = spark.table("vtd.kv")
    assert(after.count() == 50L - 5L + 10L) // 5 deleted, 10 inserted
    assert(after.where("id = 45").selectExpr("v", "n").head
      .toSeq == Seq("M45", 450L))
    assert(after.where("id = 55").selectExpr("v", "n").head
      .toSeq == Seq("M55", 550L))
    assert(after.where("id < 5").count() == 0L)
  }

  test("guards: UPDATE without declared keys, MERGE on a non-key equality, cardinality violation") {
    warehouse
    spark.sql("""CREATE TABLE vtd.nokeys (id BIGINT, n BIGINT)
      TBLPROPERTIES ('stats'='id,n')""")
    spark.sql("INSERT INTO vtd.nokeys SELECT id, id FROM range(0, 10)")
    val e1 = intercept[Exception](
      spark.sql("UPDATE vtd.nokeys SET n = 0 WHERE id = 1"))
    assert(e1.getMessage.contains("declares no key columns"))

    spark.sql("""CREATE TABLE vtd.keyed (id BIGINT, n BIGINT)
      TBLPROPERTIES ('stats'='id,n', 'keys'='id')""")
    spark.sql("INSERT INTO vtd.keyed SELECT id, id FROM range(0, 10)")
    spark.sql("SELECT id, n FROM VALUES (1L, 5L), (1L, 6L) AS t(id, n)")
      .createOrReplaceTempView("dup_src")
    // ON over a non-key column rejects at rewrite
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO vtd.keyed t USING dup_src s ON t.n = s.n
         WHEN MATCHED THEN DELETE"""))
    assert(e2.getMessage.contains("declared keys"))
    // two source rows claiming one target key = cardinality violation
    val e3 = intercept[Exception](spark.sql(
      """MERGE INTO vtd.keyed t USING dup_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET n = s.n"""))
    assert(e3.getMessage.contains("cardinality violation"))
  }

  test("catalog DELETE racing an API append: the loser rebases, both changes land") {
    warehouse
    spark.sql("""CREATE TABLE vtd.race (id BIGINT, n BIGINT)
      TBLPROPERTIES ('stats'='id,n', 'keys'='id')""")
    spark.sql("INSERT INTO vtd.race SELECT id, id FROM range(0, 100)")
    val root = s"$warehouse/race"
    // inject a competing append (disjoint ids) into the DELETE's
    // read-to-CAS window: the delete loses its first CAS and must
    // rebase over the append, never dropping or resurrecting rows
    VersionedTable.beforePublishHook.set(() => {
      val (stats, typed) = VersionedTable.statColumnsOf(spark, root)
      VersionedTable.append(
        spark.range(200, 300).selectExpr("id", "id AS n"),
        root, stats, typed)
      ()
    })
    spark.sql("DELETE FROM vtd.race WHERE id < 50")
    val ids = spark.table("vtd.race").select($"id").as[Long]
      .collect().sorted.toSeq
    assert(ids == ((50L until 100L) ++ (200L until 300L)),
      s"rebased delete must keep the concurrent append: $ids")
  }
}
