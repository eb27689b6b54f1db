package graft.queries

import graft.TestSpark
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe`: pipeline accounting metrics collected during the one
  * data pass (no second scan). At 100 TB a curation job cannot afford a
  * separate count() per accounting question — observe rides the existing
  * job and delivers the numbers with the result.
  */
class ObserveSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curation filter reports kept/total/chars in the same pass") {
    val obs = Observation("curation")
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val kept = docs
      .observe(obs,
        count(lit(1)).as("n_total"),
        sum(length($"text").cast("long")).as("chars_total"))
      .filter(length($"text") >= 100)
    val nKept = kept.count()

    val m = obs.get
    assert(m("n_total") == docs.count())
    assert(nKept <= m("n_total").asInstanceOf[Long])
    assert(m("chars_total").asInstanceOf[Long] > 0)
  }

  test("observed metrics survive further transforms and joins") {
    val obs = Observation("join_input")
    val o = Tables.orders(spark, TestSpark.sfDir)
      .observe(obs, count(lit(1)).as("n_orders"))
    val joined = o.join(Tables.customer(spark, TestSpark.sfDir),
      $"o_custkey" === $"c_custkey")
    joined.write.format("noop").mode("overwrite").save()
    assert(obs.get("n_orders").asInstanceOf[Long] ==
      Tables.orders(spark, TestSpark.sfDir).count())
  }
}
