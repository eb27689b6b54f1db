package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection (`InjectRuntimeFilter`): a selective
  * dimension filter is turned into a bloom filter applied on the fact side
  * BEFORE its shuffle, cutting shuffled bytes for non-broadcastable joins —
  * the knob to flip at 100 TB when the dim side is too big to broadcast but
  * still selective. Off by default in this build; this spec pins the
  * enablement recipe and the plan shape it buys.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("selective dim filter injects bloom_filter on the fact side when enabled") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // sf0.001 scans are a few hundred KB — zero the size gates so the
      // injection decision is purely structural in this spec
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sf = TestSpark.sfDir
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") && plan.contains("might_contain"),
        s"expected injected runtime bloom filter:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
