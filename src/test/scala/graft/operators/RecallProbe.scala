package graft.operators

/** One-off measurement driver for the ANN recall readouts after the
  * hyperplane-weight fix: prints recall@3 for LSH single-probe,
  * multiprobe, and IVF against brute force on the sf0.001 table.
  *
  *   sbt "Test/runMain graft.operators.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val sf = graft.TestSpark.sfDir
    def neighbors(q: graft.queries.RelationalQueries.Q): Map[Long, Seq[Long]] =
      q.build(spark, sf).filter($"qid" < 10 && $"rank" <= 3)
        .select("qid", "cid").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val exact = neighbors(Similarity.bruteforceTopK)
    def recall(a: Map[Long, Seq[Long]]): Double = {
      val hits = exact.map { case (q, ns) =>
        a.getOrElse(q, Nil).count(ns.toSet).toDouble / ns.size }
      hits.sum / hits.size
    }
    println("[probe] LSH1  " + recall(neighbors(Similarity.lshTopK)))
    println("[probe] LSHMP " + recall(neighbors(Similarity.lshMultiprobe)))
    println("[probe] IVF   " + recall(neighbors(Similarity.ivfTopK)))
    spark.stop()
  }
}
