package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting constants that appear in BOTH the Spark expressions and
  * the DuckDB oracle SQL of several queries must stay synchronized: the
  * Spark side now has single sources ([[graft.operators.TextAnalysis
  * .Stopwords]]), and this spec pins every consumer's ORACLE to the
  * canonical fragment, so editing the list in one place without the
  * other fails the suite instead of failing the driver's hash compare in
  * a different query than the one edited.
  */
class OracleConsistencySpec extends AnyFunSuite {

  test("every stopword-consuming oracle embeds the canonical list") {
    val frag = s"(${graft.operators.TextAnalysis.StopwordsSql})"
    val consumers = Seq("ta_lang_id", "ta_quality_score",
      "pipe_corpus_curation", "pipe_quality_buckets", "pipe_dataset_card",
      "pipe_gopher_rules", "ann_cluster_quality")
    for (q <- consumers) {
      val sql = graft.SparkEntry.oracleSql(q)
      assert(sql.contains(frag),
        s"$q's oracle does not embed the canonical stopword list $frag")
    }
  }

  test("no oracle carries a divergent stopword list") {
    // any oracle mentioning the first stopword in an IN-list must use the
    // full canonical fragment — a partial or reordered copy is a silent
    // desynchronization waiting for an edit
    val frag = s"(${graft.operators.TextAnalysis.StopwordsSql})"
    for ((name, sql) <- graft.SparkEntry.oracleSql
         if sql.contains("'the',")) {
      assert(sql.contains(frag),
        s"$name's oracle has a stopword-like IN list diverging from $frag")
    }
  }
}
