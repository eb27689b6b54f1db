package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards: the properties that make these queries scale must
  * survive refactors — filters reaching the parquet scan, pruned read
  * schemas, broadcast dimensions, top-k without a global sort.
  */
class PlanRegressionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  private def planString(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q6: all predicates pushed to the scan, read schema pruned") {
    val df = graft.SparkEntry.queries("q6_forecast_revenue")(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThan(l_quantity,24.0)"), p)
    val readSchema = p.linesIterator.find(_.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_orderkey"),
      s"pruned columns must not be read: $readSchema")
  }

  test("q3: top-10 via TakeOrderedAndProject, not a global sort") {
    val p = planString("q3_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q_region_volume: dimension joins broadcast") {
    val p = planString("q_region_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("ann_bruteforce_topk: query side broadcast, cosine in the plan") {
    val p = planString("ann_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
    assert(p.toLowerCase.contains("cosinesimilarity"))
  }

  test("per-group top-k windows get WindowGroupLimit pushdown") {
    // Catalyst's InferWindowGroupLimit turns `row_number <= k` filters
    // into partial+final per-partition group limits, so top-k never
    // materializes a full per-group sort — the property that keeps every
    // ann_*_topk/window-topn query scalable. Guard it: a rank filter
    // rewritten in a way the rule can't see would silently revert to
    // full sorts.
    for (q <- Seq("q_window_topn", "ann_bruteforce_topk", "ann_pq_topk")) {
      val p = planString(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q lost WindowGroupLimit pushdown:\n${p.take(1500)}")
    }
  }

  test("ta_token_count: narrow per-doc transform, no shuffle before the sort") {
    val p = planString("ta_token_count")
    // exactly one Exchange: the presentation orderBy's range partitioning
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected no extra shuffles, plan:\n${p.take(1500)}")
  }

  test("pipe_hash_sample: pure filter — no shuffle except presentation sort, pruned read") {
    val df = graft.SparkEntry.queries("pipe_hash_sample")(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema"))
      .getOrElse("")
    assert(!readSchema.contains("text"),
      s"sampling must not read the payload column: $readSchema")
    val exec = planString("pipe_hash_sample") // single-listing form
    val exchanges = "Exchange".r.findAllIn(exec).size
    assert(exchanges <= 1,
      s"a filter needs no shuffle beyond the presentation sort:\n${exec.take(1500)}")
  }

  test("q_argmax_latest: exactly one shuffle (the window key), then local work") {
    val p = planString("q_argmax_latest")
    // one hashpartitioning for the window + the presentation range sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"argmax must shuffle once on the key:\n${p.take(1500)}")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(800))
  }

  test("ann_centroids: partial aggregation before the (label, pos) shuffle") {
    val p = planString("ann_centroids")
    assert(p.contains("HashAggregate"), p.take(1200))
    // partial_sum proves map-side combine: per-partition sums ship, not rows
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected partial aggregation:\n${p.take(1500)}")
  }

  test("ta_top_bigrams: top-20 via TakeOrderedAndProject, not a global sort") {
    val p = planString("ta_top_bigrams")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("ev_event_paths: top-20 transitions via TakeOrderedAndProject") {
    val p = planString("ev_event_paths")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("ta_tfidf: corpus-size scalar joins in as a broadcast, not a shuffle") {
    val p = planString("ta_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
  }

  test("ta_tfidf: document frequency aggregates map-side, no token-partition window") {
    // df via count().over(Window.partitionBy(token)) funnels every row of
    // a hot token (stopwords hit nearly every doc) into one task; the
    // aggregate+join form partial-aggregates before the shuffle and the
    // join back is AQE-skew-handled. Pin the map-side combine.
    val p = planString("ta_tfidf")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"expected map-side combined df aggregate:\n${p.take(2000)}")
  }

  test("ta_vocab: map-side combine feeds the distributed top-k") {
    val p = planString("ta_vocab")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"expected partial aggregation:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("pipe_split_counts: split assignment aggregates map-side, no row shuffle") {
    val p = planString("pipe_split_counts")
    // rows reduce to (source, split) partials before the only data shuffle
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"expected partial aggregation:\n${p.take(1500)}")
  }

  test("q_recursive_cte: fact-side aggregation keeps partial/final shape") {
    val p = planString("q_recursive_cte")
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(p.contains("UnionLoop") || p.contains("Recursion") ||
      p.contains("CTE"), s"expected a recursive node:\n${p.take(1500)}")
  }

  test("ta_bigram_lm: model join stays adaptive; AQE broadcasts it at test SF") {
    // the model is one row per DISTINCT corpus bigram — unbounded at
    // 100 TB — so the scoring join must NOT carry a forced broadcast()
    // hint (driver OOM at vocabulary scale). The scale-safe shape is an
    // AQE-replannable join that AQE converts to a broadcast at runtime
    // whenever the model measures small, as it does at test SF.
    val df = graft.SparkEntry.queries("ta_bigram_lm")(spark, sf)
    val initial = df.queryExecution.executedPlan.toString
    assert(initial.contains("AdaptiveSparkPlan"),
      s"model join must stay AQE-replannable:\n${initial.take(1500)}")
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"AQE should pick a broadcast for the small test-SF model:\n${p.take(2000)}")
  }

  test("ta_bigram_lm: scan reads only doc_id and text") {
    val df = graft.SparkEntry.queries("ta_bigram_lm")(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema"))
      .getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
      !readSchema.contains("source") && !readSchema.contains("lang"),
      s"expected pruned read schema, got: $readSchema")
  }

  test("ann_recall_report: probes broadcast to both the exact and LSH sides") {
    val p = planString("ann_recall_report")
    val broadcasts = "BroadcastExchange".r.findAllIn(p).size
    assert(broadcasts >= 2,
      s"expected probe broadcasts on both sides:\n${p.take(2000)}")
  }

  test("mm_feature_extract: decode is a narrow map — no shuffle before the sort") {
    val p = planString("mm_feature_extract")
    val exchanges = "Exchange".r.findAllIn(p).size
    // one range partitioning for the presentation orderBy, nothing else
    assert(exchanges <= 2, s"decode must not shuffle:\n${p.take(1500)}")
  }

  test("ann_pq_topk: codebook and per-query LUT join in as broadcasts") {
    val p = planString("ann_pq_topk")
    // candidates must stream against broadcast lookup tables — a shuffled
    // LUT join would move the (corpus-sized) code table per query batch
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val broadcasts = "BroadcastExchange".r.findAllIn(p).size
    assert(broadcasts >= 2,
      s"expected codebook + LUT broadcasts:\n${p.take(2000)}")
  }

  test("ev_attribution: one user_id shuffle feeds the window, channels aggregate map-side") {
    val p = planString("ev_attribution")
    assert(p.contains("Window"), p.take(1200))
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"expected partial aggregation over channels:\n${p.take(1500)}")
  }

  test("ev_anomaly: per-type stats join back as a broadcast") {
    val p = planString("ev_anomaly")
    assert(p.contains("BroadcastHashJoin"),
      s"stats side (|event types| rows) must broadcast:\n${p.take(1500)}")
  }

  test("pipe_shard_manifest: shard totals aggregate map-side") {
    val p = planString("pipe_shard_manifest")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"expected map-side combine over 16 shard keys:\n${p.take(1500)}")
  }

  test("pipe_dataset_card: per-source card aggregates map-side after the hash window") {
    val p = planString("pipe_dataset_card")
    assert(p.contains("Window"), p.take(1200))
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"expected partial aggregation per source:\n${p.take(1500)}")
  }

  test("ann_ivfpq_topk: residual codebook and query LUT broadcast; candidates never read raw vectors") {
    val p = planString("ann_ivfpq_topk")
    val broadcasts = "BroadcastExchange".r.findAllIn(p).size
    assert(broadcasts >= 2,
      s"expected codebook + LUT broadcasts:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("ann_ivfpq_rerank: shortlist broadcast against the raw store, no corpus shuffle join") {
    // the refinement stage must stream the vector store ONCE against the
    // broadcast |queries|×RerankDepth shortlist — a sort-merge join here
    // would shuffle the whole corpus to refine 100 rows
    val p = planString("ann_ivfpq_rerank")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      s"rerank join shuffles the raw store:\n${p.take(2000)}")
    assert(p.toLowerCase.contains("cosinesimilarity"),
      s"exact rescoring left the plan:\n${p.take(2000)}")
    assert(p.contains("WindowGroupLimit"),
      s"rerank top-3 lost group-limit pushdown:\n${p.take(2000)}")
  }

  test("pipe_semantic_dedup_lsh: pair join keys on the bucket, no cartesian product") {
    val p = planString("pipe_semantic_dedup_lsh")
    assert(!p.contains("CartesianProduct"),
      s"bucket blocking must be an equi-join:\n${p.take(1500)}")
    assert(p.contains("bucket"), p.take(1500))
  }

  test("ann_ivfpq_serve_all: adaptive ADC join (no forced corpus-LUT broadcast), top-k pushed") {
    // the per-query LUT is corpus-sized in serve-all mode: a hint-forced
    // broadcast would OOM at scale, so the plan must stay AQE-replannable
    // and the top-3 must keep the WindowGroupLimit pushdown
    val p = planString("ann_ivfpq_serve_all")
    assert(p.contains("AdaptiveSparkPlan"), p.take(1500))
    assert(p.contains("WindowGroupLimit"),
      s"serve-all top-3 lost group-limit pushdown:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("dd_dup_spans: pruned scan, map-side df aggregate, adaptive marking join") {
    val p = planString("dd_dup_spans")
    // only doc_id + text leave the parquet scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected pruned read schema:\n${p.take(2000)}")
    // n-gram document frequency partial-aggregates before its shuffle
    assert(p.contains("partial_count"),
      s"expected map-side combined df aggregate:\n${p.take(2000)}")
    // the duplicated-set join must stay AQE-replannable — the n-gram
    // vocabulary is corpus-sized, so a hint-forced broadcast would be the
    // ta_bigram_lm scale-killer all over again
    assert(p.contains("AdaptiveSparkPlan"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("ta_inverted_index: both stages partial-aggregate; no token-partition window") {
    val p = planString("ta_inverted_index")
    // (token, doc_id) then token — both with map-side partials (the
    // bounded BottomKLongs UDAF included), so a stopword's posting list
    // never funnels through one task
    assert(p.contains("partial_"),
      s"expected map-side combined aggregates:\n${p.take(2000)}")
    assert(!p.contains("Window"),
      s"posting heads must come from bounded aggregation, not a window:\n${p.take(2000)}")
  }

  test("prefix-sum offsets join in as a broadcast, not a per-partition when-chain") {
    // the (pid -> offset) frame is <= #partitions rows; a when-chain with
    // one CASE branch per partition blows codegen limits at cluster scale
    // (thousands of partitions), so the offsets must enter via a
    // BroadcastHashJoin on pid that stays O(1) per row at any partition
    // count
    for (q <- Seq("pipe_token_packing", "pipe_global_shuffle")) {
      val p = planString(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q offsets must broadcast-join on pid:\n${p.take(2000)}")
      assert(p.contains("poffset"),
        s"$q offset column missing from the plan:\n${p.take(2000)}")
      assert(!p.contains("CASE WHEN (pid"),
        s"$q reverted to the per-partition when-chain:\n${p.take(2000)}")
    }
  }

  test("q_window_frames: one partition exchange serves all three window specs") {
    val p = planString("q_window_frames")
    // wRange (price asc) and wOrd/wTail (price desc, key) differ only in
    // sort order — the o_orderpriority hash partitioning is set up once
    // and both Window nodes run off it with local re-sorts, no re-shuffle
    val nHash = "hashpartitioning\\(o_orderpriority".r.findAllIn(p).length
    assert(nHash == 1,
      s"expected a single reused partition exchange:\n${p.take(2000)}")
    assert(p.contains("RangeFrame"), p.take(1500))
  }

  test("q_window_time_range: interval RANGE frame plans as one window shuffle") {
    val p = planString("q_window_time_range")
    assert(p.contains("RangeFrame"), p.take(1500))
    val nHash = "hashpartitioning\\(o_custkey".r.findAllIn(p).length
    assert(nHash == 1, s"expected one o_custkey window exchange:\n${p.take(2000)}")
  }

  test("ta_dup_ngrams: both aggregations reuse the spread's doc_id partitioning") {
    val p = planString("ta_dup_ngrams")
    // groupBy(doc_id, g) and groupBy(doc_id) both contain doc_id, so the
    // explicit spread repartition satisfies both — the whole counting
    // pipeline is one shuffle plus the presentation sort
    val nHash = "hashpartitioning\\(doc_id".r.findAllIn(p).length
    assert(nHash == 1,
      s"expected only the spread repartition:\n${p.take(2000)}")
    assert(!p.contains("Window"),
      s"dup fractions must come from aggregation, not a window:\n${p.take(1500)}")
  }

  test("dd_prefix_jaccard: verification join stays adaptive (no forced pair-list broadcast)") {
    // the pair list is two longs per candidate — AQE broadcasts it when
    // small, but a HARD broadcast aborts on degenerate corpora where the
    // candidate set outgrows the driver (measured > 1 GiB at 100k
    // tiny-vocab docs); the plan must keep a join, not a hint-forced
    // BroadcastExchange of `cand`
    val p = planString("dd_prefix_jaccard")
    assert(p.contains("Join"), p.take(1500))
    assert(p.contains("AdaptiveSparkPlan"),
      s"verification joins must stay AQE-replannable:\n${p.take(1500)}")
  }

  test("dd_embedding_cosine_lsh: pair join is a bucket equi-join, adaptive, never cartesian") {
    // the production embedding near-dup path: the join must key on the
    // LSH bucket (capacity-controlled) with no hint-forced broadcast of
    // a corpus-sized side — AQE picks broadcast only from measured stats
    val p = planString("dd_embedding_cosine_lsh")
    assert(p.toLowerCase.contains("lshbucket"),
      s"bucket key missing from the join plan:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("AdaptiveSparkPlan"), p.take(1500))
  }

  test("dd_embedding_cosine_lsh_mp: probe join keys on pbucket, corpus side never broadcast, no cartesian") {
    // the multiprobe near-dup path: probes are corpus-sized (9 rows per
    // vector), so unlike ann_lsh_multiprobe's 10-query broadcast the pair
    // join must be a plain pbucket equi-join that AQE plans from measured
    // sizes — a hint-forced broadcast of either side aborts at corpus
    // scale, and a cartesian is corpus x corpus
    val p = planString("dd_embedding_cosine_lsh_mp")
    assert(p.contains("pbucket"),
      s"probe-bucket key missing from the join plan:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("AdaptiveSparkPlan"), p.take(1500))
    val analyzed = graft.SparkEntry.queries("dd_embedding_cosine_lsh_mp")(spark, sf)
      .queryExecution.analyzed
    assert(analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.isEmpty, "no forced broadcast hint on a corpus-sized side")
  }

  test("dd_embedding_lsh_bounded: occupancy broadcast back, pair join keys on the refined (bucket, sub), no cartesian") {
    // the skew-bounded near-dup path: the per-bucket occupancy frame
    // (≤ 2^planes rows) must come back as a broadcast join — never a
    // shuffle of the corpus against it — and the pair join must key on
    // the REFINED (bucket, sub) pair, staying an equi-join. A cartesian
    // or a sub-less join key silently reverts the skew bound.
    val p = planString("dd_embedding_lsh_bounded")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      s"occupancy frame must broadcast back onto the corpus:\n${p.take(1500)}")
    assert(p.contains("sub"),
      s"refined sub-key missing from the pair join:\n${p.take(1500)}")
    assert(p.contains("AdaptiveSparkPlan"), p.take(1500))
  }

  test("dd_embedding_recall: exact truth streams the corpus against a broadcast sample — never a cartesian") {
    // the ground-truth arm must not be an all-pairs cross join: the only
    // nested-loop join allowed is the BroadcastNestedLoopJoin whose build
    // side is the md5-hash-sampled query set (fixed-size by K at corpus
    // scale), so the exact arm is one corpus pass, O(n * |sample|)
    val p = planString("dd_embedding_recall")
    assert(!p.contains("CartesianProduct"),
      s"recall ground truth reverted to an unblocked cartesian:\n${p.take(2000)}")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.toLowerCase.contains("md5"),
      s"broadcast side must be the hash-sampled query set:\n${p.take(2000)}")
  }

  test("pipe_embedding_decontam: contamination join blocked on the bucket, eval side aggregates map-side") {
    // decontamination joins eval-set probes to the train corpus through
    // the LSH bucket key — the plan must show the bucket equi-join (never
    // cartesian) and keep the final per-split rollup partial-aggregated
    val p = planString("pipe_embedding_decontam")
    assert(p.toLowerCase.contains("lshbucket"),
      s"bucket key missing from the contamination join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_"),
      s"per-split rollup lost its partial aggregation:\n${p.take(1500)}")
  }

  test("ann_ivfpq_nprobe2: top-k pruned, codebook crosses stay broadcast-sized") {
    val p = planString("ann_ivfpq_nprobe2")
    // per-query/per-(vector,subspace) argmins and the final top-3 all get
    // WindowGroupLimit pushdown — no full per-group sorts
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    // the only nested-loop joins are broadcast codebook crosses (16-row
    // build sides); an unbroadcast cartesian would be corpus x corpus
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("aq_table_lateral: in-stage Inline generator, no Exchange between scan and generate") {
    // the LATERAL table-function seam registers a real Generate(Inline(udf))
    // node (AdhesiveRegistry.lateralJoin); the fan-out must run IN the scan
    // stage — a future analyzer change that de-correlates the lateral into
    // a join would insert an Exchange here and silently turn a narrow
    // per-row explode into a shuffle of the whole fan-out
    val p = planString("aq_table_lateral")
    val gen = p.indexOf("Generate inline(")
    val scan = p.indexOf("FileScan parquet")
    assert(gen >= 0, s"Inline generator missing from the plan:\n${p.take(1500)}")
    assert(scan > gen, s"generator must sit above the documents scan:\n${p.take(1500)}")
    val between = p.substring(gen, scan)
    assert(!between.contains("Exchange"),
      s"the lateral fan-out left the scan stage:\n$between")
    // the ONLY shuffle is the presentation sort's range partitioning
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly the presentation-sort Exchange:\n${p.take(1500)}")
  }
}
