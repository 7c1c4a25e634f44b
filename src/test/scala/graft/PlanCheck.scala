package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit (run: `sbt "Test/runMain graft.PlanCheck"`):
  * prints the physical plans of representative queries and greps for
  * the properties that matter at 100 TB — filter/column pushdown
  * reaching the parquet scan, broadcast joins on dims, partial
  * aggregation before exchanges, and no stray shuffles. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    def plan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.queryExecution.executedPlan.toString
    }
    def audit(name: String, wants: Seq[(String, String => Boolean)]): Unit = {
      val p = plan(name)
      println(s"== $name ==")
      wants.foreach { case (label, pred) =>
        println(f"  ${if (pred(p)) "PASS" else "FAIL"}%s $label")
      }
    }
    // executed-plan variant: AQE applies exchange reuse at RUNTIME, so
    // assertions on ReusedExchange must read the final adaptive plan
    def auditExecuted(name: String,
        wants: Seq[(String, String => Boolean)]): Unit = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      println(s"== $name (executed) ==")
      wants.foreach { case (label, pred) =>
        println(f"  ${if (pred(p)) "PASS" else "FAIL"}%s $label")
      }
    }

    audit("q02_filter_shapes", Seq(
      "filters pushed to parquet" -> (_.contains("PushedFilters: [")),
      "no pushed-filter list empty" -> (p =>
        !p.contains("PushedFilters: []")),
      "column-pruned read schema" -> (_.contains("ReadSchema"))))
    audit("q06_forecast_revenue", Seq(
      "partial aggregation (no shuffle of raw rows)" ->
        (_.contains("partial_")),
      "filters pushed" -> (p => p.contains("PushedFilters: ["))))
    audit("q05_region_revenue", Seq(
      "broadcast join on dims" -> (_.contains("BroadcastHashJoin")),
      "partial agg before exchange" -> (_.contains("partial_"))))
    audit("q03_top_unshipped", Seq(
      "broadcast for filtered customers" -> (_.contains("BroadcastHashJoin")),
      "top-k as TakeOrdered" -> (p =>
        p.contains("TakeOrderedAndProject") || p.contains("TakeOrdered"))))
    audit("q09_distinct_agg", Seq(
      // join-of-partial-aggs shape: each distinct is its own two-level
      // aggregation — the multi-DISTINCT Expand rewrite (which triples
      // every fact row before the exchange) must NOT appear
      "no multi-DISTINCT Expand of the fact table" ->
        (p => !p.contains("Expand")),
      "each distinct deduplicated map-side before its exchange" ->
        (p => "HashAggregate".r.findAllIn(p).size >= 6),
      "no cartesian in the group-key joins" ->
        (p => !p.contains("CartesianProduct"))))
    auditExecuted("ss21_sq8_layout", Seq(
      // the probe joins the cid-partitioned code layout on its
      // PARTITION column: dynamic partition pruning must inject a
      // runtime filter so only the probed lists' directories are read
      "probe prunes the code layout's partitions (DPP)" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      // probe pick is in-row, rank is the bounded heap — a window
      // here would sort n/nprobe candidates per query in one task
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    auditExecuted("ss22_pq_layout", Seq(
      "probe prunes the code layout's partitions (DPP)" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    auditExecuted("ss24_sq8_layout_cdf", Seq(
      "maintained layout still serves under DPP" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    auditExecuted("t37_hybrid_layout", Seq(
      // BOTH serving legs prune their layouts at runtime: the BM25
      // leg's (bkt, fp) semi-join and the kNN leg's probe cid join
      // must each plant a dynamic partition filter
      "both layout legs prune under DPP" ->
        (p => "dynamicpruning".r.findAllIn(p).size >= 2),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    auditExecuted("ss27_sq8_stats_refresh", Seq(
      "refreshed layout still serves under DPP" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    audit("ss26_sq8_drift_census", Seq(
      "per-dim census combines map-side" -> (_.contains("partial_")),
      "frozen stats ride a broadcast" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    auditExecuted("ss25_pq_layout_cdf", Seq(
      "maintained layout still serves under DPP" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    auditExecuted("ss23_knn_layout", Seq(
      "probe prunes the home-list layout's partitions (DPP)" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q70_label_propagation", Seq(
      // rounds executed at construction behind per-round checkpoints
      // (the resolveClusters pattern) — the declared plan is the
      // final label frame's checkpoint leaf plus the ORDER BY
      "rounds checkpoint-truncated (ExistingRDD leaf)" ->
        (_.contains("Scan ExistingRDD")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ss31_bitext_margin", Seq(
      "probe joins are equi on the list id, never A-cross-B" ->
        (p => !p.contains("CartesianProduct")),
      "bounded-heap rank (no corpus-frame Window)" ->
        (p => !p.contains("Window")),
      "neighborhood averages partial-aggregate map-side" ->
        (_.contains("partial_"))))
    auditExecuted("ss30_knn_compact", Seq(
      "probe prunes the COMPACTED layout's partitions (DPP)" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    auditExecuted("t39_bm25_compact", Seq(
      "probe prunes the COMPACTED buckets (DPP)" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    auditExecuted("ss28_knn_centroid_retrain", Seq(
      "probe prunes the RETRAINED layout's partitions (DPP)" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    auditExecuted("t35_rm3_layout", Seq(
      // both scoring passes prune the postings buckets; feedback-term
      // mining prunes the doc-bucketed forward copy
      "all layout reads prune via DPP" ->
        (p => "dynamicpruning".r.findAllIn(p).size >= 3),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    auditExecuted("t32_bm25_layout", Seq(
      "probe prunes the postings layout's term buckets (DPP)" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "per-query top-k through the bounded heap, not a window" ->
        (p => !p.contains("Window"))))
    auditExecuted("q09_distinct_agg", Seq(
      // every distinct branch reads only its own 2-3 columns — the
      // pruning that makes the multi-scan shape cheap at scale
      "each branch's scan is column-pruned" -> (p =>
        p.contains("ReadSchema: struct<l_partkey:bigint,l_returnflag:string>")
          && p.contains(
            "ReadSchema: struct<l_suppkey:bigint,l_returnflag:string>")),
      "null keys filtered AT the scan (pushed)" ->
        (_.contains("PushedFilters: [IsNotNull(l_partkey)"))))
    audit("q16_topk", Seq(
      "TakeOrderedAndProject instead of global sort" ->
        (_.contains("TakeOrderedAndProject"))))
    audit("dd2_dedup_jaccard", Seq(
      // equi-join on shingle: SMJ/SHJ at scale; AQE may broadcast the
      // small side at toy SFs — all three are fine, cartesian is not
      "shingle join is a real equi-join" -> (p =>
        p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
          p.contains("BroadcastHashJoin")),
      "no cartesian product" -> (p => !p.contains("Cartesian"))))
    audit("ss1_cosine_topk", Seq(
      "query side broadcast (corpus not shuffled)" ->
        (_.contains("BroadcastNestedLoopJoin"))))
    audit("dd4_dedup_simhash", Seq(
      "block-key census joins as a broadcast (≤131k rows by construction)" ->
        (_.contains("BroadcastHashJoin")),
      "candidate + expansion joins are equi, never cartesian" ->
        (p => !p.contains("Cartesian")),
      "distinct-hash dedup is partially aggregated map-side" ->
        (_.contains("partial_"))))
    audit("q67_label_layout", Seq(
      // the layout writer's read-back scan must prune by DIRECTORY:
      // label=3 appears as a partition filter, not a data filter
      "label predicate is a PartitionFilter on the layout scan" -> (p =>
        p.contains("PartitionFilters") &&
          p.split("PartitionFilters", 2)(1).take(200).contains("label")),
      "queries broadcast, corpus scanned once" ->
        (_.contains("BroadcastNestedLoopJoin"))))
    audit("ve10_jl_project", Seq(
      // dimension reduction must be a pure map: one scan, no joins
      "no join anywhere (map-side projection)" ->
        (p => !p.contains("Join")),
      "single parquet scan" ->
        (p => "Scan parquet".r.findAllIn(p).size == 1)))
    audit("ss13_pq_rerank", Seq(
      // stage 2 must ride broadcasts: the corpus is probed by id, the
      // shortlist and query vectors never force a corpus exchange
      "shortlist + queries broadcast into the re-rank" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("ss15_knn_census", Seq(
      "trained centroids broadcast (no cartesian)" ->
        (p => !p.contains("CartesianProduct")),
      "list sizes partially aggregated before the exchange" ->
        (_.contains("partial_")),
      "trained-assignment frame checkpoint-truncated (one compute)" ->
        (_.contains("Scan ExistingRDD"))))
    audit("ss14_knn_graph", Seq(
      "probe-home candidate join is equi on the list id" ->
        (p => !p.contains("CartesianProduct")),
      "per-vector top-k partially aggregated (bounded heap)" ->
        (_.contains("partial_")),
      "scored corpus frame is checkpoint-truncated (one compute)" ->
        (_.contains("Scan ExistingRDD"))))
    audit("ss20_knn_cdf", Seq(
      "probe-home candidate join is equi on the list id" ->
        (p => !p.contains("CartesianProduct")),
      "per-query top-k partially aggregated (bounded heap)" ->
        (_.contains("partial_")),
      // the CDF fold's LeftAnti shape is pinned in GuardrailsSpec on
      // the raw knnApplyCdf frame; here the maintained frame must be
      // checkpoint-truncated — folded ONCE, however often it serves
      "maintained index checkpoint-truncated (one fold)" ->
        (_.contains("Scan ExistingRDD"))))
    audit("m10_image_neardup", Seq(
      "media payload pruned before decode (id-only read)" ->
        (p => !p.contains("text")),
      "block join is equi, not cartesian" ->
        (p => !p.contains("Cartesian"))))
    audit("t33_unigram_train", Seq(
      // one corpus tokenize into the word table; every EM round
      // touches only vocabulary-sized frames behind checkpoints (the
      // final visible plan is just the coverage union over them)
      "rounds checkpoint-truncated (one corpus scan)" ->
        (_.contains("Scan ExistingRDD")),
      "span-vocab join is equi, not cartesian" ->
        (p => !p.contains("CartesianProduct"))))
    audit("t34_unigram_encode", Seq(
      // the rolling-fingerprint-in-one-map shape: the vocab is
      // broadcast driver state, the doc rolls up inside ONE typed
      // map — no join, no aggregation, no exchange anywhere
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "one exchange only (the declared query's final ORDER BY)" ->
        (p => "Exchange".r.findAllIn(p).size <= 1),
      "no per-doc aggregation state (Window/Aggregate-free)" ->
        (p => !p.contains("Window") && !p.contains("HashAggregate") &&
          !p.contains("SortAggregate") && !p.contains("ObjectHashAggregate"))))
    audit("t36_tokenizer_coverage", Seq(
      "per-source rollup combines map-side" -> (_.contains("partial_")),
      "word-seg mapping joins equi, no cartesian" ->
        (p => !p.contains("CartesianProduct")),
      "model frame checkpoint-truncated" ->
        (_.contains("Scan ExistingRDD"))))
    audit("m13_pair_curation", Seq(
      // the image leg keeps m10's contract (id-only decode input) —
      // text appears ONLY on the caption/quality side; no leg goes
      // quadratic and the label frames broadcast
      "no cartesian anywhere (banded minhash + pigeonhole blocks)" ->
        (p => !p.contains("Cartesian")),
      "closure rounds checkpoint-truncated" ->
        (_.contains("Scan ExistingRDD")),
      "labels/survivors ride broadcasts" ->
        (_.contains("BroadcastHashJoin"))))
    audit("m11_image_incremental", Seq(
      "media payload pruned before decode (id-only read)" ->
        (p => !p.contains("text")),
      "probe join is equi, not cartesian" ->
        (p => !p.contains("Cartesian"))))
    audit("m12_audio_neardup", Seq(
      "audio payload pruned before decode (id-only read)" ->
        (p => !p.contains("text")),
      "block join is equi, not cartesian" ->
        (p => !p.contains("Cartesian"))))
    audit("dc5_semantic_contamination", Seq(
      "bucket probe join is equi, not cartesian" ->
        (p => !p.contains("Cartesian")),
      "per-doc argmax partially aggregated map-side" ->
        (_.contains("partial_"))))
    audit("t20_source_overlap", Seq(
      "totals ride broadcasts onto the pair frame" ->
        (_.contains("BroadcastHashJoin")),
      "distinct (source, fp) combines map-side" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("t22_bm25_topk", Seq(
      "postings / df / per-(query,doc) aggs combine map-side" ->
        (_.contains("partial_")),
      "query terms broadcast onto the postings" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian (totals are a 1-row broadcast)" ->
        (p => !p.contains("CartesianProduct")),
      // the serving tail's per-query top-k is the bounded-heap
      // aggregator, NOT a row_number window — a stopword-grade term
      // must never funnel a corpus-sized candidate set through one
      // reducer key (the round-13 weak)
      "no Window on the serving tail (bounded-heap top-k)" ->
        (p => !p.contains("Window"))))
    audit("t30_classifier_train", Seq(
      // the scoring pass: trained weights fold in as a broadcast-free
      // constant; margins are one codegen'd per-row fold
      "no cartesian in the scoring pass" ->
        (p => !p.contains("CartesianProduct")),
      "packed weights ride a broadcast onto the corpus scan" ->
        (_.contains("Broadcast"))))
    audit("t31_classifier_calibration", Seq(
      "threshold sweep partial-aggregates map-side (no global sort)" ->
        (_.contains("partial_")),
      "no Sort over the corpus (fixed grid, not a distinct-margin ROC)" ->
        (p => !p.contains("SortExec")),
      "scored frame checkpoint-shared (bounds + sweep)" ->
        (_.contains("Scan ExistingRDD")),
      "no cartesian (bounds ride a 1-row broadcast)" ->
        (p => !p.contains("CartesianProduct"))))
    audit("t29_retrieval_quality", Seq(
      "per-query metric aggs combine map-side" ->
        (_.contains("partial_")),
      "truth scan checkpoint-shared (qrels + the ANN fusion leg)" ->
        (_.contains("Scan ExistingRDD")),
      "no cartesian anywhere in the scoreboard" ->
        (p => !p.contains("CartesianProduct"))))
    audit("t24_hybrid_rrf", Seq(
      "fusion aggregation combines map-side" -> (_.contains("partial_")),
      "no cartesian anywhere in the fused plan" ->
        (p => !p.contains("CartesianProduct"))))
    audit("t25_bm25_standing", Seq(
      // the CDF fold's LeftAnti shape is pinned in the unit test on
      // the raw bm25ApplyCdf frame; here the standing frame must be
      // checkpoint-truncated — materialized ONCE, so df/totals/scoring
      // all read the same rows instead of re-running the fold 3×
      "standing index checkpoint-truncated (one compute)" ->
        (_.contains("Scan ExistingRDD")),
      "query terms broadcast onto the standing postings" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "no Window on the serving tail (bounded-heap top-k)" ->
        (p => !p.contains("Window"))))
    audit("t27_rm3_expansion", Seq(
      // both passes read the SAME checkpointed index — the corpus is
      // tokenized zero times inside the plan
      "standing index checkpoint-shared across both passes" ->
        (_.contains("Scan ExistingRDD")),
      "query/feedback sides broadcast onto the postings" ->
        (_.contains("BroadcastHashJoin")),
      "per-(query,doc) scores partially aggregated" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ds1_dsir_select", Seq(
      // the raw corpus is tokenized ONCE: census, totals, and scoring
      // all read the checkpointed (doc, bucket) frame
      "gram frame checkpoint-shared (one raw tokenize)" ->
        (_.contains("Scan ExistingRDD")),
      "bucket weights broadcast onto the gram frame" ->
        (_.contains("BroadcastHashJoin")),
      "per-doc masses partially aggregated map-side" ->
        (_.contains("partial_")),
      "no cartesian (totals/max are 1-row broadcasts)" ->
        (p => !p.contains("CartesianProduct"))))
    audit("dc7_strip_eval_spans", Seq(
      // the corpus gram stream is a map-side probe of the broadcast
      // eval set — no corpus-wide gram aggregation exists
      "eval grams broadcast onto the corpus gram stream" ->
        (_.contains("BroadcastHashJoin")),
      "island window partitioned per doc" ->
        (_.contains("hashpartitioning(doc_id")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ss19_hard_negatives", Seq(
      "hard side reuses the bounded graph (no cartesian)" ->
        (p => !p.contains("CartesianProduct")),
      "random pool is a TakeOrdered, not a global sort" ->
        (_.contains("TakeOrdered")),
      "pool packs into a broadcast for the in-row draw" ->
        (_.contains("BroadcastNestedLoopJoin"))))
    audit("t28_tfidf_standing", Seq(
      "standing model checkpoint-truncated (one train)" ->
        (_.contains("Scan ExistingRDD")),
      "arriving documents never exchange on doc_id" ->
        (p => !p.contains("hashpartitioning(doc_id")),
      "df lookup is an equi-join, no cartesian" ->
        (p => !p.contains("CartesianProduct"))))
    audit("ss3_ivf_topk", Seq(
      // the r13 ss18 fix, family-wide: each neighbor has ONE home
      // list, so no Aggregate (distinct) sits between the candidate
      // join and the rank — no query_id-keyed HashAggregate anywhere
      "no distinct on the candidate tail (one home list per neighbor)" ->
        (p => "HashAggregate\\(keys=\\[query_id".r.findFirstIn(p).isEmpty),
      "corpus home-list argmax combines map-side" ->
        (_.contains("partial_")),
      "probe rides a broadcast" -> (_.contains("BroadcastHashJoin")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    audit("ss6_ivf_trained", Seq(
      "no distinct on the candidate tail (one home list per neighbor)" ->
        (p => "HashAggregate\\(keys=\\[query_id".r.findFirstIn(p).isEmpty),
      "probe rides a broadcast" -> (_.contains("BroadcastHashJoin")),
      "trained centroids checkpoint-truncated (one Lloyd chain)" ->
        (_.contains("Scan ExistingRDD")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    audit("ss18_ivfsq8_topk", Seq(
      "probe candidates join equi on the list id" ->
        (p => !p.contains("CartesianProduct")),
      "centroids/stats/probe frames ride broadcasts" ->
        (_.contains("BroadcastHashJoin")),
      "assignments/stats partially aggregated" ->
        (_.contains("partial_")),
      "trained centroids checkpoint-truncated (one Lloyd chain)" ->
        (_.contains("Scan ExistingRDD")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    audit("cr2_quality_floor", Seq(
      // grouped exact quantile without a per-source sort: the only
      // windows partition by (source[, bucket]) and the threshold
      // frame broadcasts back onto the corpus
      "pick window partitioned by (source, quality-bucket)" ->
        (p => "hashpartitioning\\(source#\\d+, qk#".r
          .findFirstIn(p).isDefined),
      "thresholds broadcast onto the keep filter" ->
        (_.contains("BroadcastHashJoin")),
      "histogram aggregated map-side" -> (_.contains("partial_")),
      "scored frame checkpoint-shared (one quality compute)" ->
        (_.contains("Scan ExistingRDD")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ss17_sq8_topk", Seq(
      // stats pack into a 1-row broadcast; queries broadcast onto ONE
      // code scan; top-k is the bounded-heap aggregator
      "stats/queries ride broadcasts (no corpus re-shuffle)" ->
        (_.contains("BroadcastNestedLoopJoin")),
      "per-dim stats / top-k partially aggregated" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free ranking (bounded heap)" ->
        (p => !p.contains("Window"))))
    audit("tp13_fim_split", Seq(
      "pure map: no join anywhere (per-row manifest)" ->
        (p => !p.contains("Join")),
      "single corpus scan" ->
        (p => "Scan parquet".r.findAllIn(p).size == 1)))
    audit("tp12_span_corruption", Seq(
      "pure map: no join anywhere (per-row manifest)" ->
        (p => !p.contains("Join")),
      "single corpus scan" ->
        (p => "Scan parquet".r.findAllIn(p).size == 1)))
    audit("mx9_topic_mixture", Seq(
      "topic frame checkpoint-shared (histogram + keep join)" ->
        (_.contains("Scan ExistingRDD")),
      "topic histogram broadcast, keep decision map-side" ->
        (_.contains("BroadcastHashJoin")),
      "tf / histogram aggs combine map-side" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ds2_dsir_incremental", Seq(
      // the probe side is pure per-row: packed maps on a 1-row
      // broadcast, masses folded in-row — the arriving docs never
      // shuffle
      "packed model rides a broadcast onto the doc scan" ->
        (_.contains("BroadcastNestedLoopJoin")),
      "arriving documents never exchange on doc_id" ->
        (p => !p.contains("hashpartitioning(doc_id")),
      "standing model checkpoint-truncated (one train)" ->
        (_.contains("Scan ExistingRDD")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("cr1_source_caps", Seq(
      // the per-source rank must be the two-phase shape: the final
      // window partitions by (source, quality-bucket), never by the
      // bare source — one reducer per hot domain is the failure mode
      "rank window partitioned by (source, quality-bucket)" ->
        (p => "hashpartitioning\\(source#\\d+, qk#".r
          .findFirstIn(p).isDefined),
      "histogram aggregated map-side" -> (_.contains("partial_")),
      "scored frame checkpoint-shared (one quality compute)" ->
        (_.contains("Scan ExistingRDD")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("t26_tfidf_keywords", Seq(
      "tf / df aggs combine map-side" -> (_.contains("partial_")),
      "tf frame checkpoint-shared between df and scoring" ->
        (_.contains("Scan ExistingRDD")),
      "no cartesian (doc census is a 1-row broadcast)" ->
        (p => !p.contains("CartesianProduct"))))
    audit("dc6_bm25_contamination", Seq(
      "eval queries broadcast onto the train postings" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ss16_knn_incremental", Seq(
      "probe-home candidate join is equi on the list id" ->
        (p => !p.contains("CartesianProduct")),
      "per-vector top-k partially aggregated (bounded heap)" ->
        (_.contains("partial_")),
      "standing index checkpoint-truncated (one compute)" ->
        (_.contains("Scan ExistingRDD"))))
    audit("t23_bpe_encode", Seq(
      "pure map: no join anywhere (the merge list is a literal)" ->
        (p => !p.contains("Join")),
      "single corpus scan" ->
        (p => "Scan parquet".r.findAllIn(p).size == 1)))
    audit("tp9_curriculum", Seq(
      // the rank must be the two-phase range-bucket shape: the
      // per-doc window partitions by (stage, range-bucket) — the
      // only SinglePartition window is the ≤-stages-row offsets one
      "rank window partitioned by (stage, range-bucket)" ->
        (_.contains("hashpartitioning(stage")),
      "stage offsets broadcast" -> (_.contains("BroadcastHashJoin"))))
    audit("tp10_pack_masks", Seq(
      "span window partitioned by (bucket, pack)" ->
        (_.contains("hashpartitioning(bucket")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("q68_zorder_layout", Seq(
      // served THROUGH the rewritten layout: the box predicate must
      // reach the parquet scan of the layout, feeding row-group
      // stats pruning (BucketingSpec measures the per-file boxes)
      "box predicate pushed to the layout scan" ->
        (p => p.contains("PushedFilters: [") &&
          p.split("PushedFilters", 2)(1).take(300).contains("l_partkey")),
      "partial agg before exchange" -> (_.contains("partial_"))))
    audit("q69_exact_quantiles", Seq(
      // the corpus must never sort globally: the only windows are
      // the bounded histogram cumsum and the per-picked-bucket rank
      "histogram aggregated map-side" -> (_.contains("partial_")),
      "picked buckets probed via broadcast" ->
        (_.contains("BroadcastHashJoin")),
      // the only SinglePartition window is the domain-bounded
      // histogram cumsum; the corpus-row rank partitions per bucket
      "bucket re-rank window partitioned by bucket" ->
        (_.contains("hashpartitioning(b"))))
    audit("tp11_length_batches", Seq(
      "band rank window partitioned by (band, range-bucket)" ->
        (_.contains("hashpartitioning(band")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("mx8_effective_mixture", Seq(
      "overlap audit + totals ride broadcasts" ->
        (_.contains("BroadcastHashJoin")),
      "gram distinct combines map-side" -> (_.contains("partial_")),
      "no cartesian except the 1-row total" ->
        (p => "CartesianProduct".r.findAllIn(p).isEmpty)))
    audit("ve11_cov_drift", Seq(
      "moment cells partially aggregated before the exchange" ->
        (p => p.contains("partial_") || p.contains("ExistingRDD")),
      "means ride broadcasts onto the cells" ->
        (_.contains("BroadcastHashJoin"))))
    audit("mx7_epoch_plan", Seq(
      "source histogram partially aggregated map-side" ->
        (_.contains("partial_")),
      "1-row total rides a broadcast" ->
        (_.contains("BroadcastNestedLoopJoin"))))
    audit("ss29_knn_layout_census", Seq(
      "per-list count partial-aggregates map-side" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "census never reads the raw corpus (layout scan only)" ->
        (p => !p.contains("embeddings.parquet"))))
    audit("mx11_doremi_plan", Seq(
      "plan is a driver-built local relation" ->
        (p => p.contains("LocalTableScan") || p.contains("LocalRelation"))))
    audit("mx10_doremi_reweight", Seq(
      // the corpus paid ONE loss-aggregation job at build time; every
      // DRO round is driver arithmetic on the <=|sources| weight
      // table, so the emitted trajectory is a local relation
      "trajectory is a driver-built local relation" ->
        (p => p.contains("LocalTableScan") || p.contains("LocalRelation"))))
    audit("q13_window_rank", Seq(
      "single window exchange" ->
        (p => "Exchange".r.findAllIn(p).size <= 2)))
    audit("dd6_dedup_embedding_lsh", Seq(
      "bucket join is equi, not cartesian" -> (p => !p.contains("Cartesian"))))
    audit("q43_band_join", Seq(
      "band table broadcast (BNLJ)" ->
        (_.contains("BroadcastNestedLoopJoin"))))
    audit("dd2_dedup_jaccard", Seq(
      "identical self-join sides reuse the exchange" -> (p =>
        p.contains("ReusedExchange") || p.contains("BroadcastHashJoin"))))
    audit("dd7_curation_pipeline", Seq(
      "no cartesian anywhere in the pipeline" ->
        (p => !p.contains("Cartesian"))))
    audit("q48_window_highcard", Seq(
      "window exchange partitions on the high-cardinality key" ->
        (_.contains("hashpartitioning(l_orderkey")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("dd5_dedup_embedding", Seq(
      "LSH bucket join is equi, not cartesian (brute pairs are test-only)" ->
        (p => !p.contains("Cartesian"))))
    audit("q50_lateral_topn", Seq(
      // the correlated LIMIT must decorrelate: map-side top-k pruning
      // (WindowGroupLimit Partial) before the exchange, then a real
      // equi-join — a nested-loop per-customer re-scan would be
      // quadratic at scale
      "correlated LIMIT decorrelated to WindowGroupLimit" ->
        (_.contains("WindowGroupLimit")),
      "lateral join is an equi-join, not a nested loop" -> (p =>
        !p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"))))
    audit("q49_quota_sample", Seq(
      // phase 1 must window on (lang, split id): that's what spreads a
      // dominant language across partitions instead of one reducer
      "phase-1 window exchange keyed by (lang, split id)" -> (p =>
        "hashpartitioning\\(lang[^)]*pid".r.findFirstIn(p).isDefined),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("dc1_decontaminate", Seq(
      // the corpus side must PROBE a broadcast eval gram set — a
      // shuffled semi join would move the 100 TB side
      "eval gram set broadcast (semi probe)" -> (p =>
        p.contains("BroadcastHashJoin") && p.contains("LeftSemi")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("t08_repetition", Seq(
      "gram counts partially aggregated before exchange" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("t09_pmi_pairs", Seq(
      // pair generation must join on doc_id (co-partitioned per-doc
      // expansion), with vocabulary sides broadcast
      "vocab df joins broadcast" -> (_.contains("BroadcastHashJoin")),
      "top-n as TakeOrdered, not global sort" ->
        (_.contains("TakeOrderedAndProject")),
      "no cartesian" -> (p => !p.contains("Cartesian"))))
    audit("ve1_label_centroids", Seq(
      "centroid sums partially aggregated before exchange" ->
        (_.contains("partial_")),
      "single exchange on (label, dim)" ->
        (p => "Exchange".r.findAllIn(p).size <= 2)))
    audit("mx1_mixture_rebalance", Seq(
      "group histogram broadcast back to the corpus" ->
        (_.contains("BroadcastHashJoin"))))
    audit("dd9_dedup_incremental", Seq(
      // band-collision candidates must come from an equi join on
      // (band, key) — with a small batch the index side is probed
      "band join is equi, not cartesian" -> (p =>
        !p.contains("Cartesian")),
      // distinct-only aggregates carry no "partial_" marker; the
      // two-phase shape shows as a HashAggregate on each side of the
      // (new_id, index_id) exchange
      "candidates deduplicated map-side before the exchange" -> (p =>
        "HashAggregate\\(keys=\\[new_id".r.findAllIn(p).size >= 2),
      "small batch side broadcast in the band join" ->
        (_.contains("BroadcastHashJoin"))))
    audit("q52_zorder_stats", Seq(
      "bucket stats partially aggregated before exchange" ->
        (_.contains("partial_")),
      "z-key stays in whole-stage codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("dd11_embedding_incremental", Seq(
      "bucket join is equi, not cartesian" ->
        (p => !p.contains("Cartesian")),
      "small batch side broadcast in the bucket join" ->
        (_.contains("BroadcastHashJoin"))))
    audit("tp1_sequence_pack", Seq(
      // packing must parallelize across buckets: the window exchange
      // hashes on the bucket key, never a single global sort
      "cumulative sum partitioned by bucket" ->
        (_.contains("hashpartitioning(bucket")),
      // at most ONE range exchange (the final presentation orderBy);
      // a second one would mean the packing window itself went
      // through a global sort
      "no global sort beyond the output orderBy" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1)))
    audit("q54_key_skew", Seq(
      "key counts partially aggregated before the exchange" ->
        (_.contains("partial_")),
      "top-N as TakeOrdered, not a global sort" ->
        (_.contains("TakeOrderedAndProject")),
      "totals ride a broadcast 1-row frame (no corpus re-scan)" ->
        (_.contains("BroadcastNestedLoopJoin"))))
    audit("dc2_decontaminate_bloom", Seq(
      // the Bloom bitmap is ONE broadcast row, so the corpus probe is
      // a BNLJ against a 1-row build side — constant work per gram,
      // never a shuffle of the corpus
      "bitmap rides a 1-row broadcast (BNLJ probe)" ->
        (_.contains("BroadcastNestedLoopJoin")),
      "bloom probe stays in whole-stage codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q55_recursive_spine", Seq(
      // Spark 4 executes WITH RECURSIVE natively as an iterative
      // union loop — the spine is generated by the engine, not by a
      // driver-side loop
      "recursive CTE planned as a native union loop" -> (p =>
        p.contains("UnionLoop") || p.contains("CTERelation") ||
          p.contains("Recursion")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ve3_kmeans", Seq(
      // the final assignment is MAP-SIDE: k centroids packed into one
      // broadcast row, argmin as a per-row fold — no exchange keyed on
      // the vector id at all (the Lloyd update rounds run behind
      // checkpoint leaves; their shapes are audited in the spec suite)
      "packed centroids broadcast to the corpus scan" ->
        (_.contains("BroadcastNestedLoopJoin")),
      "assignment adds no vector-keyed exchange" ->
        (p => !p.contains("hashpartitioning(vec_id")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("t10_winnow", Seq(
      // the ordered window pass shuffles (doc_id, pos, hash) longs,
      // partitioned by doc_id — text never rides an exchange
      "window pass partitioned on doc_id" ->
        (_.contains("hashpartitioning(doc_id")),
      "gram expansion stays in codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("t11_boilerplate", Seq(
      "per-source gram df partially aggregated before the exchange" ->
        (_.contains("partial_")),
      "source sizes broadcast back" -> (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("m4_image_decode", Seq(
      // per-row encode/decode in mapPartitions: the only exchange is
      // the final tiny-row sort; doc text never rides a shuffle
      "shuffle-free but for the output sort" -> (p =>
        "Exchange".r.findAllIn(p).size <= 1),
      "column-pruned read (doc_id only)" -> (p =>
        p.contains("ReadSchema: struct<doc_id:bigint>"))))
    audit("m6_audio_energy", Seq(
      // per-row WAV encode/decode in mapPartitions: the only exchange
      // is the final tiny-row sort; payload pruned to the id column
      "shuffle-free but for the output sort" -> (p =>
        "Exchange".r.findAllIn(p).size <= 1),
      "column-pruned read (doc_id only)" -> (p =>
        p.contains("ReadSchema: struct<doc_id:bigint>"))))
    audit("share_list_tables", Seq(
      // pure catalog walk: rows come from driver HTTP responses,
      // never from data files — no file scan may appear in the plan
      "listing rows are local (no file scan)" -> (p =>
        p.contains("LocalTableScan") && !p.contains("FileScan")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("dd12_containment", Seq(
      "fingerprint join is a real equi-join" -> (p =>
        p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
          p.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("share_agg_count", Seq(
      // the stats-only aggregate path: COUNT/MIN/MAX computed on the
      // driver from per-file stats — the plan must be a local scan
      // with NO file read at all
      "aggregate answered from stats (LocalTableScan)" ->
        (_.contains("LocalTableScan")),
      "no parquet scan planned" -> (p => !p.contains("BatchScan"))))
    audit("ss7_recall_int8", Seq(
      // both top-k sides are broadcast-query corpus scans; the recall
      // intersection is a key-only semi join
      "truth/got intersect as a semi join" -> (_.contains("LeftSemi")),
      "no cartesian beyond the 1-row totals broadcast" ->
        (p => !p.contains("CartesianProduct"))))
    audit("dc3_eval_overlap", Seq(
      // eval gram set broadcast; only MATCHING (gram, corpus doc)
      // pairs reach the per-eval-doc aggregation
      "eval grams broadcast to the corpus probe" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ss6_ivf_trained", Seq(
      // training rounds run behind checkpoint leaves; serving must be
      // a broadcast probe + equi-join on the list id — no cartesian
      // reaches the corpus
      "probe join is equi on the list id" ->
        (p => !p.contains("CartesianProduct")),
      "query probe broadcast" -> (_.contains("BroadcastHashJoin"))))
    audit("ss8_pq_topk", Seq(
      // codebooks and query lookup tables ride broadcasts; encoding is
      // chained map-side argmin folds on one corpus scan — no real
      // join ever touches the corpus, and the only corpus-wide
      // exchange is the (query_id, neighbor_id, adist) top-k window
      "no cartesian reaches the corpus" ->
        (p => !p.contains("CartesianProduct")),
      "codes + lookup tables broadcast" ->
        (p => p.contains("BroadcastNestedLoopJoin") ||
          p.contains("BroadcastHashJoin")),
      "top-k shuffles narrow triples only" ->
        (p => "hashpartitioning\\(query_id".r.findAllIn(p).nonEmpty)))
    audit("ss9_ivfpq_topk", Seq(
      // coarse codebook, residual lookup, PQ books, and query tables
      // all ride broadcasts; the candidate join is a broadcast EQUI
      // join on the list id, so only probed-list members are scored
      "no cartesian reaches the corpus" ->
        (p => !p.contains("CartesianProduct")),
      "candidate join is broadcast equi on the list id" ->
        (_.contains("BroadcastHashJoin")),
      "top-k shuffles narrow triples only" ->
        (p => "hashpartitioning\\(query_id".r.findAllIn(p).nonEmpty)))
    audit("dd15_dedup_semantic", Seq(
      // cluster labels and survivor frames are near-dup-sized: both
      // ride broadcasts; the embeddings shuffle only inside the LSH
      // pair detector's narrow (id, table, bucket) exchanges
      "cluster/best frames broadcast" -> (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("dd16_dup_spans", Seq(
      // the gram-df filter probes back as a SEMI join on the gram
      // fingerprint (both sides corpus-sized — a broadcast would OOM
      // at 100 TB); islands then merge in a doc-keyed window
      "duplicated-gram probe is a semi join" -> (_.contains("LeftSemi")),
      "islands window partitioned by doc" ->
        (_.contains("hashpartitioning(doc_id")),
      "gram math stays in codegen (no UDF)" -> (p =>
        !p.contains("ScalaUDF") && !p.contains("BatchEvalPython")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("dd17_strip_spans", Seq(
      // the detector's semi-join + doc window shapes carry over from
      // dd16; the rewrite join is LEFT with the bounded span-list side
      // — never a cartesian — and the cut itself is a filter HOF, not
      // a UDF
      "duplicated-gram probe is a semi join" -> (_.contains("LeftSemi")),
      "rewrite joins on doc_id, no cartesian" -> (p =>
        p.contains("LeftOuter") && !p.contains("CartesianProduct")),
      "cut stays in codegen (no UDF)" -> (p =>
        !p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))))
    audit("t16_repeat_spans", Seq(
      // strictly per-document: multiplicity count and islands both run
      // in doc-keyed exchanges — no corpus-global aggregation at all
      "all exchanges doc-keyed" ->
        (_.contains("hashpartitioning(doc_id")),
      "no join at all (within-doc windows)" -> (p =>
        !p.contains("Join") && !p.contains("CartesianProduct")),
      "gram math stays in codegen (no UDF)" -> (p =>
        !p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))))
    audit("tp6_global_shuffle", Seq(
      // one shard-keyed exchange for the per-shard rank window; the
      // only range exchange is the declared output ORDER BY
      "rank window partitioned by shard" ->
        (_.contains("hashpartitioning(shard")),
      "no global single-reducer sort beyond the output ORDER BY" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1),
      "no join, no cartesian" -> (p =>
        !p.contains("Join") && !p.contains("CartesianProduct"))))
    audit("ve6_pca_project", Seq(
      // the direction is a broadcast LITERAL (trained before planning)
      // — projection is one pure map over the corpus scan: no joins,
      // no mid-plan exchange, only the output sort
      "no join, no cartesian" -> (p =>
        !p.contains("Join") && !p.contains("CartesianProduct")),
      "no mid-plan hash exchange" -> (p => !p.contains("hashpartitioning")),
      "one output sort only" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1)))
    audit("ve7_pca_whiten", Seq(
      // both whitened coordinates come from broadcast-literal
      // directions — one pure map over the corpus scan, like ve6
      "no join, no cartesian" -> (p =>
        !p.contains("Join") && !p.contains("CartesianProduct")),
      "no mid-plan hash exchange" -> (p => !p.contains("hashpartitioning")),
      "one output sort only" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1)))
    audit("q58_pagerank", Seq(
      // the iterative state is checkpoint-truncated: the final plan
      // reads the last round's materialized ranks, not an 8-deep
      // join lineage (the in-loop shapes are measured in METRICS.md)
      "rank lineage truncated at the checkpoint" ->
        (_.contains("ExistingRDD")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "one output sort only" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1)))
    audit("q60_triangles", Seq(
      // the canonical edge list is checkpoint-materialized once and
      // re-read for degrees, orientation and the adjacency build, so
      // the lineitem self-join that derived the edges runs once
      "edge derivation not replayed (checkpoint leaves)" ->
        (_.contains("ExistingRDD")),
      "no cartesian (annotation joins are key-equi)" ->
        (p => !p.contains("CartesianProduct")),
      "candidate wedges never materialize as rows (codegen'd " +
        "two-pointer intersection over sorted adjacency)" ->
        (_.contains("sortedlongintersect")),
      "adjacency broadcast back to the edge stream" ->
        (_.contains("BroadcastHashJoin")),
      "per-node counts partial-agg'd before the exchange" ->
        (_.contains("partial_"))))
    audit("q63_window_nav", Seq(
      // every navigation function shares ONE window spec: a single
      // hash exchange + sort feeds them all, plus the output range
      // sort — nothing else
      "at most two exchanges (window hash + output range)" -> (p =>
        "Exchange".r.findAllIn(p).size <= 2),
      "single Window node computes all functions" -> (p =>
        "Window \\[".r.findAllIn(p).size == 1),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q62_kcore", Seq(
      // the peel loop checkpoints edges every round, so the final
      // plan is one degree aggregation over the last round's
      // materialized edge list — not a 6-round join lineage
      "peel lineage truncated at the checkpoint" ->
        (_.contains("ExistingRDD")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "final degree count partial-agg'd before the exchange" ->
        (_.contains("partial_")),
      "one output sort only" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1)))
    audit("t17_encoding", Seq(
      // per-row regex counting folds map-side into a tiny per-source
      // aggregate: one corpus scan, counters-only exchange
      "partial agg before the exchange" -> (_.contains("partial_")),
      "regex counting stays in codegen (no UDF)" ->
        (p => !p.contains("BatchEvalPython") && !p.contains("ScalaUDF")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("st10_stateful_profile", Seq(
      // the batch twin of the transformWithState stream: one keyed
      // aggregation, partial before the exchange, cents quantized
      // per-row so stream and batch accumulate identical integers
      "partial agg before the exchange" -> (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q59_cms_freq", Seq(
      // the counter grid crosses the exchange partially aggregated
      // (≤ depth×width counters per partition); probes join the
      // 1024-row sketch broadcast; exact top-N is TakeOrdered
      "partial agg before exchange" -> (_.contains("partial_")),
      "sketch probe join is broadcast" -> (_.contains("BroadcastHashJoin")),
      "top-N as TakeOrdered" -> (_.contains("TakeOrdered")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q61_funnel", Seq(
      // the k-step funnel is ONE windowed pass, not k−1 self-joins of
      // the event log: no join at all; the three dependent running
      // windows share one (user_id) exchange and one (ts, event_id)
      // sort; per-user reach flags aggregate on the already-
      // partitioned rows
      "no self-join of the event log" -> (p => !p.contains("Join")),
      "one corpus exchange on user_id" ->
        (p => "hashpartitioning\\(user_id".r.findAllIn(p).size <= 1),
      "window chain shares one sort" ->
        (p => "\\bSort\\b".r.findAllIn(p).size <= 2),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q64_hll_registers", Seq(
      // register build partial-aggregates map-side (≤ groups×256
      // (reg, max-rank) pairs cross the exchange, never the corpus);
      // the exact-distinct probe is its own partial-agg; the final
      // sketch⋈exact join is groups-sized
      "partial agg before exchange" -> (_.contains("partial_")),
      "register merge is a max, map-side combinable" ->
        (_.contains("partial_max")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("share_changes_agg", Seq(
      // IVM merge: both change batches partial-aggregate before their
      // exchanges; the union re-agg is flag-keyed (6 rows), no rescan
      "partial agg before exchange" -> (_.contains("partial_")),
      "union of the two signed aggregates" -> (_.contains("Union")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("m5_image_dhash", Seq(
      // per-row codec work, payload-pruned to the id column; the only
      // exchange is the output ORDER BY
      "no mid-plan hash exchange" -> (p => !p.contains("hashpartitioning")),
      "one output sort only" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ve8_drift", Seq(
      // the corpus fan-out pipelines into the (dim, bin) hash agg
      // map-side; only O(dims × bins) counters cross an exchange
      "partial agg before exchange" -> (_.contains("partial_")),
      "totals join is broadcast" -> (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ve5_gram_matrix", Seq(
      // the d^2 fan-out pipelines straight into a partially-aggregated
      // hash agg: the exchange carries O(partitions x d^2), never the
      // exploded products
      "gram sums partially aggregated" -> (_.contains("partial_")),
      "no join, no cartesian" -> (p =>
        !p.contains("Join") && !p.contains("CartesianProduct")),
      "one output sort only" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1)))
    audit("dd14_dedup_keep_best", Seq(
      // the survivor argmax is a map-side-combinable max_by; the
      // cluster map and best frames ride broadcasts, quality never
      // shuffles with the corpus
      "cluster/best frames broadcast" -> (_.contains("BroadcastHashJoin")),
      "survivor argmax partially aggregated" -> (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("tp5_shard_audit", Seq(
      // same bucket-parallel shape as tp1: the window exchange hashes
      // on the bucket key; the rollup partially aggregates
      "window partitioned by bucket" ->
        (_.contains("hashpartitioning(bucket")),
      "rollup partially aggregated" -> (_.contains("partial_")),
      "no global sort beyond the output orderBy" ->
        (p => "rangepartitioning".r.findAllIn(p).size <= 1)))
    audit("q57_compaction_bins", Seq(
      // per-source windows parallel across sources — never a single
      // global sort of the corpus
      // binAssignments windows on the raw `source` column (renamed to
      // `part` only in the rollup projection)
      "window partitioned by the table partition key" ->
        (_.contains("hashpartitioning(source")),
      "rollup partially aggregated" -> (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("mx5_mixture_sqrt", Seq(
      "group histogram broadcast back to the corpus" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian beyond the 1-row totals broadcast" ->
        (p => !p.contains("CartesianProduct"))))
    audit("t14_lm_score", Seq(
      // count tables join on the gram fp — narrow keys, map-side
      // combinable aggregations, text never on an exchange
      "count aggregations partially aggregated" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "gram expansion stays in codegen (no UDF)" -> (p =>
        !p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))))
    audit("t15_classifier_score", Seq(
      // packed weights ride a 1-row broadcast; scoring is a per-row
      // integer fold — the only exchange is the output sort
      "weights ride a 1-row broadcast (BNLJ)" ->
        (_.contains("BroadcastNestedLoopJoin")),
      "zero corpus shuffle beyond the output sort" -> (p =>
        "rangepartitioning".r.findAllIn(p).size <= 1 &&
          !p.contains("hashpartitioning(doc_id")),
      "scoring stays in codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("q56_mad_outliers", Seq(
      // both medians are value-histogram aggregations; the 3-row
      // median/MAD frames broadcast back to the corpus scans
      "median frames broadcast to the corpus" ->
        (_.contains("BroadcastHashJoin")),
      "histogram partially aggregated before the exchange" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("st8_click_outer", Seq(
      // the batch twin of the outer stream join: a real equi-join on
      // user with the interval as a post-condition, never a cartesian
      "join is equi on user, not cartesian" ->
        (p => !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"))))
    audit("share_agg_by_flag", Seq(
      // grouped stats-only aggregate: one row per partition value,
      // still no file opened
      "grouped aggregate answered from stats (LocalTableScan)" ->
        (_.contains("LocalTableScan")),
      "no parquet scan planned" -> (p => !p.contains("BatchScan"))))
    audit("share_topn", Seq(
      // sort+limit pushed to the scan as a partial TopN: the scan
      // description carries the pushed spec (file pruning asserted in
      // DeltaShareConnectorSpec) and Spark keeps the authoritative
      // TakeOrdered above it
      "topN pushed to the scan" ->
        (_.contains("pushedTopN=l_orderkey ASC n=20")),
      "final TakeOrdered stays above (partial pushdown)" ->
        (_.contains("TakeOrderedAndProject"))))
    audit("share_offset", Seq(
      // complete offset pushdown: the scan description carries the
      // pushed offset and the Offset operator is GONE from the plan
      // (whole-file skip + boundary-row accounting asserted in
      // DeltaShareConnectorSpec)
      "offset pushed to the scan" -> (_.contains("pushedOffset=")),
      "Offset operator removed (complete pushdown)" ->
        (p => !p.contains("GlobalLimitAndOffset") &&
          !p.contains("Offset ("))))
    audit("share_stats_prune", Seq(
      // data skipping keeps the filters residual (correctness never
      // depends on pruning) while the scan plans fewer files — the
      // file-count assertion lives in DeltaShareConnectorSpec
      "residual filter above the scan" -> (_.contains("Filter")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q72_lpa_drift", Seq(
      // scheduler counters over the frozen label table: key-equi
      // probes only, every census aggregate collapses map-side, and
      // nothing sorts — the batch never re-shuffles the frozen table
      "census aggregates combine map-side" -> (_.contains("partial_")),
      "frozen table probed by equi joins, no cartesian" ->
        (p => !p.contains("CartesianProduct")),
      "Window-free (counters, not ranks)" ->
        (p => !p.contains("Window"))))
    audit("ss32_pq_drift_census", Seq(
      // ONE batch scan: coarse assignment, residual, and all m
      // per-subspace argmin folds are chained projections against
      // 1-row broadcast artifacts (BroadcastNestedLoopJoin on a
      // packed single row, never a cartesian of data tables)
      "frozen artifacts ride 1-row broadcasts" ->
        (_.contains("BroadcastNestedLoopJoin")),
      "census combines map-side before the m-key exchange" ->
        (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free" -> (p => !p.contains("Window"))))
    audit("ss34_sq8_list_census", Seq(
      // one list-grouped count over the partitioned layout: combines
      // map-side, the 1-row total rides a broadcast, nothing sorts
      "list counts combine map-side" -> (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free" -> (p => !p.contains("Window"))))
    auditExecuted("ss33_pq_codebook_retrain", Seq(
      // serving through the RETRAINED layout keeps the ss22 shape:
      // the probe still prunes the code directories at runtime
      "retrained layout still serves under DPP" ->
        (_.contains("dynamicpruning")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "Window-free serving (in-row probe + bounded-heap rank)" ->
        (p => !p.contains("Window"))))
    audit("dd13_dedup_editdist", Seq(
      // banding proposes, bounded-prefix Levenshtein verifies — the
      // band join must be equi and the DP must stay in codegen
      "band join is equi, not cartesian" -> (p =>
        !p.contains("CartesianProduct")),
      "levenshtein stays in whole-stage codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("tp4_token_budget", Seq(
      // the per-doc cumulative window is partitioned by the quality
      // micro-key — parallel across keys (the only SinglePartition
      // window runs over the tiny histogram frame)
      "per-doc window partitioned on the quality micro-key" ->
        (_.contains("hashpartitioning(qk")),
      "histogram offsets broadcast back to the corpus" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("ss5_topk_quantized", Seq(
      // same shape as ss1: queries broadcast, ONE corpus scan —
      // the quantized index is never shuffled
      "query codes broadcast (corpus not shuffled)" ->
        (_.contains("BroadcastNestedLoopJoin")),
      "integer dots stay in codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("t13_pii_scrub", Seq(
      // per-row regex scan: the only exchange is the output sort
      "shuffle-free but for the output sort" -> (p =>
        "Exchange".r.findAllIn(p).size <= 1),
      "regex ops stay in codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("q65_transitions", Seq(
      // the lead window is the only corpus exchange; the ppm window
      // runs over the tiny (from,to) matrix
      "successor pairing partitioned on user" ->
        (_.contains("hashpartitioning(user_id")),
      "pair counts partial-aggregated map-side" -> (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("m7_scene_cuts", Seq(
      // frame render+hash is per-row; one media-keyed exchange feeds
      // the lag + cumsum windows (plus the output sort)
      "frame windows partitioned on media" ->
        (_.contains("hashpartitioning(media_id")),
      "at most two exchanges (window + output sort)" -> (p =>
        "Exchange".r.findAllIn(p).size <= 2),
      "no UDF in the hash pipeline" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("tp8_pack_execute", Seq(
      // the (bucket, pack) aggregate combines map-side; per-key state
      // is bounded by seqLen structs
      "sequence aggregate partial-aggregated map-side" ->
        (_.contains("partial_")),
      "doc join is key-equi, not cartesian" ->
        (p => !p.contains("CartesianProduct")),
      "no UDF in the fold" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("m9_audio_trim", Seq(
      // endpoint trim needs no window: one media-keyed partial agg
      "trim rollup partial-aggregated map-side" -> (_.contains("partial_")),
      "at most two exchanges (agg + output sort)" -> (p =>
        "Exchange".r.findAllIn(p).size <= 2)))
    audit("ve9_whiten_outliers", Seq(
      // zero-exchange map-side projection + TakeOrdered top-N
      "top-N as TakeOrdered, not a global sort" -> (p =>
        p.contains("TakeOrderedAndProject") || p.contains("TakeOrdered")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("dc4_fuzzy_contamination", Seq(
      // eval band keys ride broadcasts; candidates come from the
      // band-key equi-join, never a cross product
      "band-collision join is equi, not cartesian" ->
        (p => !p.contains("CartesianProduct")),
      "no UDF in the banding/verify path" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("ss11_filtered_topk", Seq(
      // the label predicate reaches the parquet scan — filtered
      // vector search pays only the matching stripe
      "label filter pushed to the scan" ->
        (_.contains("EqualTo(label,3)")),
      "queries broadcast (corpus not shuffled)" ->
        (_.contains("BroadcastNestedLoopJoin"))))
    audit("m8_keyframes", Seq(
      // the scene rollup is one narrow hash agg over m7's windowed
      // rows — nothing frame-sized survives, partial agg map-side
      "scene rollup partial-aggregated map-side" -> (_.contains("partial_")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "no UDF" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("t19_corpus_health", Seq(
      // explode to (source, fp) longs; both rollups combine map-side
      "vocabulary agg partial-aggregated map-side" ->
        (_.contains("partial_")),
      "text never shuffles (exchanges carry source+longs)" -> (p =>
        "Exchange".r.findAllIn(p).size <= 3),
      "no UDF" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("tp7_interleave", Seq(
      // per-source rank runs partitioned by (source, range-bucket) —
      // never one reducer per source
      "rank window partitioned on (source, range-bucket)" ->
        (_.contains("hashpartitioning(source")),
      "histogram offsets + source index broadcast back" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("dd18_soft_dedup", Seq(
      // cluster sizes ride a broadcast; the corpus never shuffles for
      // the weight assignment (resolveClusters iterations are eager
      // behind localCheckpoint leaves)
      "cluster map broadcast onto the corpus" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("t18_bpe_merges", Seq(
      // rounds run over the vocabulary frame behind localCheckpoint
      // leaves; the visible plan is the union of per-round argmax
      // rows — nothing corpus-sized may appear
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "no UDF" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("ss10_mips_topk", Seq(
      // augmented queries broadcast; the corpus buckets map-side and
      // joins equi on (table, bucket) — never a cross product
      "candidate join is equi on the bucket key" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct")),
      "augmentation/dots stay in codegen (no UDF)" -> (p =>
        !p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))))
    audit("mx6_exact_split", Seq(
      "rank window partitioned on (stratum, range-bucket)" ->
        (_.contains("hashpartitioning(lang")),
      "histogram + stratum sizes broadcast back" ->
        (_.contains("BroadcastHashJoin")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    audit("q66_retention", Seq(
      // one corpus exchange: the (user, week) distinct; cohort agg
      // and join reuse the user partitioning
      "distinct pass partitioned on user" ->
        (_.contains("hashpartitioning(user_id")),
      "cohort sizes from a window, not a corpus re-scan" ->
        (p => "BatchScan|FileScan|Scan parquet".r.findAllIn(p).size <= 1
          || !p.contains("parquet")),
      "no cartesian" -> (p => !p.contains("CartesianProduct"))))
    // dd8 resolveClusters / dd10 resolveClustersStars: their
    // iterations run eagerly behind localCheckpoint leaves, so the
    // returned plan is a leaf select; the shape guarantees
    // (paired-subset-only labels, lineage truncation, O(diameter)
    // vs O(log^2 n) rounds) are asserted in PipelineOperatorsSpec
    // instead of by plan grep.

    // full formatted plans for the flagship + one pipeline query
    println("\n==== q01 formatted ====")
    SparkEntry.queries("q01_pricing_summary")(spark, sf).explain("formatted")
    println("\n==== dd3 formatted ====")
    SparkEntry.queries("dd3_dedup_minhash")(spark, sf).explain("formatted")
    spark.stop()
  }
}
