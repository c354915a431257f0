package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    // tee everything to target/plan_audit.txt — stdout tails truncate
    val sb = new StringBuilder
    def emit(s: String): Unit = { println(s); sb.append(s).append('\n') }
    for (name <- Seq("q_filter_ops", "q_fields_excl", "q_merge_left", "q_merge_anti",
      "q1_agg", "q_sort_limit", "q_dedup_jaccard", "q_dedup_minhash",
      "q_dedup_corpus", "q_ann_topk", "q_ann_ivf", "q_embed_lsh",
      "q_corpus_prep", "q_vocab_topk", "q_asof",
      "q_fingerprint", "q_split_sizes", "q_group_pctl_approx",
      "q_ann_lsh_topk", "q_dedup_simhash", "q_decontaminate",
      "q_chunk", "q_pack", "q_mix_sample", "q_shuffle", "q_pii",
      "q_shards", "q_tfidf", "q_lm_score", "q_dup_spans",
      "q_dedup_substr", "q_sample_topk", "q_sample_stratum",
      "q_token_budget", "q_dedup_embed", "q_quality_filter",
      "q_range_join", "q_encode", "q_dsir_select",
      "q_dedup_incr", "q_lm2_score", "q_report",
      "q_mix_temperature", "q_embed_quant", "q_dedup_keep_best",
      "q_dedup_simhash_port", "q_ann_ivf_exact", "q_ann_pq_refined_exact",
      "q_dedup_containment", "q_ann_quant",
      "q_embed_lsh_exact", "q_ann_lsh_exact", "q_top_ngram",
      "q_embed_pool", "q_normalize", "q_entropy",
      "q_ann_persisted", "q_fixpoint",
      "q_dedup_bloom", "q_url_curate", "q_para_dedup",
      "q_script_ratio", "q_winnow", "q_bm25",
      "q_weighted_sample", "q_zorder",
      "q_funnel", "q_source_overlap",
      "q_histogram", "q_rolling", "q_embed_quant")) {
      val df = SparkEntry.queries(name)(spark, dir)
      // execute first: under AQE the pre-execution plan prints
      // isFinalPlan=false with no WholeStageCodegen spans — only the
      // final plan shows what actually ran
      val qe = df.queryExecution
      qe.executedPlan.executeCollect()
      val plan = qe.executedPlan.toString
      def has(s: String) = plan.contains(s)
      emit(s"AUDIT $name: pushed=${plan.contains("PushedFilters: [")} " +
        s"bcast=${has("BroadcastHashJoin")} smj=${has("SortMergeJoin")} " +
        s"cartesian=${has("CartesianProduct")} bnlj=${has("BroadcastNestedLoopJoin")} " +
        // codegen'd nodes print as `*(stageId)` prefixes in the simple plan
        s"wsc=${has("*(")} topn=${has("TakeOrderedAndProject")}")
      val rs = plan.linesIterator.filter(_.contains("ReadSchema")).take(2).toList
      rs.foreach(l => emit("AUDIT   " + l.trim.take(150)))
      val pf = plan.linesIterator.filter(_.contains("PushedFilters")).take(2).toList
      pf.foreach(l => emit("AUDIT   " + l.trim.take(150)))
    }
    try {
      val out = java.nio.file.Paths.get("target/plan_audit.txt")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, sb.toString)
    } catch { case e: Throwable =>
      System.err.println(s"plan audit: could not write target/plan_audit.txt: $e")
    }
    spark.stop()
  }
}
