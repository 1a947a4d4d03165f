package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val d = "/root/testdata/sf0.01"
    val interesting = if (args.nonEmpty) args.toSeq else Seq(
      "q03_filter_in_projection", "q04_join_left_enrich", "q05_join_inner_agg",
      "q12_geo_haversine", "q16_window_rewards_5d", "q30_cosine_topk",
      "q22_witness_explode_pipeline", "q44_asof_join", "q45_range_join",
      "q48_sequence_packing", "q51_ann_multiprobe", "q80_pq_adc_topk",
      "q82_cms_heavy_hitters", "q85_bloom_contamination",
      "q100_span_dedup", "q101_jsonlines_roundtrip", "q103_lm_fluency",
      "q120_components_incremental", "q121_image_neardup", "q122_funnel4",
      "q125_chunk_windows", "q127_sft_render", "q128_unigram_segment",
      "q129_retrieval_index", "q130_cdc_chunks", "q132_dataset_card",
      "q135_audio_neardup", "q137_video_frames", "q138_video_neardup", "q139_video_scenes",
      "q157_bm25_topk", "q161_hybrid_rrf", "q162_bm25_registry",
      "q184_wl_kernel", "q185_curriculum_order", "q187_curriculum_extend",
      "q188_curriculum_registry", "q190_curriculum_shards",
      "q191_dedup_agreement", "q192_global_shuffle", "q193_mixing_quality",
      "q194_ltr_features", "q195_ltr_registry", "q196_late_arrivals",
      "q197_quality_calibration", "q198_pack_nostraddle",
      "q200_ordered_pipeline", "q202_retrieval_serve")
    for (name <- interesting) {
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $name =====")
      // headline signals only
      plan.linesIterator.foreach { l =>
        if (l.contains("PushedFilters") || l.contains("ReadSchema") ||
            l.contains("Scan parquet") || l.contains("BroadcastHashJoin") ||
            l.contains("SortMergeJoin") || l.contains("WholeStageCodegen") ||
            l.contains("Exchange") || l.contains("CartesianProduct") ||
            l.contains("BroadcastNestedLoopJoin"))
          println(l.trim.take(160))
      }
    }
    spark.stop()
  }
}
