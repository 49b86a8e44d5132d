package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ramp probe: synthesizes an N-times replica of the sf0.1 tables
  * (keys shifted per replica so join/group cardinalities scale too),
  * then times representative queries at 1x and Nx. Near-linear ratios
  * mean the plans scale; super-linear ones flag an operator to fix
  * before 100 TB.
  *
  *   sbt "runMain graft.tools.ScaleProbe 10"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, keyCols: Map[String, Long],
                  saltText: Boolean = false): DataFrame =
      (0 until factor).map { i =>
        val keyed = keyCols.foldLeft(df) { case (d, (c, span)) =>
          d.withColumn(c, col(c) + lit(i * span))
        }
        // Replica i>0 gets a replica-specific token spliced in after every
        // 7 words: the replicas become DISTINCT content (cross-replica
        // jaccard drops well below any dedup threshold) while each
        // replica's own planted near-dups survive. Byte-identical
        // replicas would instead multiply every true dup cluster by the
        // factor — the CORRECT near-dup answer then grows quadratically
        // and no sub-quadratic algorithm can emit it in linear time, so
        // the ramp would measure answer growth, not plan quality.
        if (saltText && i > 0)
          keyed.withColumn("text",
            regexp_replace(col("text"), "((\\S+\\s+){7})", s"$$1zr$i "))
        else keyed
      }.reduce(_ unionByName _)

    if (!new java.io.File(out).exists()) {
      val span = 10000000L
      replicate(graft.Tables.lineitem(spark, base),
        Map("l_orderkey" -> span)).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      replicate(graft.Tables.orders(spark, base),
        Map("o_orderkey" -> span, "o_custkey" -> 0L))
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      replicate(graft.Tables.events(spark, base),
        Map("event_id" -> span, "user_id" -> 10000L))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      replicate(graft.Tables.documents(spark, base),
        Map("doc_id" -> span), saltText = true)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      replicate(graft.Tables.embeddings(spark, base),
        Map("vec_id" -> span)).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      // dims unscaled
      Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
        graft.Tables.table(spark, base, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    }

    val probes = Seq("q1_agg", "j1_interval_join", "j3_dim_enrich", "a1_product_stats",
      "st1_is_new", "st3_bounce", "a4_keyword_stats", "x_dedup_exact",
      "x_dedup_ngram", "x_dedup_minhash", "x_dedup_apply",
      "x_corpus_pipeline", "x_text_quality",
      // round-4 surface: cluster resolution + the sampling/assembly ops
      // (x_pii_redact rides the unscaled customer dim — no ramp to measure)
      "x_dedup_clusters", "x_text_repetition", "x_sample_stratified",
      "x_sample_mixture", "x_sample_shard", "x_corpus_assembly",
      "x_decontaminate", "x_embed_quantize", "x_ann_quantized",
      "x_text_topterms",
      // round-5 surface: event analytics, OLAP aggregates, the new join
      // operators, and the text/packing/sampling additions
      "e1_funnel", "e2_retention", "a6_rollup", "a7_pivot",
      "a8_percentiles", "j7_asof_join", "j8_range_join", "x_text_bm25",
      "x_text_normalize", "x_pack_sequences", "x_sample_weighted",
      // round-6 surface: the streaming as-of join's batch face, multi-term
      // BM25 retrieval, and the approx-swap gates (t-digest / HLL plans)
      "j7_asof_stream", "x_text_bm25_topk", "a8_percentiles_approx",
      "e2_retention_approx", "e2_retention_stream",
      // round-6 second batch: skew/profiling/layout/dedup/sketch ops
      "j9_salted_join", "a9_heavy_hitters", "x_dedup_lines",
      "x_zorder_key", "a10_sketch_cube", "j10_bloom_semi", "a11_profile",
      "j7_asof_fwd", "j7_asof_tol", "j7_asof_near", "x_bpe_pairs",
      "x_corpus_refine", "w10_gapfill", "w9_running", "a12_winsorized",
      "a6b_cube", "x_frame_sample",
      // round-6 third batch: path analytics + sketch algebra/cube
      "e3_path_transitions", "e3_path_sessions", "a13_theta_segments",
      "a14_kll_cube", "w11_ohlc", "a15_histogram", "e4_funnel_latency",
      "q3_shipping_priority", "q10_returned_items", "w12_period_delta",
      // round-6 fourth batch
      "x_embed_centroid", "x_dedup_substrings", "e5_pagerank",
      "x_kmeans_assign", "x_kmeans_step", "q17_small_quantity",
      "x_dsir_weights", "d1_scd2", "w13_rolling_range", "x_quality_rank",
      "e6_attribution", "j12_dim_asof", "x_negatives",
      "w14_twap", "w15_vwap", "a16_listagg",
      // round-7 surface: the PPJoin n-gram scale path (vs the quadratic
      // exactness gate above), the bigram-LM quality scorer, and the
      // funnel state machine's batch face. The real-engine streaming
      // gates (j1_interval_stream, w11_ohlc_stream, w6_session_stream)
      // are NOT probed: their plans are the already-probed batch plans
      // plus fixed streaming-harness overhead (state store + sink
      // commit), which a ramp would mis-read as super-linear growth.
      "x_dedup_ngram_ppjoin", "x_lm_typicality", "e1_funnel_stream",
      // round-7 second batch: containment dedup (both paths — the salt
      // breaks ~3 grams per 7 words, so cross-replica containment sits
      // far below the 0.9 threshold and the true answer scales
      // linearly), the CCNet composition, and the Q21 decorrelation.
      // st2/st3_bounce_stream are real-engine gates — excluded per the
      // streaming-harness note above.
      "x_dedup_contain", "x_dedup_contain_prefix", "x_ccnet_refine",
      "q21_waiting_suppliers", "x_contain_apply", "w16_capped_sessions",
      // round-9 additions not yet probed: the rolling median (one
      // per-type sort + frame-bounded state), MAD (two bounded
      // percentile aggregates), Benford (one 9-row aggregate) and the
      // lexical-diversity audit (vocabulary-keyed aggregate) over the
      // 10× events/orders/corpus
      "w19_rolling_median", "a18_mad", "a19_benford", "x_diversity",
      // round-9 second batch: EWMA/CUSUM ride one per-type sort; the
      // fingerprint and incremental cube are keyed aggregates; FK audit
      // is four dim-distinct joins; typo pairs collapse to vocabulary
      // before fan-out (the 10× corpus shares its vocab — the probe
      // measures the tokenize+agg, the quadratic is oracle-only);
      // media metadata is a pure map-side scan; example sampling is
      // one TopKAgg aggregate
      "w20_ewma", "w21_cusum", "a20_fingerprint", "d2_incremental",
      "j13_fk_audit", "x_typo_pairs", "x_multimodal_meta",
      "x_sample_examples",
      // the native physical as-of against its composed twin — identical
      // query, identical oracle, different plan tier
      "j14_asof_native", "e9_frequent_paths", "e10_linear_attribution",
      "w22_seasonal", "x_lang_confusion", "x_wav_pcm",
      // the distributed-prefix-sum rank against its single-partition
      // twin — the ramp the swap exists to flatten — and the PPS
      // sampler riding the same prefix-sum machinery
      "x_quality_rank_scale", "x_sample_pps",
      // round-8 surface: the measured direct-vs-prefix crossover switch
      // (on the probe's small-vocab corpus it must pick direct and ramp
      // like the direct gate), plus the new curation/retrieval ops and
      // the Q18 decorrelation. j4_outer_stream is a real-engine gate —
      // excluded per the streaming-harness note above.
      "x_dedup_ngram_auto", "x_chunk_overlap", "x_text_winnow",
      "x_quality_rules", "x_semdedup", "x_embed_outliers",
      "q18_large_orders", "x_hybrid_rrf", "x_corpus_card",
      // round-9 surface: PQ ANN (corpus-sized encode + candidate scan),
      // the threshold-selection token budget, snapshot diff (hash-only
      // shuffle), decay scoring (one aggregate), the Q5 join chain, and
      // the corpus-report faces; x_dedup_indoc is map-side by
      // construction, probed to pin that it stays so.
      "x_ann_pq", "x_token_budget", "x_snapshot_diff", "w17_decay_score",
      "q5_local_supplier", "x_vocab_coverage", "x_dedup_indoc",
      "x_dedup_keep_longest", "x_text_novelty", "x_ann_ivfpq",
      "q7_volume_shipping", "p11_variant_props", "x_quality_calibrate",
      "x_mixture_audit", "x_split_leakage_safe",
      // round-9 third batch: CDC chunking is map-side by construction
      // (probed to pin that it stays so); k-center is k bounded scans, so
      // its ramp should track a plain corpus scan.
      "x_chunk_cdc", "x_coreset_kcenter",
      // boilerplate/overlap: line- and vocabulary-keyed aggregates whose
      // outputs are threshold- and |sources|²-bounded; Q13: two scans,
      // orders aggregated before the outer join.
      "x_boilerplate", "x_source_overlap", "q13_customer_distribution",
      // round-10 media decode gates: pure map-side expression scans
      // (fixture build + decode per row, no shuffle) — probed to pin
      // that they stay so
      "x_gif_pixels", "x_png_pixels", "x_jpeg_pixels", "x_wav_g711",
      // image near-dup: decode scan + banded 16-bit-key shuffle (the
      // LSH recall/precision shape); html extraction: pure regex scan
      "x_image_neardup", "x_html_text", "x_url_canonical",
      // MMR: k bounded scans like k-center; RBO: bounded ≤25-row algebra
      // after the two already-probed top-k retrievers.
      "x_coreset_mmr", "x_rank_rbo",
      // round-8 continuation: the TPC-H completion set (scaled facts,
      // unscaled dims — the broadcast/one-exchange contracts must hold
      // the ramp), IVF delta assignment (map-side argmax over the
      // scaled delta), phrase search (postings scale linearly; the
      // splice salt only removes ~1/7 of adjacencies), and SNM (answer
      // is |corpus|·window-bounded by construction, so the ramp
      // measures the sort+self-join plan, not answer growth).
      "q2_min_cost_supp", "q4_priority_count", "q6_forecast_revenue",
      "q8_market_share", "q9_product_profit", "q11_important_parts",
      "q12_ship_class", "q14_promo_effect", "q15_top_supplier",
      "q16_supplier_count", "q19_disjunctive_revenue",
      "q20_dominant_supplier", "q22_sales_opportunity",
      "x_ann_assign_new", "x_search_phrase", "x_dedup_snm",
      // graph additions: identity stitch (CC on user-count-sized pairs;
      // replicas share device ids so components widen — rounds stay
      // diameter-bounded), triangles (co-supply graph is supplier-dim-
      // bounded; the ramp measures the supply distinct), grouping sets
      // (one Expand + one aggregate).
      "e7_identity_stitch", "e8_triangles", "a6c_grouping_sets",
      // z-score rides one per-type sort of the scaled events; RFM's
      // quartile cuts now ride the distributed globalNtile (range
      // shuffle + pid-keyed windows — the ramp pins that the swap
      // stays flat where the single-partition NTILE would not).
      "w18_zscore", "a17_rfm",
      // round-11 media gates: pure map-side expression scans (fixture
      // build + decode per row); the web pipeline's URL-dedup groups
      // scale with the corpus while survivors stay page-id-bounded, so
      // the ramp measures the canon shuffle + per-domain aggregates.
      "x_jpeg_color", "x_av_meta", "x_web_pipeline",
      "x_av_duration", "x_warc_extract",
      "x_jpeg_progressive", "x_subtitle_cues", "x_id3_tags",
      "x_robots_filter", "x_sitemap_entries", "x_crawl_frontier",
      // round-12 additions: gzip-member expansion, the HTTP response
      // split, and the fetch->extract composition are all map-side
      // per-blob expression scans; the frontier's discovery join and
      // the web pipeline's global near-dup tier ride already-probed
      // key-equality joins
      "x_warc_gz", "x_http_response", "x_fetch_extract",
      // the politeness schedule: per-domain windows (domains scale,
      // per-domain fan-in is the semantic unit); content extraction is
      // per-doc regexp chains + a doc-local block window
      "x_crawl_schedule", "x_content_extract",
      "x_link_extract", "x_link_graph", "x_link_rank", "x_robots_status")
    // x_dedup_eval is deliberately NOT probed: its exact side is the
    // designed-quadratic x_dedup_ngram (already probed as the quadratic
    // reference) — the eval gate would just re-measure that growth.
    // j11_overlap_join is deliberately NOT probed: replicas keep the
    // source price range, so the TRUE overlap-pair answer grows ~factor²
    // (every replica's intervals overlap every other's) — the probe
    // would measure answer growth, not the plan (cf. simhash below).
    // x_dedup_simhash is deliberately NOT probed: the text salt makes
    // replicas distinct under shingle-Jaccard but NOT under
    // distinct-token SimHash (one spliced token flips only near-tie
    // fingerprint bits), so cross-replica pairs stay within hamming<=3
    // and the true answer grows super-linearly (measured 30x pairs at
    // 10x docs) — the probe would measure answer growth, not the plan.
    // warm-up
    graft.Tables.lineitem(spark, out).count()
    // optional: probe only the queries named after the factor arg
    val selected = if (args.length > 1) probes.filter(args.tail.contains) else probes
    val results = selected.map { name =>
      val fn = graft.SparkEntry.queries(name)
      def time(dir: String): Double = {
        // cold artifacts per measurement: session-shared builds (LSH
        // pair set, IVF index) would otherwise make later probes
        // measure a parquet read instead of the operator
        graft.llm.Dedup.resetArtifactCache()
        graft.llm.Similarity.resetArtifactCache()
        val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
      }
      val t1 = time(base)
      val tN = time(out)
      (name, t1, tN, tN / t1)
    }
    println(f"""[scale] factor=$factor""")
    results.foreach { case (n, t1, tN, r) =>
      println(f"[scale] $n%-22s 1x=$t1%6.2fs ${factor}x=$tN%7.2fs ratio=$r%5.2f")
    }
    spark.stop()
  }
}
