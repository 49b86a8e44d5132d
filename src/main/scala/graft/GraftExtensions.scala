package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{SimhashAgg, SketchAgg, TextExpressions, Tokenize, TopKAgg, VectorExpressions}

/** SparkSessionExtensions entry point: registers every custom Catalyst
  * function this library ships, so any session — including plain
  * spark-sql / thrift-server deployments — gets them via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Functions: cosine_sim, dot_product, l2_norm (codegen'd vector
  * expressions), split_keyword (codegen'd tokenize + Explode), simhash_agg and
  * top_k_agg (typed imperative aggregates).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.functions.RewriteSetCount)
    // whole-operator tier: the native as-of join's planner strategy
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    def info(name: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    inject("cosine_sim", es => VectorExpressions.CosineSim(es.head, es(1)))
    inject("dot_product", es => VectorExpressions.DotProduct(es.head, es(1)))
    inject("l2_norm", es => VectorExpressions.L2Norm(es.head))
    inject("split_keyword", es => Tokenize.splitKeywordExpr(es.head))
    inject("nfc_normalize", es => TextExpressions.NfcNormalize(es.head))
    inject("compression_ratio", es => TextExpressions.CompressionRatio(es.head))
    // container-format header probes over binary media columns
    inject("media_format", es => graft.functions.BinaryMeta.MediaFormat(es.head))
    inject("media_width", es => graft.functions.BinaryMeta.MediaWidth(es.head))
    inject("media_height", es => graft.functions.BinaryMeta.MediaHeight(es.head))
    inject("wav_sample_rate", es => graft.functions.BinaryMeta.WavSampleRate(es.head))
    inject("wav_channels", es => graft.functions.BinaryMeta.WavChannels(es.head))
    inject("wav_pcm_stats", es => graft.functions.BinaryMeta.WavPcmStats(es.head))
    inject("bmp24_stats", es => graft.functions.BinaryMeta.Bmp24Stats(es.head))
    inject("gunzip_members", es => graft.functions.BinaryMeta.GunzipMembers(es.head))
    inject("http_meta", es => graft.functions.BinaryMeta.HttpMeta(es.head))
    inject("http_body", es => graft.functions.BinaryMeta.HttpBody(es.head))
    inject("simhash_agg", es => SimhashAgg(es.head).toAggregateExpression())
    // interleave_bits(bits, c1, c2, ...): Morton key; bits must be a literal
    inject("interleave_bits", { es =>
      require(es.length >= 3, "interleave_bits(bits, c1, c2, ...) needs bits + >=2 inputs")
      val bits = es.head.eval(null) match {
        case n: java.lang.Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"interleave_bits: bits must be an integer literal, got $other")
      }
      graft.functions.ZOrder.InterleaveBits(es.tail, bits)
    })
    // freq_agg(key, capacity): Misra-Gries heavy-hitter summary;
    // capacity must be a positive integer literal
    inject("freq_agg", { es =>
      require(es.length == 2, "freq_agg(key, capacity) takes exactly 2 arguments")
      val cap = es(1).eval(null) match {
        case n: java.lang.Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"freq_agg: capacity must be a positive integer literal, got $other")
      }
      graft.functions.FreqAgg.coerced(es.head, cap).toAggregateExpression()
    })
    // top_k_agg(value, id, k): k must be a positive integer literal
    inject("top_k_agg", { es =>
      require(es.length == 3, "top_k_agg(value, id, k) takes exactly 3 arguments")
      val kExpr = es(2)
      require(kExpr.foldable, "top_k_agg: k must be a literal")
      val k = kExpr.eval(null) match {
        case n: java.lang.Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"top_k_agg: k must be a positive integer literal, got $other")
      }
      require(k > 0, "top_k_agg: k must be a positive integer literal")
      TopKAgg.coerced(es.head, es(1), k).toAggregateExpression()
    })
    // theta / KLL sketch surface (functions.SketchAgg); size params must
    // be integer literals — they shape the aggregation buffer
    def intLit(e: Expression, fn: String): Int = e.eval(null) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: size parameter must be an integer literal, got $other")
    }
    inject("theta_sketch_agg", { es =>
      require(es.length == 2, "theta_sketch_agg(col, lgK) takes exactly 2 arguments")
      SketchAgg.ThetaSketchAgg(es.head, intLit(es(1), "theta_sketch_agg"))
        .toAggregateExpression()
    })
    inject("theta_union_agg", { es =>
      require(es.length == 2, "theta_union_agg(sketch, lgK) takes exactly 2 arguments")
      SketchAgg.ThetaUnionAgg(es.head, intLit(es(1), "theta_union_agg"))
        .toAggregateExpression()
    })
    inject("theta_intersect_agg",
      es => SketchAgg.ThetaIntersectAgg(es.head).toAggregateExpression())
    inject("theta_estimate", es => SketchAgg.ThetaEstimate(es.head))
    inject("theta_difference", es => SketchAgg.ThetaDifference(es.head, es(1)))
    inject("kll_sketch_agg", { es =>
      require(es.length == 2, "kll_sketch_agg(col, k) takes exactly 2 arguments")
      SketchAgg.KllDoublesAgg(es.head, intLit(es(1), "kll_sketch_agg"))
        .toAggregateExpression()
    })
    inject("kll_merge_agg", { es =>
      require(es.length == 2, "kll_merge_agg(sketch, k) takes exactly 2 arguments")
      SketchAgg.KllMergeAgg(es.head, intLit(es(1), "kll_merge_agg"))
        .toAggregateExpression()
    })
    inject("kll_quantile", es => SketchAgg.KllQuantile(es.head, es(1)))
  }
}
