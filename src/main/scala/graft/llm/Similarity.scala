package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.cosineSim

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, 64-dim in the test tables).
  *
  * - `bruteForceTopK` — exact baseline: broadcast the (small) query set,
  *   scan the corpus once, per-query top-k via window. The corpus is never
  *   shuffled by value; cost is one pass × |queries|. This is the
  *   correctness oracle for the approximate paths.
  * - `ivfTopK` — IVF scale path: deterministic k-means (seeded init from
  *   hashed vec ids, fixed Lloyd iterations) builds `nlist` centroids; each
  *   corpus vector is assigned once; a query probes only its `nprobe`
  *   nearest clusters. At 100 TB the corpus is partitioned/bucketed BY
  *   cluster id so a probe touches only those partitions (partition
  *   pruning), and centroids stay broadcast.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        round(cosineSim(col("qe"), col("ce")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), col("cos_sim"))
  }

  /** Deterministic IVF index: (assignments, centroids). Centroids are a
    * local array (nlist × dim floats — broadcast-sized by construction). */
  def ivfAssign(spark: SparkSession, corpusRaw: DataFrame, nlist: Int,
                iterations: Int = 1): (DataFrame, Array[(Int, Array[Double])]) = {
    import spark.implicits._
    // The index build scans the corpus iterations+2 times (assign per
    // Lloyd round + final); cache it once. Small relative to executor
    // memory by construction (vectors, not documents).
    val corpus = corpusRaw.persist()
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    // Seeded init: evenly-spaced vec_ids (deterministic, no RNG at runtime)
    val ids = corpus.select(col("vec_id")).orderBy("vec_id").limit(nlist * 37)
      .as[Long].collect()
    require(ids.nonEmpty, "ivfAssign: empty corpus")
    val initIds = (0 until nlist).map(i => ids((i * 37) % ids.length)).distinct.toArray
    var centroids: Array[(Int, Array[Double])] = corpus
      .filter(col("vec_id").isin(initIds.toIndexedSeq: _*)).orderBy("vec_id")
      .select(col("embedding")).as[Array[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v.map(_.toDouble)) }
    def assignDf(): DataFrame = {
      val cdf = broadcast(centroids.toSeq.map { case (i, v) =>
        (i, v.map(_.toFloat))
      }.toDF("cluster", "centroid"))
      val scored = corpus.crossJoin(cdf)
        .select(col("vec_id"), col("cluster"), col("embedding"),
          cosineSim(col("embedding"), col("centroid")).as("sim"))
      // argmax cluster per vector: hash aggregate, no window sort
      scored.groupBy(col("vec_id"))
        .agg(max(struct(col("sim"), (-col("cluster")).as("neg_c"))).as("m"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), (-col("m.neg_c")).cast("int").as("cluster"), col("embedding"))
    }
    for (_ <- 0 until iterations) {
      val assigned = assignDf()
      val means = assigned
        .select(col("cluster"), col("embedding"))
        .groupBy("cluster")
        .agg(array((0 until dim).map(i =>
          avg(col("embedding").getItem(i))): _*).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      if (means.nonEmpty) centroids = means.sortBy(_._1)
    }
    val finalAssign = assignDf()
    // Lloyd iterations are done with the cache; release it so repeated
    // index builds in one session (Bench runs every query) do not pin
    // executor memory. The returned plan rescans the source once.
    corpus.unpersist()
    (finalAssign, centroids)
  }

  /** IVF-probed approximate top-k. Spec-tested for recall vs brute force. */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val (assigned, centroids) = ivfAssign(spark, corpus, nlist)
    val cdf = broadcast(centroids.toSeq.map { case (i, v) =>
      (i, v.map(_.toFloat))
    }.toDF("cluster", "centroid"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // each query picks its nprobe nearest clusters
    val probes = q.crossJoin(cdf)
      .select(col("query_id"), col("qe"), col("cluster"),
        cosineSim(col("qe"), col("centroid")).as("csim"))
    val wp = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cluster"))
    val probed = probes.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe).select(col("query_id"), col("qe"), col("cluster"))
    // search only the probed clusters (join keyed on cluster id)
    val scored = probed.join(assigned.withColumnRenamed("vec_id", "nn_id"), Seq("cluster"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        round(cosineSim(col("qe"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), col("cos_sim"))
  }
}
