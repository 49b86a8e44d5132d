package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ZOrder._

class LayoutSpec extends SparkSpec {

  test("InterleaveBits matches a bit-by-bit Scala reference, nulls propagate") {
    import spark.implicits._
    def ref(xs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- xs.indices; j <- 0 until bits)
        z |= ((xs(i) >>> j) & 1L) << (j * xs.size + i)
      z
    }
    val cases = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
    val got = cases.toDF("x", "y")
      .select(zkey(16, col("x"), col("y"))).as[Long].collect().toSeq
    assert(got == cases.map(c => ref(Seq(c._1, c._2), 16)), s"mismatch: $got")
    // 3-way interleave too
    val g3 = Seq((1L, 2L, 4L)).toDF("a", "b", "c")
      .select(zkey(8, col("a"), col("b"), col("c"))).as[Long].head()
    assert(g3 == ref(Seq(1L, 2L, 4L), 8))
    val withNull = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(zkey(16, col("x"), col("y"))).collect()
    assert(withNull.head.isNullAt(0), "null input must yield null key")
  }

  test("zkey stays inside whole-stage codegen") {
    import spark.implicits._
    // non-foldable source (range), so the expression must run in codegen
    val df = spark.range(5, 6)
      .select(zkey(16, col("id"), (col("id") - 2).as("y")).as("z"))
    // the Project carrying interleave_bits must be starred (inside a
    // WholeStageCodegen stage), not fallen back to interpreted eval
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.filter(_.contains("interleave_bits")).forall(_.contains("*")),
      s"interleave_bits not codegen'd:\n$plan")
    assert(df.as[Long].head() == 27L) // x=101 even bits, y=011 odd bits -> 011011
  }

  test("scaleToBits is an exact integer mapping with clamping at the edges") {
    import spark.implicits._
    val df = Seq(-5L, 0L, 500L, 1000L, 2000L).toDF("v")
      .select(scaleToBits(col("v"), 0L, 1000L, 16).as("s"))
    val got = df.as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 500L * 65535L / 1000L, 65535L, 65535L), s"got $got")
  }

  test("z-order layout clusters BOTH dimensions' file stats; linear sort only one") {
    import spark.implicits._
    // two independent uniform dims — the shape where one-column sort helps
    // one predicate and abandons the other
    val n = 4096
    val rows = (0 until n).map { i =>
      (((i * 2654435761L) >>> 7) & 1023L, ((i * 40503L + 17) >>> 3) & 1023L)
    }
    val df = rows.toDF("x", "y")
    val files = 16
    // per-"file" = per-partition after the layout; spread = avg (max-min)/range
    def spread(laid: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val stats = laid
        .select(spark_partition_id().as("p"), col(dim))
        .groupBy("p").agg((max(dim) - min(dim)).as("w"))
        .agg(avg("w")).head().getDouble(0)
      stats / 1023.0
    }
    val zx = scaleToBits(col("x"), 0L, 1023L, 10)
    val zy = scaleToBits(col("y"), 0L, 1023L, 10)
    val zLaid = Layout.clusterByZOrder(df, zkey(10, zx, zy), files).cache()
    val linear = df.repartitionByRange(files, col("x")).sortWithinPartitions(col("x")).cache()
    val (zxS, zyS) = (spread(zLaid, "x"), spread(zLaid, "y"))
    val (lxS, lyS) = (spread(linear, "x"), spread(linear, "y"))
    // linear: x tightly clustered, y spans ~full range per file
    assert(lxS < 0.2 && lyS > 0.8, s"linear baseline unexpected: x=$lxS y=$lyS")
    // z-order: BOTH dims well under the linear layout's abandoned dim;
    // 16 files on a 2-D curve -> each covers ~1/4 of each axis
    assert(zxS < 0.5 && zyS < 0.5, s"z-order must cluster both dims: x=$zxS y=$zyS")
    zLaid.unpersist(); linear.unpersist()
  }
}
