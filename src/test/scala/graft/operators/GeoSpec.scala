package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def brute(left: Seq[(Int, Double, Double)],
                    right: Seq[(Int, Double, Double)],
                    radiusKm: Double): Set[(Int, Int)] = {
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val dLat = math.toRadians(lat2 - lat1) / 2
      val dLon = math.toRadians(lon2 - lon1) / 2
      val a = math.pow(math.sin(dLat), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(dLon), 2)
      2 * Geo.EarthRadiusKm * math.asin(math.sqrt(a))
    }
    (for {
      (i, la, lo) <- left
      (j, ra, ro) <- right
      if hav(la, lo, ra, ro) <= radiusKm
    } yield (i, j)).toSet
  }

  private def run(left: Seq[(Int, Double, Double)],
                  right: Seq[(Int, Double, Double)],
                  radiusKm: Double): Set[(Int, Int)] = {
    val l = left.toDF("lid", "llat", "llon")
    val r = right.toDF("rid", "rlat", "rlon")
    Geo.radiusJoin(l, "llat", "llon", r, "rlat", "rlon", radiusKm)
      .select("lid", "rid").as[(Int, Int)].collect().toSet
  }

  test("grid join == brute force on a deterministic scatter") {
    // LCG scatter over lat [-60, 60), lon [-180, 180)
    def pts(seed: Long, n: Int): Seq[(Int, Double, Double)] = {
      var x = seed
      def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
      (0 until n).map { i =>
        val la = ((next() >>> 11) % 120000) / 1000.0 - 60.0
        val lo = ((next() >>> 11) % 360000) / 1000.0 - 180.0
        (i, la, lo)
      }
    }
    val left = pts(42L, 150)
    val right = pts(7L, 150)
    Seq(50.0, 300.0, 2000.0).foreach { r =>
      assert(run(left, right, r) === brute(left, right, r), s"radius $r")
    }
  }

  test("antimeridian pairs bucket together") {
    val left = Seq((1, 10.0, 179.95), (2, 10.0, 0.0))
    val right = Seq((10, 10.0, -179.95), (11, 10.0, 179.5))
    // 0.1 deg lon at lat 10 ≈ 10.9 km; 0.45 deg ≈ 49 km
    val got = run(left, right, 60.0)
    assert(got === Set((1, 10), (1, 11)))
    assert(run(left, right, 5.0) === Set.empty)
  }

  test("adjacent-cell pairs are found (cell-boundary straddle)") {
    // radius 100 km → lat cell ≈ 0.9 deg; points 0.05 deg apart straddling
    // a multiple-of-cell boundary must still pair
    val left = Seq((1, 44.975, 10.0))
    val right = Seq((2, 45.025, 10.0))
    assert(run(left, right, 100.0) === Set((1, 2)))
  }

  test("high-latitude lon shrink respected") {
    // at lat 85, 1 deg lon ≈ 9.7 km — a 3-deg lon gap is ~29 km, inside a
    // 50 km radius; a fixed equator-sized grid would still pair these, but
    // the shrink-aware cell width must too (and brute force agrees)
    val left = Seq((1, 85.0, 0.0))
    val right = Seq((2, 85.0, 3.0), (3, 85.0, 40.0))
    val b = brute(left, right, 50.0)
    assert(b === Set((1, 2)))
    assert(run(left, right, 50.0) === b)
  }

  test("no duplicate pairs from degenerate lon slicing") {
    // huge radius → nLon collapses to 1-2 slices; array_distinct must keep
    // each (left,right) pair single
    val left = Seq((1, 0.0, 0.0))
    val right = Seq((2, 1.0, 1.0))
    val l = left.toDF("lid", "llat", "llon")
    val r = right.toDF("rid", "rlat", "rlon")
    val rows = Geo.radiusJoin(l, "llat", "llon", r, "rlat", "rlon", 15000.0)
      .select("lid", "rid").collect()
    assert(rows.length === 1)
  }
}
