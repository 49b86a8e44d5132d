package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial radius join — all (left, right) point pairs within a
  * great-circle distance — via grid-cell bucketing: the spatial analog
  * of the bin-accelerated range join (operators/Joins.rangeJoinBinned).
  *
  * Plan shape: a radius predicate is not an equi-join, but bucketing
  * the sphere into cells at least one search radius wide makes it one:
  * any qualifying pair lies in the same or an adjacent cell, so the
  * RIGHT side is expanded to its 3×3 cell neighborhood (constant ≤9×,
  * usually <9 after dedup) and equi-joined on the cell key, then the
  * exact haversine re-filter keeps true pairs. Each pair meets exactly
  * once (in the LEFT row's own cell), so no output dedup is needed.
  * This replaces the quadratic cross-join a theta predicate would plan
  * with one hash shuffle on cell keys — the only correct shape at
  * corpus scale, and skew-safe as long as cells are radius-sized
  * (dense areas split across many cells).
  *
  * Longitude cells are modular (`nLon` equal slices of the full
  * circle), so pairs straddling the ±180° antimeridian bucket
  * together — `array_distinct` on the neighbor keys keeps degenerate
  * slicings (nLon ≤ 2) duplicate-free. The cell width accounts for
  * longitude shrink at the data's maximum |latitude| (derived with one
  * tiny aggregate); |lat| is capped at 89.5° — a polar cap search is a
  * different algorithm and out of contract.
  *
  * Distances are exact haversine doubles (java.lang.Math on the Spark
  * side; any conforming libm agrees to well under a millimeter, which
  * the gate's meter-rounding absorbs).
  *
  * Reference scope: beyond-reference (SURVEY §2.10); the reference has
  * no spatial operators.
  */
object Geo {

  /** IUGG mean Earth radius, km. */
  val EarthRadiusKm = 6371.0088
  private val KmPerDegLat = EarthRadiusKm * math.Pi / 180.0

  /** Great-circle distance in km between two (degree) points. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** All pairs within `radiusKm`, as left columns + right columns +
    * `dist_km`. Column name sets must be disjoint. `latL`/`lonL` etc.
    * name the coordinate columns (degrees; lon in [-180, 180)).
    */
  def radiusJoin(left: DataFrame, latL: String, lonL: String,
                 right: DataFrame, latR: String, lonR: String,
                 radiusKm: Double): DataFrame = {
    require(radiusKm > 0, "radiusKm must be positive")
    // one scalar per side: the worst-case longitude shrink in the data
    val maxAbsLat = math.min(89.5,
      math.max(firstDouble(left, abs(col(latL))), firstDouble(right, abs(col(latR)))))
    val latCell = radiusKm / KmPerDegLat
    val lonCellMin = radiusKm / (KmPerDegLat * math.cos(math.toRadians(maxAbsLat)))
    val nLon = math.max(1, math.floor(360.0 / lonCellMin).toInt)
    val lonCell = 360.0 / nLon

    def latIdx(c: Column): Column = floor((c + lit(90.0)) / lit(latCell)).cast("long")
    def lonIdx(c: Column): Column =
      pmod(floor((c + lit(180.0)) / lit(lonCell)).cast("long"), lit(nLon.toLong))

    val l = left
      .withColumn("__cell", concat_ws(":", latIdx(col(latL)), lonIdx(col(lonL))))
    val offsets = for (a <- -1 to 1; o <- -1 to 1) yield (a, o)
    val cells = array_distinct(array(offsets.map { case (a, o) =>
      concat_ws(":", latIdx(col(latR)) + lit(a.toLong),
        pmod(lonIdx(col(lonR)) + lit(o.toLong), lit(nLon.toLong)))
    }: _*))
    val r = right.withColumn("__cell", explode(cells))

    l.join(r, "__cell")
      .withColumn("dist_km",
        haversineKm(col(latL), col(lonL), col(latR), col(lonR)))
      .filter(col("dist_km") <= lit(radiusKm))
      .drop("__cell")
  }

  private def firstDouble(df: DataFrame, c: Column): Double = {
    val r = df.agg(max(c).cast("double")).collect().head
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }
}
