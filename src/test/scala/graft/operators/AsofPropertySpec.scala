package graft.operators

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property armor for the merge_asof family: 120 randomized cases per
  * direction (clustered keys, colliding timestamps, random tolerance)
  * checked against a brute-force in-memory reference. Deterministic
  * seed — failures reproduce.
  */
class AsofPropertySpec extends SparkSpec {

  private case class L(id: Long, k: Long, t: Long)
  private case class R(k: Long, t: Long, rid: Long)

  private def refMatch(left: L, rights: Seq[R], direction: String,
                       tol: Option[Long]): Option[Long] = {
    val cand = direction match {
      case "backward" => rights.filter(r => r.k == left.k && r.t <= left.t)
      case "forward"  => rights.filter(r => r.k == left.k && r.t >= left.t)
    }
    val within = tol match {
      case Some(b) => cand.filter(r => math.abs(left.t - r.t) <= b)
      case None => cand
    }
    if (within.isEmpty) None
    else direction match {
      // nearest time wins; among time ties the LARGEST rid (asc
      // tie-break order, last() picks the final row in frame)
      case "backward" => Some(within.maxBy(r => (r.t, r.rid)).rid)
      case "forward"  => Some(within.minBy(r => (r.t, -r.rid)).rid)
    }
  }

  test("backward/forward with random tolerance match brute force over 120 random cases") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    for (case_ <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(4)
      val lefts = (1 to 40).map(i =>
        L(i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
      val rights = (1 to 30).map(i =>
        R(rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong, 100L + i))
      val lDf = lefts.map(l => (l.id, l.k, l.t)).toDF("id", "k", "t")
      val rDf = rights.map(r => (r.k, r.t, r.rid)).toDF("k", "t", "rid")
      for (dir <- Seq("backward", "forward");
           tol <- Seq(None, Some(rnd.nextInt(12).toLong + 1L))) {
        val got = Joins.asofJoin(lDf, rDf, "k", "t", rightPrefix = "r_",
            tieBreak = Some("rid"), direction = dir,
            tolerance = tol.map(lit(_)))
          .select("id", "r_rid").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
        lefts.foreach { l =>
          val want = refMatch(l, rights, dir, tol)
          assert(got(l.id) == want,
            s"case $case_ dir=$dir tol=$tol left=$l: got ${got(l.id)}, want $want " +
              s"(rights for key: ${rights.filter(_.k == l.k).sortBy(_.t)})")
        }
      }
    }
  }

  test("nearest picks the closer side with backward tie preference over random cases") {
    import spark.implicits._
    val rnd = new Random(99173L)
    for (_ <- 1 to 4) {
      val lefts = (1 to 30).map(i => L(i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(40).toLong))
      val rights = (1 to 20).map(i => R(rnd.nextInt(3).toLong, rnd.nextInt(40).toLong, 100L + i))
      val got = Joins.asofJoinNearest(
          lefts.map(l => (l.id, l.k, l.t)).toDF("id", "k", "t"),
          rights.map(r => (r.k, r.t, r.rid)).toDF("k", "t", "rid"),
          "k", "t", leftId = "id", rightPrefix = "r_", tieBreak = Some("rid"))
        .select("id", "r_rid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      lefts.foreach { l =>
        val b = refMatch(l, rights, "backward", None)
        val f = refMatch(l, rights, "forward", None)
        val bGap = b.map(rid => l.t - rights.find(_.rid == rid).get.t)
        val fGap = f.map(rid => rights.find(_.rid == rid).get.t - l.t)
        val want = (b, f) match {
          case (Some(_), None) => b
          case (None, _) => f
          case (Some(_), Some(_)) => if (bGap.get <= fGap.get) b else f
        }
        assert(got(l.id) == want, s"left=$l got=${got(l.id)} want=$want (b=$b/$bGap f=$f/$fGap)")
      }
    }
  }
}
