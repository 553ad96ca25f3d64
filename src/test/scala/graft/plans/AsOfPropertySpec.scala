package graft.plans

import graft.SparkSpec
import graft.ops.AsOf

/** Randomized property check for the hand-written AsOfJoinExec merge:
  * over many random key/time tables (hot keys, duplicate left times,
  * keys existing on only one side, partition boundaries forced by a
  * tiny shuffle count), the operator must equal the brute-force
  * definition — for every left row, the right row with equal key and
  * the greatest time <= left time (within tolerance when set).
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def brute(
      left: Seq[(Long, Long, Long)],   // (k, t, id)
      right: Seq[(Long, Long, Long)],  // (k, t, payload)
      tol: Option[Long]): Set[(Long, Long)] =
    left.map { case (k, t, id) =>
      val cand = right.filter(r => r._1 == k && r._2 <= t &&
        tol.forall(x => t - r._2 <= x))
      id -> (if (cand.isEmpty) -1L else cand.maxBy(_._2)._3)
    }.toSet

  test("random tables: native merge == brute force (with and without tolerance)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 8) {
      val nl = 40 + rnd.nextInt(160)
      val nr0 = rnd.nextInt(120) // can be tiny or empty-ish
      val left = Seq.fill(nl)((rnd.nextInt(6).toLong,
        rnd.nextInt(40).toLong, rnd.nextLong().abs))
      // distinct (k, t) on the right so the matched payload is unique
      val right = Seq.fill(nr0)((rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
        .distinct.map { case (k, t) => (k, t, k * 1000L + t) }
      val tol = if (trial % 2 == 0) Some(rnd.nextInt(10).toLong) else None

      val l = left.toDF("k", "t", "id")
      val r = right.toDF("rk", "rt", "payload")
      val out = AsOf.joinAsOf(l, r, Seq("k"), Seq("rk"), "t", "rt", tol)
        .select("id", "payload")
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) -1L else row.getLong(1))).toSet
      val expect = brute(left, right, tol)
      assert(out === expect,
        s"trial $trial (tol=$tol, nl=$nl, nr=${right.size}) diverged: " +
          s"missing=${expect -- out} extra=${out -- expect}")
    }
  }
}
