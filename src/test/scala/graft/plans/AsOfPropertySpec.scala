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

  test("null keys and null times on either side: left-null rows emit null-padded, right-null rows never match") {
    // SQL equi-join semantics: NULL never equals NULL. A left row with
    // a null key or null as-of time keeps its left columns and gets a
    // null payload; a right row with a null key or null version time
    // is unusable as a match (and must not feed the tolerance check).
    val rnd = new scala.util.Random(29)
    def mk(n: Int, keyNullPct: Int, timeNullPct: Int): Seq[(Option[Long], Option[Long], Long)] =
      Seq.tabulate(n) { i =>
        val k = if (rnd.nextInt(100) < keyNullPct) None else Some(rnd.nextInt(5).toLong)
        val t = if (rnd.nextInt(100) < timeNullPct) None else Some(rnd.nextInt(30).toLong)
        (k, t, i.toLong)
      }
    def bruteNull(
        left: Seq[(Option[Long], Option[Long], Long)],
        right: Seq[(Option[Long], Option[Long], Long)],
        tol: Option[Long]): Set[(Long, Long)] =
      left.map { case (k, t, id) =>
        val cand = (k, t) match {
          case (Some(kk), Some(tt)) =>
            right.filter {
              case (Some(rk), Some(rt), _) =>
                rk == kk && rt <= tt && tol.forall(x => tt - rt <= x)
              case _ => false
            }
          case _ => Nil
        }
        id -> (if (cand.isEmpty) -1L else cand.maxBy(_._2.get)._3)
      }.toSet

    for (trial <- 1 to 6) {
      val left = mk(60 + rnd.nextInt(80), 20, 20)
      // distinct (k, t) so a matched payload is unique; payload = row id
      val right = mk(rnd.nextInt(100), 25, 25)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val tol = if (trial % 2 == 0) Some(rnd.nextInt(8).toLong) else None

      val l = left.toDF("k", "t", "id")
      val r = right.toDF("rk", "rt", "payload")
      val out = AsOf.joinAsOf(l, r, Seq("k"), Seq("rk"), "t", "rt", tol)
        .select("id", "payload")
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) -1L else row.getLong(1))).toSet
      val expect = bruteNull(left, right, tol)
      assert(out === expect,
        s"null trial $trial (tol=$tol) diverged: " +
          s"missing=${expect -- out} extra=${out -- expect}")
    }
  }

  test("inner as-of equals the matched subset of the brute-force definition") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 6) {
      val left = Seq.fill(60 + rnd.nextInt(120))((rnd.nextInt(6).toLong,
        rnd.nextInt(40).toLong, rnd.nextLong().abs))
      val right = Seq.fill(rnd.nextInt(100))((rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
        .distinct.map { case (k, t) => (k, t, k * 1000L + t) }
      val tol = if (trial % 2 == 0) Some(rnd.nextInt(10).toLong) else None

      val l = left.toDF("k", "t", "id")
      val r = right.toDF("rk", "rt", "payload")
      val out = AsOf.joinAsOf(l, r, Seq("k"), Seq("rk"), "t", "rt", tol, "inner")
        .select("id", "payload").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      // inner = brute left-outer minus the unmatched (-1) rows; the
      // payload column must also be non-nullable in the inner schema
      val expect = brute(left, right, tol).filter(_._2 != -1L)
      assert(out === expect,
        s"inner trial $trial (tol=$tol) diverged: " +
          s"missing=${expect -- out} extra=${out -- expect}")
      val joinedSchema = AsOf.joinAsOf(l, r, Seq("k"), Seq("rk"), "t", "rt", tol, "inner").schema
      assert(!joinedSchema("payload").nullable)
    }
  }

  test("case-insensitive sessions reject sides sharing a name that differs only by case") {
    val l = Seq((1L, 1L, 1L)).toDF("Key", "t", "id")
    val r = Seq((1L, 1L, 1L)).toDF("key", "rt", "payload")
    val e = intercept[IllegalArgumentException](
      AsOf.joinAsOf(l, r, Seq("Key"), Seq("key"), "t", "rt", None))
    assert(e.getMessage.contains("disjoint"), e.getMessage)
  }
}
