package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private def bruteSkyline(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, m1, m2) =>
      !pts.exists { case (_, o1, o2) =>
        o1 >= m1 && o2 <= m2 && (o1 > m1 || o2 < m2)
      }
    }.map(_._1).toSet

  test("skyline matches the brute-force dominance filter") {
    val pts = (1L to 400L).map { i =>
      (i, ((i * 7919) % 97).toDouble, ((i * 104729) % 89).toDouble)
    }
    val got = Frontier.skyline(pts.toDF("id", "m1", "m2"), "m1", "m2")
      .select("id").as[Long].collect().toSet
    assert(got === bruteSkyline(pts))
  }

  test("duplicate points do not dominate each other — both survive") {
    val pts = Seq((1L, 10.0, 5.0), (2L, 10.0, 5.0), (3L, 9.0, 6.0), (4L, 11.0, 7.0))
    val got = Frontier.skyline(pts.toDF("id", "m1", "m2"), "m1", "m2")
      .select("id").as[Long].collect().toSet
    // 3 is dominated by 1/2 (less m1, more m2); 4 survives (max m1);
    // 1 and 2 are identical — neither strictly better, both kept
    assert(got === Set(1L, 2L, 4L))
  }

  test("a totally-ordered chain keeps only the single best point") {
    // m2 increases with m1: every point with larger m1 also has larger
    // m2, so the whole chain is non-dominated
    val chain = (1L to 50L).map(i => (i, i.toDouble, i.toDouble))
    val all = Frontier.skyline(chain.toDF("id", "m1", "m2"), "m1", "m2").count()
    assert(all === 50L)
    // m2 DEcreases as m1 increases: the max-m1 point dominates all
    val anti = (1L to 50L).map(i => (i, i.toDouble, -i.toDouble))
    val got = Frontier.skyline(anti.toDF("id", "m1", "m2"), "m1", "m2")
      .select("id").as[Long].collect().toSet
    assert(got === Set(50L))
  }
}
