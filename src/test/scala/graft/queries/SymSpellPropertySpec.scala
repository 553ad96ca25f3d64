package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Property check for the q161 candidate generator: over random short
  * strings, the deletion-neighborhood equi-join + residual levenshtein
  * finds EXACTLY the brute-force edit-distance-<=1 pairs — the
  * completeness claim ("two names within one edit share a variant")
  * and the soundness of the residual filter, on data with far nastier
  * collisions than the p_name fixture (tiny alphabet forces shared
  * variants between distance-2 strings).
  */
class SymSpellPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion-neighborhood join == brute-force lev<=1 pairs (random, 2-letter alphabet)") {
    val rnd = new scala.util.Random(7)
    val names = Seq.fill(300)(
      (1 to rnd.between(1, 6)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
      .distinct
    val expected = (for {
      x <- names; y <- names if x < y && lev(x, y) <= 1
    } yield (x, y)).toSet

    val df = names.toDF("p_name")
    val vars = df.select(col("p_name"), explode(expr(
      """array_append(
           transform(sequence(1, length(p_name)),
             i -> concat(substr(p_name, 1, i - 1), substr(p_name, i + 1))),
           p_name)""")).as("v"))
    val got = vars.select(col("p_name").as("name_a"), col("v"))
      .join(vars.select(col("p_name").as("name_b"), col("v")), Seq("v"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct()
      .filter(expr("levenshtein(name_a, name_b) <= 1"))
      .as[(String, String)].collect().toSet

    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // and the residual filter is LOAD-BEARING on this alphabet:
    // shared variants alone over-generate (distance-2 pairs collide)
    val unfiltered = vars.select(col("p_name").as("name_a"), col("v"))
      .join(vars.select(col("p_name").as("name_b"), col("v")), Seq("v"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct().count()
    assert(unfiltered > expected.size,
      "expected shared-variant candidates to exceed true lev<=1 pairs")
  }
}
