package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** The U-shaped attribution invariant the oracle verifies only
  * implicitly: every purchase's credit must split to EXACTLY 10000
  * basis points across its touches — integer remainder handling means
  * the books balance to the cent, never to "approximately 100%".
  */
class AttributionSpec extends SparkSpec {

  test("per-purchase bp sums are exactly 10000; credit never exceeds revenue") {
    val df = SparkEntry.queries("q192_attribution_ushape")(
      spark, "/root/testdata/sf0.001")
    val books = df.groupBy("purchase_id")
      .agg(sum("bp").as("bp_sum"), count(lit(1)).as("n_touches"))
    val bad = books.filter(col("bp_sum") =!= 10000L).count()
    assert(bad === 0L, s"$bad purchases with unbalanced bp books")
    // positions are a contiguous 1..n_touch run per purchase
    val posCheck = df.groupBy("purchase_id")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
      .count()
    assert(posCheck === 0L, "touch positions must be contiguous from 1")
  }
}
