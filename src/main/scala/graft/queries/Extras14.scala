package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-4 widening, batch 11: multi-touch attribution and a one-pass
  * data-quality expectations gate.
  *
  * Determinism: attribution splits credit in integer basis points
  * with the remainder pinned to the last touch (no float splits);
  * the DQ gate is pure violation counts unpivoted from one
  * aggregation row.
  */
object Extras14 {

  val all: Seq[QueryDef] = Seq(

    // U-shaped (position-based) multi-touch attribution: each user's
    // click path before every purchase splits that purchase's credit
    // 40/20/40 — first touch 4000 bp, last touch 4000 bp (plus the
    // integer remainder), middle touches share 2000 bp equally. With
    // one click the touch takes all 10000. Credit is INTEGER bp of
    // cent revenue, so books balance exactly: per purchase the bp sum
    // is 10000 by construction. One per-user ordered pass marks the
    // path; per-purchase credit math is fixed integer expressions.
    QueryDef("q192_attribution_ushape",
      (s, d) => {
        val e = table(s, d, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts").cast(TimestampType).cast(LongType).as("sec"),
            expr("CAST(floor(value * 100.0) AS BIGINT)").as("c"))
        val ord = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
        // running purchase counter: clicks between purchase k-1 and k
        // share the same segment id k
        val seg = e.withColumn("n_purch_before",
          count(when(col("event_type") === "purchase", 1))
            .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
        val clicks = seg.filter(col("event_type") === "click")
          .select(col("user_id"), col("n_purch_before").as("seg"),
            col("event_id").as("click_id"), col("sec"))
        val purchases = seg.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("n_purch_before").as("seg"),
            col("event_id").as("purchase_id"), col("c").as("rev_c"))
        val wSeg = Window.partitionBy("user_id", "seg")
        val marked = clicks
          .withColumn("pos", row_number().over(
            Window.partitionBy("user_id", "seg").orderBy(col("sec"), col("click_id"))))
          .withColumn("n_touch", count(lit(1)).over(wSeg))
        val credit = marked.join(purchases, Seq("user_id", "seg"))
          .withColumn("bp",
            when(col("n_touch") === 1, lit(10000L))
              .when(col("pos") === 1, lit(4000L))
              .when(col("pos") === col("n_touch"),
                // last touch absorbs the middle-split remainder so the
                // per-purchase bp sum is exactly 10000
                when(col("n_touch") === 2, lit(6000L))
                  .otherwise(lit(4000L) +
                    expr("2000 - (2000 div (n_touch - 2)) * (n_touch - 2)")))
              .otherwise(expr("2000 div (n_touch - 2)")))
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            col("pos"), col("n_touch").cast(LongType).as("n_touch"), col("bp"),
            expr("rev_c * bp div 10000").as("credit_c"))
        credit.orderBy("user_id", "purchase_id", "pos")
      },
      Some("""WITH e AS (
                SELECT user_id, event_id, event_type,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
                  CAST(floor(value * 100.0) AS BIGINT) AS c
                FROM events WHERE event_type IN ('purchase', 'click')),
              seg AS (
                SELECT *,
                  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    OVER (PARTITION BY user_id ORDER BY sec, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS n_purch_before
                FROM e),
              clicks AS (
                SELECT user_id, n_purch_before AS seg, event_id AS click_id, sec
                FROM seg WHERE event_type = 'click'),
              purchases AS (
                SELECT user_id, n_purch_before AS seg, event_id AS purchase_id,
                  c AS rev_c
                FROM seg WHERE event_type = 'purchase'),
              marked AS (
                SELECT user_id, seg, click_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id, seg
                                     ORDER BY sec, click_id) AS pos,
                  COUNT(*) OVER (PARTITION BY user_id, seg) AS n_touch
                FROM clicks),
              credit AS (
                SELECT m.user_id, p.purchase_id, m.click_id, m.pos,
                  CAST(m.n_touch AS BIGINT) AS n_touch,
                  CASE WHEN m.n_touch = 1 THEN 10000
                       WHEN m.pos = 1 THEN 4000
                       WHEN m.pos = m.n_touch THEN
                         CASE WHEN m.n_touch = 2 THEN 6000
                              ELSE 4000 + 2000 - (2000 // (m.n_touch - 2)) * (m.n_touch - 2)
                         END
                       ELSE 2000 // (m.n_touch - 2) END AS bp,
                  p.rev_c
                FROM marked m JOIN purchases p
                  ON p.user_id = m.user_id AND p.seg = m.seg)
              SELECT user_id, purchase_id, click_id, pos, n_touch,
                CAST(bp AS BIGINT) AS bp,
                (rev_c * bp) // 10000 AS credit_c
              FROM credit ORDER BY user_id, purchase_id, pos""")),

    // one-pass data-quality expectations gate: every rule over
    // lineitem evaluated in a SINGLE aggregation (no per-rule scans),
    // unpivoted into the (rule, n_violations, pass) report a DQ
    // gatekeeper consumes. The Great-Expectations-style suite as one
    // Catalyst plan; adding a rule adds a column, not a pass.
    QueryDef("q193_dq_expectations",
      (s, d) => {
        val agg = table(s, d, "lineitem").agg(
          count(lit(1)).as("n_rows"),
          count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
            .as("quantity_range"),
          count(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1))
            .as("discount_range"),
          count(when(col("l_extendedprice") <= 0.0, 1)).as("price_positive"),
          count(when(col("l_shipdate").isNull, 1)).as("shipdate_null"),
          count(when(!col("l_returnflag").isin("A", "N", "R"), 1))
            .as("returnflag_enum"))
        agg.select(col("n_rows"), expr(
            """stack(5,
                 'quantity_in_1_50', quantity_range,
                 'discount_in_0_1', discount_range,
                 'price_positive', price_positive,
                 'shipdate_not_null', shipdate_null,
                 'returnflag_enum', returnflag_enum) AS (rule, n_violations)"""))
          .select(col("rule"), col("n_rows"), col("n_violations"),
            when(col("n_violations") === 0, lit(1L)).otherwise(lit(0L)).as("pass"))
          .orderBy("rule")
      },
      Some("""WITH agg AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
                    AS BIGINT) AS quantity_range,
                  CAST(COUNT(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 END)
                    AS BIGINT) AS discount_range,
                  CAST(COUNT(CASE WHEN l_extendedprice <= 0.0 THEN 1 END)
                    AS BIGINT) AS price_positive,
                  CAST(COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END)
                    AS BIGINT) AS shipdate_null,
                  CAST(COUNT(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END)
                    AS BIGINT) AS returnflag_enum
                FROM lineitem),
              rules AS (
                SELECT 'quantity_in_1_50' AS rule, n_rows, quantity_range AS n_violations FROM agg
                UNION ALL SELECT 'discount_in_0_1', n_rows, discount_range FROM agg
                UNION ALL SELECT 'price_positive', n_rows, price_positive FROM agg
                UNION ALL SELECT 'shipdate_not_null', n_rows, shipdate_null FROM agg
                UNION ALL SELECT 'returnflag_enum', n_rows, returnflag_enum FROM agg)
              SELECT rule, n_rows, n_violations,
                CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass
              FROM rules ORDER BY rule""")))
}
