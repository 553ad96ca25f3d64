package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-4 widening, batch 12: TPC-H Q7/Q14/Q16/Q22 shapes adapted to
  * the testdata columns, an exact bitmap distinct count, Markov
  * transition probabilities, RFM segmentation over de-skewed global
  * ranks, cumulative distinct users, per-doc TF-rarity top terms, and
  * a join-key skew profile.
  *
  * Determinism: every money value is integer cents, every share is
  * integer basis points (`div`/`//` — truncating on both engines);
  * the one emitted double (q202 score) is a single int64→double
  * division, which IEEE-754 rounds identically everywhere.
  */
object Extras15 {

  /** Exact per-item revenue in integer cents:
    * cents(extendedprice) × (10000 − bp(discount)) div 10000.
    * floor() of the double products is engine-portable because the
    * products themselves are (IEEE-754 correctly-rounded ops).
    */
  private val REV_C =
    "CAST(floor(l_extendedprice * 100.0) AS BIGINT)" +
      " * (10000 - CAST(floor(l_discount * 10000.0) AS BIGINT))"
  private val revC = expr(s"$REV_C div 10000")
  private val REV_C_SQL = s"$REV_C // 10000"

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q7 (volume shipping) adapted: revenue between two named
    // nations in both directions, by ship year. Shape: the fact table
    // shuffles once on orderkey; nation is broadcast twice under two
    // aliases (supplier side / customer side); supplier is broadcast.
    // The nation-pair predicate prunes AFTER the nation joins resolve
    // names — at 100 TB the broadcast hash joins make that a map-side
    // filter, no extra shuffle.
    QueryDef("q194_tpch_q7",
      (s, d) => {
        val n1 = broadcast(table(s, d, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        val n2 = broadcast(table(s, d, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
        val supp = broadcast(table(s, d, "supplier").select("s_suppkey", "s_nationkey"))
        table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"), revC.as("rev_c"))
          .join(table(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(n1, col("s_nationkey") === col("s_nk"))
          .join(n2, col("c_nationkey") === col("c_nk"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
            || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(sum("rev_c").as("revenue_c"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""WITH li AS (
                SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                  year(l_shipdate) AS l_year, $REV_C_SQL AS rev_c
                FROM lineitem
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey  = c_custkey
                  JOIN supplier ON l_suppkey  = s_suppkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
                WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              SELECT supp_nation, cust_nation, l_year,
                CAST(SUM(rev_c) AS BIGINT) AS revenue_c
              FROM li GROUP BY supp_nation, cust_nation, l_year
              ORDER BY supp_nation, cust_nation, l_year""")),

    // TPC-H Q14 (promo revenue) adapted: monthly share of PROMO-type
    // part revenue, in integer basis points. One broadcast dim join,
    // one shuffle to 12 month groups with partial aggregation map-side.
    QueryDef("q195_promo_share",
      (s, d) => table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType)
          && col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .join(broadcast(table(s, d, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
          revC.as("rev_c"),
          when(col("p_type") === "PROMO", 1L).otherwise(0L).as("is_promo"))
        .groupBy("month")
        .agg(sum(when(col("is_promo") === 1L, col("rev_c")).otherwise(0L)).as("promo_c"),
          sum("rev_c").as("total_c"))
        .withColumn("share_bp", expr("promo_c * 10000 div total_c"))
        .orderBy("month"),
      Some(s"""WITH li AS (
                SELECT STRFTIME(l_shipdate, '%Y-%m') AS month,
                  $REV_C_SQL AS rev_c,
                  CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
              SELECT month,
                CAST(SUM(CASE WHEN is_promo = 1 THEN rev_c ELSE 0 END) AS BIGINT) AS promo_c,
                CAST(SUM(rev_c) AS BIGINT) AS total_c,
                CAST(SUM(CASE WHEN is_promo = 1 THEN rev_c ELSE 0 END) * 10000
                  // SUM(rev_c) AS BIGINT) AS share_bp
              FROM li GROUP BY month ORDER BY month""")),

    // TPC-H Q16 (parts/supplier relationship) adapted: how many
    // distinct suppliers ship each (brand, type, size) combination,
    // with a brand/type exclusion, top-50 by variety. lineitem stands
    // in for partsupp (no partsupp table in the testdata). The
    // count-distinct is Spark's two-phase distinct aggregate — the
    // shuffle carries (group, suppkey) pairs, never line items.
    QueryDef("q196_supplier_variety",
      (s, d) => table(s, d, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(table(s, d, "part")
          .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO")
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
        .limit(50),
      Some("""SELECT p_brand, p_type, p_size,
                CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
              GROUP BY p_brand, p_type, p_size
              ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
              LIMIT 50""")),

    // TPC-H Q22 (global sales opportunity) adapted: per market
    // segment, customers whose balance is above the segment average
    // and who placed no order since 2000. The above-average test is
    // exact integer cross-multiplication (bal_c × seg_n > seg_sum_c)
    // — no float average on the compared path. Segment stats are a
    // 5-row broadcast; the idle test is a shuffled left-anti join
    // against the date-pruned orders scan.
    QueryDef("q197_idle_rich",
      (s, d) => {
        // cheap scan-projection lineage: rescanning parquet twice is
        // cheaper at scale than checkpointing the projection
        val c = table(s, d, "customer").filter(col("c_acctbal") > 0.0)
          .select(col("c_custkey"), col("c_mktsegment"),
            expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        val seg = c.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("seg_n"), sum("bal_c").as("seg_sum_c"))
        val recent = table(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
          .select("o_custkey")
        c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(seg), "c_mktsegment")
          .filter(expr("bal_c * seg_n > seg_sum_c"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_custs"), sum("bal_c").as("sum_bal_c"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH c AS (
                SELECT c_custkey, c_mktsegment,
                  CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                FROM customer WHERE c_acctbal > 0.0),
              seg AS (
                SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS seg_n,
                  CAST(SUM(bal_c) AS BIGINT) AS seg_sum_c
                FROM c GROUP BY c_mktsegment),
              idle AS (
                SELECT c.* FROM c
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
              SELECT i.c_mktsegment,
                CAST(COUNT(*) AS BIGINT) AS n_custs,
                CAST(SUM(i.bal_c) AS BIGINT) AS sum_bal_c
              FROM idle i JOIN seg s ON i.c_mktsegment = s.c_mktsegment
              WHERE i.bal_c * s.seg_n > s.seg_sum_c
              GROUP BY i.c_mktsegment
              ORDER BY i.c_mktsegment""")),

    // Exact distinct count via bitmap words — the roaring-bitmap idea
    // in pure relational form: 63 ids per BIGINT word (bit 63 never
    // set: DuckDB faults on 1<<63), bit_or-merged per (group, word),
    // popcounts summed. The shuffle carries one long per live word —
    // for dense id spaces that is 63× smaller than the distinct-pairs
    // shuffle of COUNT(DISTINCT), and words merge associatively so
    // map-side partial aggregation applies. The exact_distinct column
    // is the independent COUNT(DISTINCT) cross-check, equal by
    // construction.
    QueryDef("q198_bitmap_distinct",
      (s, d) => {
        val e = table(s, d, "events").select("event_type", "user_id")
        val words = e
          .groupBy(col("event_type"), expr("user_id div 63").as("word"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))")
            .as("mask"))
        val bm = words.groupBy("event_type")
          .agg(count(lit(1)).as("n_words"),
            sum(expr("bit_count(mask)")).as("bitmap_distinct"))
        val ex = e.groupBy("event_type")
          .agg(countDistinct("user_id").as("exact_distinct"))
        bm.join(ex, "event_type").orderBy("event_type")
      },
      Some("""WITH words AS (
                SELECT event_type, user_id // 63 AS word,
                  bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS mask
                FROM events GROUP BY event_type, user_id // 63),
              bm AS (
                SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_words,
                  CAST(SUM(bit_count(mask)) AS BIGINT) AS bitmap_distinct
                FROM words GROUP BY event_type),
              ex AS (
                SELECT event_type,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
                FROM events GROUP BY event_type)
              SELECT bm.event_type, n_words, bitmap_distinct, exact_distinct
              FROM bm JOIN ex ON bm.event_type = ex.event_type
              ORDER BY bm.event_type""")),

    // First-order Markov transition matrix over event types: per-user
    // ordered pass pairs each event with its successor (lead), counts
    // per (from, to), probabilities in integer basis points. The only
    // data-sized window partitions by user_id (high cardinality —
    // scales with the cluster); the per-from normalizer runs on the
    // ≤ |types|² aggregated frame.
    QueryDef("q199_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
        val cnt = table(s, d, "events")
          .select(col("user_id"), col("event_type"),
            col("ts").cast(TimestampType).cast(LongType).as("sec"), col("event_id"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        cnt
          .withColumn("tot", sum("n").over(Window.partitionBy("from_type")))
          .withColumn("prob_bp", expr("n * 10000 div tot"))
          .drop("tot")
          .orderBy("from_type", "to_type")
      },
      Some("""WITH e AS (
                SELECT user_id, event_type,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
                  event_id
                FROM events),
              tr AS (
                SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                    AS to_type
                FROM e),
              cnt AS (
                SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
                FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
              SELECT from_type, to_type, n,
                n * 10000 // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
                  AS prob_bp
              FROM cnt ORDER BY from_type, to_type""")),

    // RFM segmentation: recency / frequency / monetary quartiles per
    // customer, rolled up to segment counts. Each quartile comes from
    // a de-skewed GLOBAL rank (Ranks.groupRanked with a constant
    // group: range-repartition keeps parallelism at the partition
    // count — no single-reducer ORDER BY window). Bucket formula
    // ((rn−1)·4) div n is written identically in the oracle — NOT
    // ntile(), whose uneven-bucket placement differs. custkey
    // tie-breaks make every rank, hence every bucket, deterministic.
    QueryDef("q200_rfm_segments",
      (s, d) => {
        val orders = table(s, d, "orders")
        // customer-grain frame: one aggregation pass, pinned for its
        // four consumers (three rank passes + final join)
        val base = orders.groupBy(col("o_custkey").as("custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last_d"),
            count(lit(1)).as("freq"),
            sum(expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)")).as("monetary_c"))
          .crossJoin(broadcast(orders.agg(max(to_date(col("o_orderdate"))).as("gmax"))))
          .withColumn("recency_d", datediff(col("gmax"), col("last_d")).cast(LongType))
          .drop("gmax", "last_d")
          .transform(graft.ops.Pinned.pin)
        // ONE de-skewed rank pass for all three metrics: each metric
        // is a GROUP of one union, so the rank machinery's fixed cost
        // (cache build, boundary sample, offset rollup, final pass)
        // is paid once instead of three times — per-group ranks and
        // group sizes are unchanged, so every bucket is identical
        val metrics = Seq("recency_d", "freq", "monetary_c")
        val keyed = metrics.map(m =>
            base.select(lit(m).as("g"), col("custkey"), col(m).as("key")))
          .reduce(_ unionByName _)
        val ranked = graft.ops.Ranks.groupRanked(keyed, "g", "key", Seq("custkey"))
          .withColumn("b", expr("((rn - 1) * 4) div n"))
        // pivot instead of three joins: one consumption of the ranked
        // frame, one row per customer with all three buckets
        val buckets = ranked.groupBy("custkey")
          .agg(max(when(col("g") === "recency_d", col("b"))).as("b_recency_d"),
            max(when(col("g") === "freq", col("b"))).as("b_freq"),
            max(when(col("g") === "monetary_c", col("b"))).as("b_monetary_c"))
        base
          .join(buckets, "custkey")
          .select(expr("(4 - b_recency_d) * 100 + (b_freq + 1) * 10 + (b_monetary_c + 1)")
            .cast(LongType).as("rfm"), col("monetary_c"))
          .groupBy("rfm")
          .agg(count(lit(1)).as("n_customers"), sum("monetary_c").as("sum_monetary_c"))
          .orderBy("rfm")
      },
      Some("""WITH base AS (
                SELECT o_custkey AS custkey,
                  date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                    (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS recency_d,
                  CAST(COUNT(*) AS BIGINT) AS freq,
                  CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                    AS monetary_c
                FROM orders GROUP BY o_custkey),
              r AS (SELECT custkey, ((row_number() OVER (ORDER BY recency_d, custkey) - 1) * 4)
                      // (SELECT COUNT(*) FROM base) AS b FROM base),
              f AS (SELECT custkey, ((row_number() OVER (ORDER BY freq, custkey) - 1) * 4)
                      // (SELECT COUNT(*) FROM base) AS b FROM base),
              m AS (SELECT custkey, ((row_number() OVER (ORDER BY monetary_c, custkey) - 1) * 4)
                      // (SELECT COUNT(*) FROM base) AS b FROM base)
              SELECT CAST((4 - r.b) * 100 + (f.b + 1) * 10 + (m.b + 1) AS BIGINT) AS rfm,
                CAST(COUNT(*) AS BIGINT) AS n_customers,
                CAST(SUM(base.monetary_c) AS BIGINT) AS sum_monetary_c
              FROM base JOIN r USING (custkey) JOIN f USING (custkey) JOIN m USING (custkey)
              GROUP BY rfm ORDER BY rfm""")),

    // Cumulative distinct users per day, exactly, without a running
    // COUNT(DISTINCT): distinct-ness collapses to each user's FIRST
    // date (one hash aggregation), then a prefix sum over the tiny
    // per-day frame. The unpartitioned window is post-aggregation —
    // its input is #days rows, never data-sized.
    QueryDef("q201_cum_distinct_users",
      (s, d) => table(s, d, "events")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("d"))
        .groupBy(date_format(col("d"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum("new_users").over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy("day"),
      Some("""WITH first_seen AS (
                SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id),
              daily AS (
                SELECT STRFTIME(d, '%Y-%m-%d') AS day,
                  CAST(COUNT(*) AS BIGINT) AS new_users
                FROM first_seen GROUP BY d)
              SELECT day, new_users,
                CAST(SUM(new_users) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum_users
              FROM daily ORDER BY day""")),

    // Per-doc top-3 rarity-weighted terms WITHOUT log-idf: score =
    // tf·N/df as ONE int64→double division (correctly rounded by
    // IEEE-754 in both engines — the portable alternative to libm
    // ln, which differs at 1 ulp). One tokenize pass: df derives from
    // the pinned tf frame (q63 lesson); the top-3 window partitions
    // by doc_id — high cardinality, scale-safe.
    QueryDef("q202_tf_rarity_terms",
      (s, d) => {
        val docs = table(s, d, "documents")
        val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
          .transform(graft.ops.Pinned.pin)
        val dfr = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val nd = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(dfr, "w").crossJoin(broadcast(nd))
          .withColumn("score", expr("CAST(tf * n_docs AS DOUBLE) / df"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("w"), col("tf"), col("df"), col("score"),
            col("rnk").cast(LongType).as("rnk"))
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH tf AS (
                SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
                GROUP BY doc_id, w),
              df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
              nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
              scored AS (
                SELECT tf.doc_id, tf.w, tf.tf, df.df,
                  CAST(tf.tf * nd.n_docs AS DOUBLE) / df.df AS score
                FROM tf JOIN df ON tf.w = df.w CROSS JOIN nd)
              SELECT doc_id, w, tf, df, score, CAST(rnk AS BIGINT) AS rnk
              FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, w) AS rnk FROM scored) x
              WHERE rnk <= 3 ORDER BY doc_id, rnk""")),

    // Join-key skew profile: the top-20 heaviest keys with share,
    // ratio-to-average (tenths), and cumulative share — the
    // diagnostic you run BEFORE a big join to decide salting. The
    // key-grain counts aggregate map-side; top-20 is
    // TakeOrderedAndProject over the aggregated frame (never a full
    // sort); ratio uses exact cross-multiplied integers. Pinned:
    // the counts frame feeds both the totals row and the top-k.
    QueryDef("q203_key_skew_profile",
      (s, d) => {
        val c = table(s, d, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
          .transform(graft.ops.Pinned.pin)
        val t = c.agg(sum("n_events").as("total"), count(lit(1)).as("n_users"))
        c.orderBy(col("n_events").desc, col("user_id")).limit(20)
          .crossJoin(broadcast(t))
          .withColumn("share_bp", expr("n_events * 10000 div total"))
          .withColumn("ratio_x10", expr("n_events * n_users * 10 div total"))
          .withColumn("cum_bp", expr(
            "sum(n_events) OVER (ORDER BY n_events DESC, user_id" +
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 div total"))
          .select("user_id", "n_events", "share_bp", "ratio_x10", "cum_bp")
          .orderBy(col("n_events").desc, col("user_id"))
      },
      Some("""WITH c AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
                FROM events GROUP BY user_id),
              t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total,
                      CAST(COUNT(*) AS BIGINT) AS n_users FROM c),
              top AS (SELECT user_id, n_events FROM c
                      ORDER BY n_events DESC, user_id LIMIT 20)
              SELECT user_id, n_events,
                n_events * 10000 // t.total AS share_bp,
                n_events * t.n_users * 10 // t.total AS ratio_x10,
                CAST(SUM(n_events) OVER (ORDER BY n_events DESC, user_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * 10000 // t.total AS BIGINT) AS cum_bp
              FROM top CROSS JOIN t
              ORDER BY n_events DESC, user_id"""))
  )
}
