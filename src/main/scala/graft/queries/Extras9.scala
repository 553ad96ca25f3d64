package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-4 widening, batch 6: per-key trend fitting, KMV/theta-style
  * sketch set operations, and a referential-integrity audit.
  *
  * Determinism: OLS co-moments accumulate as exact BIGINTs and the
  * slope/intercept are a fixed expression over identical doubles
  * (int64 -> double is correctly rounded in both engines, unlike wide
  * decimal -> double); KMV uses md5 hex ORDER (total, engine-
  * independent) and the estimate is one IEEE quotient of a 48-bit
  * integer — parsed from hex with the instr-nibble trick — over a
  * power-of-two literal; the FK audit is pure counts.
  */
object Extras9 {

  /** 48-bit integer from the first 12 hex chars of column `hx` —
    * portable hex parse (DuckDB has no conv()): nibble value via
    * instr into the hex alphabet, positional powers as literals.
    */
  private val HEX12: String =
    (0 until 12).map { i =>
      // positional power CAST AS BIGINT: a bare sub-2^31 literal is an
      // INT in Spark and nibble * INT overflows under ANSI
      s"(instr('0123456789abcdef', substring(hx, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (11 - i))} AS BIGINT)"
    }.mkString(" + ")

  /** KMV k: estimates use the k-th minimum hash; (k-1)/u_k. */
  private val KMV_K = 64

  val all: Seq[QueryDef] = Seq(

    // per-user value trend: exact-decimal OLS co-moments (one pass,
    // one shuffle on user_id), slope/intercept as a fixed double
    // expression over the exact sums. The metric-drift regression a
    // pipeline fits per entity; x is epoch seconds, y the event value.
    // Co-moments accumulate as exact BIGINTs (x = seconds past a fixed
    // 2024-01-01 anchor, y = floor(value * 1e4)); int64 -> double is
    // correctly rounded in BOTH engines, whereas a wide DECIMAL(38,4)
    // -> double cast is implementation-defined at the 1-ulp level (it
    // diverged on 8/150 rows when tried). floor() not CAST for y: ANSI
    // Spark truncates double->long, DuckDB rounds.
    QueryDef("q165_trend_slope",
      (s, d) => {
        val e = table(s, d, "events")
          .filter(col("user_id") <= 200)
          .select(col("user_id"),
            (col("ts").cast(TimestampType).cast(LongType) - 1704067200L).as("x"),
            expr("CAST(floor(value * 10000.0) AS BIGINT)").as("y4"))
        val a = e.groupBy("user_id").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"),
          sum("y4").as("sy"),
          sum(col("x") * col("y4")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        a.withColumn("den",
            col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
              col("sx").cast(DoubleType) * col("sx").cast(DoubleType))
          .filter(col("den") =!= 0.0)
          .withColumn("slope4",
            (col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
              col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) / col("den"))
          .withColumn("slope", col("slope4") / lit(10000.0))
          .withColumn("intercept",
            (col("sy").cast(DoubleType) - col("slope4") * col("sx").cast(DoubleType)) /
              col("n").cast(DoubleType) / lit(10000.0))
          .select("user_id", "n", "slope", "intercept")
          .orderBy("user_id")
      },
      Some("""WITH e AS (
                SELECT user_id,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) - 1704067200 AS x,
                  CAST(floor(value * 10000.0) AS BIGINT) AS y4
                FROM events WHERE user_id <= 200),
              a AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx,
                  CAST(SUM(y4) AS BIGINT) AS sy,
                  CAST(SUM(x * y4) AS BIGINT) AS sxy,
                  CAST(SUM(x * x) AS BIGINT) AS sxx
                FROM e GROUP BY user_id),
              b AS (
                SELECT *,
                  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den
                FROM a),
              c AS (
                SELECT *,
                  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / den AS slope4
                FROM b WHERE den <> 0.0)
              SELECT user_id, n, slope4 / 10000.0 AS slope,
                (CAST(sy AS DOUBLE) - slope4 * CAST(sx AS DOUBLE)) /
                  CAST(n AS DOUBLE) / 10000.0 AS intercept
              FROM c ORDER BY user_id""")),

    // KMV (k-minimum-values / theta-sketch) set operations: per
    // returnflag, the 64 smallest md5 values of the distinct order
    // keys form the sketch; the k-th minimum yields a distinct-count
    // estimate, the merged k-set of a flag PAIR yields union and
    // Jaccard estimates — emitted NEXT TO the exact values, so the
    // error is visible. This is how engines intersect audiences at
    // 100 TB: k hashes per set cross the network, never the sets.
    // The per-flag top-k is a two-stage rank (local per-split minima,
    // then a global pass over <= 64 x P survivors — bounded state at
    // any data size); the pair stage touches <= 2k rows per pair.
    QueryDef("q166_kmv_set_ops",
      (s, d) => {
        // ONE data-sized shuffle for the whole query: group the fact
        // by key with a map-side-combined collect_set of flags. The
        // round-13 form paid three: a (flag, key) distinct AND a
        // self-join of that distinct on key for the exact
        // intersection (two more shuffles of the deduped set). From
        // the key-grouped frame, the distinct (flag, key) pairs are
        // an explode, the exact per-flag counts an explode+count,
        // and the exact PAIR intersection a per-key flag-pair
        // expansion (baskets are <= nflags wide, so the expansion is
        // bounded by nflags²/2 per key — never a join).
        val byKey = table(s, d, "lineitem")
          .select(col("l_returnflag").as("flag"), col("l_orderkey").as("key"))
          .groupBy("key")
          .agg(sort_array(collect_set(col("flag"))).as("fs"))
          .transform(graft.ops.Pinned.pin)
        val ded = byKey.select(explode(col("fs")).as("flag"), col("key"))
        val hashed = ded.withColumn("hx", md5(col("key").cast(StringType)))
        // classic two-stage top-k: per-(flag, input-partition) local
        // top-64 first — the global k minima are necessarily among the
        // local minima of every split, so the global rank then runs
        // over <= 64 x P survivor rows instead of the full key set
        // (and is partitioning-invariant: any superset of the true
        // top-64 yields the same final 64)
        val local = hashed
          .withColumn("pid", spark_partition_id())
          .withColumn("lrn", row_number().over(
            Window.partitionBy("flag", "pid").orderBy("hx")))
          .filter(col("lrn") <= KMV_K)
        // the sketch frame is <= 64 x nflags rows but its lineage is
        // the two-stage rank over the whole key set — pin it: five
        // consumers below (flag list, per-flag estimate, pair merge)
        // otherwise re-run that rank each
        val ks = local
          .withColumn("rn", row_number().over(
            Window.partitionBy("flag").orderBy("hx")))
          .filter(col("rn") <= KMV_K).select("flag", "hx", "rn")
          .transform(graft.ops.Pinned.pin)

        // (k-1)/u_k over the row's hx column; 281474976710656 = 2^48
        val kmvEst = lit((KMV_K - 1).toDouble) /
          (expr(HEX12).cast(DoubleType) / lit(281474976710656.0))

        val flagEst = ks.filter(col("rn") === KMV_K)
          .select(col("flag"), kmvEst.as("est"))

        val flags = ks.select("flag").distinct()
        val pairs = flags.select(col("flag").as("fa"))
          .crossJoin(flags.select(col("flag").as("fb")))
          .filter(col("fa") < col("fb"))

        val cand = pairs
          .join(ks.select(col("flag").as("mflag"), col("hx")),
            col("mflag") === col("fa") || col("mflag") === col("fb"))
          .groupBy("fa", "fb", "hx")
          .agg(max(when(col("mflag") === col("fa"), 1).otherwise(0)).as("in_a"),
            max(when(col("mflag") === col("fb"), 1).otherwise(0)).as("in_b"))
        val wm = Window.partitionBy("fa", "fb").orderBy("hx")
        val merged = cand.withColumn("mrn", row_number().over(wm))
          .filter(col("mrn") <= KMV_K)
        val unionEst = merged.filter(col("mrn") === KMV_K)
          .select(col("fa"), col("fb"), kmvEst.as("est_union"))
        val interEst = merged.groupBy("fa", "fb")
          .agg((sum(col("in_a") * col("in_b")).cast(DoubleType) /
            lit(KMV_K.toDouble)).as("jaccard_est"))

        val exactN = ded.groupBy("flag").agg(count(lit(1)).as("n"))
        // exact pair intersection WITHOUT a self-join: fs is sorted,
        // so the in-basket pair expansion emits fa < fb directly
        // (the lshCandidatePairs slice pattern)
        val interTrue = byKey.filter(size(col("fs")) >= 2)
          .select(posexplode(col("fs")).as(Seq("__i", "fa")), col("fs"))
          .select(col("fa"),
            explode(slice(col("fs"), col("__i") + 2, size(col("fs")))).as("fb"))
          .groupBy("fa", "fb").agg(count(lit(1)).as("n_inter_true"))

        pairs
          .join(exactN.select(col("flag").as("fa"), col("n").as("n_a")), Seq("fa"))
          .join(exactN.select(col("flag").as("fb"), col("n").as("n_b")), Seq("fb"))
          .join(interTrue, Seq("fa", "fb"))
          .join(flagEst.select(col("flag").as("fa"), col("est").as("est_a")), Seq("fa"))
          .join(flagEst.select(col("flag").as("fb"), col("est").as("est_b")), Seq("fb"))
          .join(unionEst, Seq("fa", "fb"))
          .join(interEst, Seq("fa", "fb"))
          .withColumn("jaccard_true",
            col("n_inter_true").cast(DoubleType) /
              (col("n_a") + col("n_b") - col("n_inter_true")).cast(DoubleType))
          .select("fa", "fb", "n_a", "n_b", "n_inter_true",
            "est_a", "est_b", "est_union", "jaccard_est", "jaccard_true")
          .orderBy("fa", "fb")
      },
      Some(s"""WITH ded AS (
                SELECT DISTINCT l_returnflag AS flag, l_orderkey AS key FROM lineitem),
              hashed AS (
                SELECT flag, md5(CAST(key AS VARCHAR)) AS hx FROM ded),
              ks AS (
                SELECT flag, hx,
                  ROW_NUMBER() OVER (PARTITION BY flag ORDER BY hx) AS rn
                FROM hashed QUALIFY rn <= $KMV_K),
              flag_est AS (
                SELECT flag,
                  CAST(${KMV_K - 1}.0 AS DOUBLE) /
                    (CAST($HEX12 AS DOUBLE) / CAST(281474976710656.0 AS DOUBLE)) AS est
                FROM ks WHERE rn = $KMV_K),
              flags AS (SELECT DISTINCT flag FROM ks),
              pairs AS (
                SELECT a.flag AS fa, b.flag AS fb
                FROM flags a, flags b WHERE a.flag < b.flag),
              cand AS (
                SELECT p.fa, p.fb, k.hx,
                  MAX(CASE WHEN k.flag = p.fa THEN 1 ELSE 0 END) AS in_a,
                  MAX(CASE WHEN k.flag = p.fb THEN 1 ELSE 0 END) AS in_b
                FROM pairs p JOIN ks k ON k.flag = p.fa OR k.flag = p.fb
                GROUP BY p.fa, p.fb, k.hx),
              merged AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY fa, fb ORDER BY hx) AS mrn
                FROM cand QUALIFY mrn <= $KMV_K),
              union_est AS (
                SELECT fa, fb,
                  CAST(${KMV_K - 1}.0 AS DOUBLE) /
                    (CAST($HEX12 AS DOUBLE) / CAST(281474976710656.0 AS DOUBLE)) AS est_union
                FROM merged WHERE mrn = $KMV_K),
              inter_est AS (
                SELECT fa, fb,
                  CAST(SUM(in_a * in_b) AS DOUBLE) / CAST($KMV_K.0 AS DOUBLE) AS jaccard_est
                FROM merged GROUP BY fa, fb),
              exact_n AS (SELECT flag, COUNT(*) AS n FROM ded GROUP BY flag),
              inter_true AS (
                SELECT a.flag AS fa, b.flag AS fb, COUNT(*) AS n_inter_true
                FROM ded a JOIN ded b ON a.key = b.key AND a.flag < b.flag
                GROUP BY a.flag, b.flag)
              SELECT p.fa, p.fb,
                CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
                CAST(it.n_inter_true AS BIGINT) AS n_inter_true,
                ea.est AS est_a, eb.est AS est_b, ue.est_union,
                ie.jaccard_est,
                CAST(it.n_inter_true AS DOUBLE) /
                  CAST(na.n + nb.n - it.n_inter_true AS DOUBLE) AS jaccard_true
              FROM pairs p
              JOIN exact_n na ON na.flag = p.fa
              JOIN exact_n nb ON nb.flag = p.fb
              JOIN inter_true it ON it.fa = p.fa AND it.fb = p.fb
              JOIN flag_est ea ON ea.flag = p.fa
              JOIN flag_est eb ON eb.flag = p.fb
              JOIN union_est ue ON ue.fa = p.fa AND ue.fb = p.fb
              JOIN inter_est ie ON ie.fa = p.fa AND ie.fb = p.fb
              ORDER BY p.fa, p.fb""")),

    // referential-integrity audit over the whole star schema: row and
    // orphan counts for every FK edge, as one summary frame — the
    // data-quality gate a lake runs after every load. Each CHILD table
    // is scanned ONCE: all of its FK edges resolve as left joins
    // against parent key projections in a single plan, and one
    // conditional aggregate counts rows + per-edge null parents (the
    // anti-join count IS the null-parent count when the parent key is
    // unique). The old shape ran a separate anti-join + count pair per
    // edge — six executions of the lineitem scan; this runs one, which
    // is the difference between 1x and 6x the fact I/O at 100 TB.
    // Parent sides are key-only projections (broadcast when small,
    // shuffle otherwise — AQE's call); output is seven rows however
    // large the facts are.
    QueryDef("q167_fk_orphans",
      (s, d) => {
        // child scanned once; edges = (name, fk, parentTbl, pk)
        def audit(childTbl: String, edges: Seq[(String, String, String, String)]) = {
          // DISTINCT parent keys make the left join fan-out-proof: a
          // double-loaded dim row (exactly the dirt this audit hunts)
          // must not inflate n_rows or cross-contaminate the other
          // edges' orphan counts — NOT EXISTS semantics, one fact scan
          val joined = edges.foldLeft(table(s, d, childTbl)) {
            case (acc, (_, fk, parentTbl, pk)) =>
              acc.join(table(s, d, parentTbl)
                .select(col(pk).as(s"__p_$fk")).distinct(),
                col(fk) === col(s"__p_$fk"), "left")
          }
          val agg = joined.agg(
            count(lit(1)).as("n_rows"),
            edges.map { case (_, fk, _, _) =>
              count(when(col(s"__p_$fk").isNull, 1)).as(s"__o_$fk")
            }: _*)
          val stackArgs = edges.map { case (name, fk, _, _) =>
            s"'$name', n_rows, __o_$fk"
          }.mkString(", ")
          agg.select(expr(
            s"stack(${edges.size}, $stackArgs) AS (edge, n_rows, n_orphans)"))
        }
        Seq(
          audit("customer", Seq(
            ("customer->nation", "c_nationkey", "nation", "n_nationkey"))),
          audit("lineitem", Seq(
            ("lineitem->orders", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem->part", "l_partkey", "part", "p_partkey"),
            ("lineitem->supplier", "l_suppkey", "supplier", "s_suppkey"))),
          audit("nation", Seq(
            ("nation->region", "n_regionkey", "region", "r_regionkey"))),
          audit("orders", Seq(
            ("orders->customer", "o_custkey", "customer", "c_custkey"))),
          audit("supplier", Seq(
            ("supplier->nation", "s_nationkey", "nation", "n_nationkey"))))
          .reduce(_ unionAll _)
          .orderBy("edge")
      },
      Some("""SELECT * FROM (
                SELECT 'customer->nation' AS edge,
                  (SELECT COUNT(*) FROM customer) AS n_rows,
                  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
                    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
                UNION ALL
                SELECT 'lineitem->orders',
                  (SELECT COUNT(*) FROM lineitem),
                  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
                UNION ALL
                SELECT 'lineitem->part',
                  (SELECT COUNT(*) FROM lineitem),
                  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
                UNION ALL
                SELECT 'lineitem->supplier',
                  (SELECT COUNT(*) FROM lineitem),
                  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                    (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
                UNION ALL
                SELECT 'nation->region',
                  (SELECT COUNT(*) FROM nation),
                  (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
                    (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
                UNION ALL
                SELECT 'orders->customer',
                  (SELECT COUNT(*) FROM orders),
                  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
                    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                UNION ALL
                SELECT 'supplier->nation',
                  (SELECT COUNT(*) FROM supplier),
                  (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
                    (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
              ) ORDER BY edge""")))
}
