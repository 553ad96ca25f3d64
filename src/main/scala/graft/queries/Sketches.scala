package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Engine-portable sketches: approximate aggregates whose results are
  * bit-identical across Spark and DuckDB, so they pass the full hash
  * oracle gate (unlike q66/q67, whose Spark-native HLL++/KLL estimates
  * are engine-specific and checked rows-only + accuracy-bounded in
  * SketchSpec).
  *
  * Portability rules used here:
  *   - the only hash is md5 (identical everywhere), consumed as hex
  *     text — register index and leading-zero count are derived with
  *     pure string ops (instr/substring/regexp_extract) and CASE
  *     tables, never engine bit intrinsics;
  *   - every float literal is CAST(... AS DOUBLE) in BOTH dialects
  *     (bare literals parse as DECIMAL in both Spark and DuckDB, with
  *     different division semantics);
  *   - the float-sensitive expression text is shared verbatim between
  *     the Spark plan (`expr(...)`) and the oracle SQL, so both engines
  *     evaluate the same IEEE operation tree;
  *   - the HLL harmonic sum adds only powers of two in [2^-41, 1]
  *     (49-bit span < 53-bit mantissa), so partial sums are EXACT and
  *     the result is independent of partitioning / add order — safe to
  *     compare across engines and across cluster sizes.
  *
  * Scale design: both queries are dedup-or-sample-first. q81 keys the
  * register aggregation by (group, bucket) — ≤ 256 rows of state per
  * group after the first combine, duplicate-insensitive, so the final
  * shuffle is tiny at any data size. q82 cuts the data 4x with a
  * deterministic hash sample before the per-group sort (the pattern
  * that replaces a full-data sort-quantile at 100 TB).
  */
object Sketches {

  import graft.functions.PortableHll.{M, RHO, BUCKET, EST}

  val all: Seq[QueryDef] = Seq(

    // distinct orders per returnflag, estimated by a from-scratch
    // portable HyperLogLog next to the exact count. Same dedup-first
    // shape as q66 (see the rationale there): register state is keyed
    // by final group only, never by distinct key.
    QueryDef("q81_portable_hll",
      (s, d) => {
        val dedup = table(s, d, "lineitem")
          .select(col("l_returnflag").as("flag"), col("l_orderkey").as("key"))
          .distinct()
        val rho = dedup
          .select(col("flag"), md5(col("key").cast(StringType)).as("hx"))
          .select(col("flag"), expr(BUCKET).as("bucket"), expr(RHO).as("rho"))
        val est = rho.groupBy("flag", "bucket").agg(max(col("rho")).as("r"))
          .groupBy("flag")
          .agg(expr(s"CAST($M - COUNT(*) AS DOUBLE)").as("v"),
            expr(s"SUM(power(CAST(2.0 AS DOUBLE), -r)) + CAST($M - COUNT(*) AS DOUBLE)").as("s"))
        val exact = dedup.groupBy("flag").agg(count(lit(1)).as("exact_orders"))
        est.join(exact, "flag")
          .select(col("flag").as("l_returnflag"),
            expr(EST).as("approx_orders"), col("exact_orders"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH dedup AS (
                SELECT DISTINCT l_returnflag AS flag, l_orderkey AS key FROM lineitem),
              rho AS (
                SELECT flag, $BUCKET AS bucket, $RHO AS rho
                FROM (SELECT flag, md5(CAST(key AS VARCHAR)) AS hx FROM dedup) h),
              est AS (
                SELECT flag, CAST($M - COUNT(*) AS DOUBLE) AS v,
                  SUM(power(CAST(2.0 AS DOUBLE), -r)) + CAST($M - COUNT(*) AS DOUBLE) AS s
                FROM (SELECT flag, bucket, MAX(rho) AS r FROM rho GROUP BY flag, bucket) regs
                GROUP BY flag),
              exact AS (SELECT flag, COUNT(*) AS exact_orders FROM dedup GROUP BY flag)
              SELECT e.flag AS l_returnflag, $EST AS approx_orders, x.exact_orders
              FROM est e JOIN exact x USING (flag) ORDER BY l_returnflag""")),

    // HLL sketch MERGE: per-shard registers united into a global
    // sketch by a bucket-wise MAX — the property that makes sketches
    // work on a 1000-executor cluster (each shard builds its 256-row
    // register set locally; only registers cross the network; the
    // merged estimate is IDENTICAL to the single-pass global sketch,
    // which this query proves by emitting both). Shards overlap in
    // keys, which a sketch union absorbs and a naive sum of per-shard
    // counts would double-count.
    QueryDef("q127_hll_shard_merge",
      (s, d) => {
        val dedup = table(s, d, "lineitem")
          .select((col("l_suppkey") % 8).as("shard"), col("l_orderkey").as("key"))
          .distinct()
        val rho = dedup
          .select(col("shard"), md5(col("key").cast(StringType)).as("hx"))
          .select(col("shard"), expr(BUCKET).as("bucket"), expr(RHO).as("rho"))
        def estOf(regs: org.apache.spark.sql.DataFrame) = regs
          .agg(expr(s"CAST($M - COUNT(*) AS DOUBLE)").as("v"),
            expr(s"SUM(power(CAST(2.0 AS DOUBLE), -r)) + CAST($M - COUNT(*) AS DOUBLE)").as("s"))
          .select(expr(EST).as("e"))
        // EVERY consumer reads the per-shard register frame — the
        // fact table is scanned and de-duplicated ONCE (the round-10
        // form fed `rho` to three consumers, so the lineitem scan +
        // DISTINCT shuffle executed ~3× for one 3-number result —
        // three full fact passes at 100 TB). The direct (un-sharded)
        // estimate folds from shardRegs by max-associativity:
        // max over bucket of rho == max over bucket of the per-shard
        // maxes — the exact identity the sketch-merge property rests
        // on, so demonstrating merged == direct from one register
        // frame is the property, not a shortcut. n_shards likewise:
        // every non-empty shard owns ≥1 register, so the register
        // frame carries the exact shard census. The frame is PINNED
        // (localCheckpoint, ~shards×buckets = 2048 rows — register-
        // sized, not data-sized) because column pruning specializes
        // each consumer's partial-agg subtree and defeats
        // ReuseExchange; the pin is released by the caller (bench
        // drops all blocks per query; Verify's session is per-run).
        val shardRegs = rho.groupBy("shard", "bucket").agg(max(col("rho")).as("r"))
          .transform(graft.ops.Pinned.pin)
        val merged = estOf(shardRegs.groupBy("bucket").agg(max(col("r")).as("r")))
          .select(col("e").as("est_merged"))
        val direct = estOf(shardRegs.groupBy("bucket").agg(max(col("r")).as("r")))
          .select(col("e").as("est_direct"))
        val nShards = shardRegs.agg(countDistinct("shard").as("n_shards"))
        nShards.crossJoin(merged).crossJoin(direct)
      },
      Some(s"""WITH dedup AS (
                SELECT DISTINCT l_suppkey % 8 AS shard, l_orderkey AS key FROM lineitem),
              rho AS (
                SELECT shard, $BUCKET AS bucket, $RHO AS rho
                FROM (SELECT shard, md5(CAST(key AS VARCHAR)) AS hx FROM dedup) h),
              sregs AS (SELECT shard, bucket, MAX(rho) AS r FROM rho GROUP BY shard, bucket),
              mstats AS (
                SELECT CAST($M - COUNT(*) AS DOUBLE) AS v,
                  SUM(power(CAST(2.0 AS DOUBLE), -r)) + CAST($M - COUNT(*) AS DOUBLE) AS s
                FROM (SELECT bucket, MAX(r) AS r FROM sregs GROUP BY bucket) m),
              dstats AS (
                SELECT CAST($M - COUNT(*) AS DOUBLE) AS v,
                  SUM(power(CAST(2.0 AS DOUBLE), -r)) + CAST($M - COUNT(*) AS DOUBLE) AS s
                FROM (SELECT bucket, MAX(rho) AS r FROM rho GROUP BY bucket) g)
              SELECT
                (SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) FROM dedup) AS n_shards,
                (SELECT $EST FROM mstats) AS est_merged,
                (SELECT $EST FROM dstats) AS est_direct""")),

    // discrete (type-1) median over a 25% deterministic md5 sample:
    // the sample-then-exact-quantile pattern. Lower-median rank
    // floor((n+1)/2) is selected with integer arithmetic only
    // (rn*2 = cnt for even n, rn*2 = cnt+1 for odd), and the median is
    // an actual data value — no interpolation, no float averaging.
    // The rank pass is Ranks.groupRanked, not a 5-partition window:
    // sampling cuts the constant, not the skew asymptote.
    QueryDef("q82_sample_quantile",
      (s, d) => {
        val sampled = table(s, d, "orders")
          .filter(substring(md5(col("o_orderkey").cast(StringType)), 1, 1)
            .isin("0", "1", "2", "3"))
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        graft.ops.Ranks.groupRanked(
            sampled, "o_orderpriority", "o_totalprice", Seq("o_orderkey"))
          .filter(col("rn") * 2 === col("n") || col("rn") * 2 === col("n") + 1)
          .select(col("o_orderpriority"), col("n").as("n_sampled"),
            col("o_totalprice").as("sample_median"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH sampled AS (
                SELECT o_orderpriority, o_totalprice, o_orderkey FROM orders
                WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
              ranked AS (
                SELECT o_orderpriority, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
                FROM sampled)
              SELECT o_orderpriority, cnt AS n_sampled, o_totalprice AS sample_median
              FROM ranked WHERE rn * 2 = cnt OR rn * 2 = cnt + 1
              ORDER BY o_orderpriority"""))
  )
}
