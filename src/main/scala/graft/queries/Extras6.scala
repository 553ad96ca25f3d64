package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Corpus, Dedup}
import QueryDef.table

/** Round-4 widening, batch 3: sequence analytics over the event log
  * and dup-cluster canonicalization.
  *
  *  - gaps-and-islands (longest consecutive-day streak per user) —
  *    the classic rank-difference anchor trick, windows keyed by the
  *    high-cardinality user id
  *  - canonical-document election per duplicate cluster (the step
  *    after q77's connected components: which copy survives)
  *  - temporal as-of join of purchases against SCD2 state intervals
  *    (q136's versioned dimension consumed, not just built)
  *  - exact rolling 28-day distinct actives via bounded interval
  *    explode — the join-free sliding count-distinct
  *
  * Determinism: everything is integers, dates, and strings; no
  * doubles anywhere in this file.
  */
object Extras6 {

  val all: Seq[QueryDef] = Seq(

    // gaps & islands: longest consecutive-day activity streak per
    // user. day − row_number() is constant within a consecutive run
    // (the island anchor), so streaks fall out of one distinct + one
    // window + two aggregations. The window partitions by user_id —
    // high-cardinality, scales with the cluster.
    QueryDef("q149_user_streaks",
      (s, d) => {
        val du = table(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        du.withColumn("anchor",
            date_sub(col("day"), row_number().over(w)))
          .groupBy("user_id", "anchor")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("best_streak"), sum("len").as("n_active_days"))
          .orderBy(col("best_streak").desc, col("user_id"))
          .limit(25)
      },
      Some("""WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
              runs AS (SELECT user_id,
                  day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS anchor
                FROM du),
              streaks AS (SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
                          FROM runs GROUP BY user_id, anchor)
              SELECT user_id, MAX(len) AS best_streak,
                     CAST(SUM(len) AS BIGINT) AS n_active_days
              FROM streaks GROUP BY user_id
              ORDER BY best_streak DESC, user_id LIMIT 25""")),

    // canonical-document election: after q77's connected-component
    // clustering, each duplicate cluster keeps ONE survivor — longest
    // text wins, ties to the smallest id (the usual "best copy"
    // policy). One broadcast-sized join from cluster labels to doc
    // stats + a per-cluster argmax; text itself never shuffles.
    QueryDef("q150_canonical_docs",
      (s, d) => {
        val docs = table(s, d, "documents")
        val cl = Corpus.duplicateClusters(
          Dedup.lshCandidatePairs(docs, "doc_id",
            Dedup.shingles(col("text"), 3), numHashes = 8, rowsPerBand = 2))
        cl.join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            min(struct((-col("n_chars")).as("negc"), col("id").as("id"))).as("m"))
          .select(col("cluster"), col("n_members"),
            col("m.id").as("canonical_id"), (-col("m.negc")).as("canonical_chars"))
          .orderBy("cluster")
      },
      Some("""WITH RECURSIVE
              ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              sh AS (SELECT DISTINCT doc_id, s FROM
                (SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s FROM
                  (SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 1, 2))) AS i FROM ws) t1) t2),
              sig AS (SELECT doc_id,
                  MIN(md5('0:' || s)) AS mh0, MIN(md5('1:' || s)) AS mh1,
                  MIN(md5('2:' || s)) AS mh2, MIN(md5('3:' || s)) AS mh3,
                  MIN(md5('4:' || s)) AS mh4, MIN(md5('5:' || s)) AS mh5,
                  MIN(md5('6:' || s)) AS mh6, MIN(md5('7:' || s)) AS mh7
                FROM sh GROUP BY doc_id),
              bands AS (
                SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS sig FROM sig UNION ALL
                SELECT doc_id, 1 AS band, md5(mh2 || mh3) AS sig FROM sig UNION ALL
                SELECT doc_id, 2 AS band, md5(mh4 || mh5) AS sig FROM sig UNION ALL
                SELECT doc_id, 3 AS band, md5(mh6 || mh7) AS sig FROM sig),
              cand AS (
                SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
              edges AS (SELECT id1 AS src, id2 AS dst FROM cand
                        UNION ALL SELECT id2, id1 FROM cand),
              reach(id, root) AS (
                SELECT DISTINCT src, src FROM edges
                UNION
                SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
              cl AS (SELECT id, MIN(root) AS cluster FROM reach GROUP BY id),
              m AS (SELECT cl.cluster, cl.id, d.n_chars,
                      ROW_NUMBER() OVER (PARTITION BY cl.cluster
                        ORDER BY d.n_chars DESC, cl.id) AS rn,
                      COUNT(*) OVER (PARTITION BY cl.cluster) AS n_members
                    FROM cl JOIN documents d ON d.doc_id = cl.id)
              SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
                     id AS canonical_id, n_chars AS canonical_chars
              FROM m WHERE rn = 1 ORDER BY cluster""")),

    // temporal as-of consumption of the SCD2 dimension: every
    // purchase event joins the state interval active at its event
    // time (q136 BUILDS the versioned rows; this query reads them the
    // way a fact load does). The dimension versions over the
    // NON-purchase events — the fact stream and the dimension stream
    // are distinct, as in a real silver layout; a purchase with no
    // prior state drops (as-of semantics). The join is an equi-join
    // on user_id — versions per user are few, so the residual
    // containment filter is per-key local work.
    QueryDef("q151_scd2_asof",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val ev = table(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        val dim = ev.filter(col("event_type") =!= "purchase")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id").as("u"), col("event_type").as("state"),
            col("ts").as("valid_from"), col("valid_to"))
        val purchases = ev.filter(col("event_type") === "purchase")
        purchases.join(dim,
            col("user_id") === col("u") &&
              col("ts") >= col("valid_from") &&
              (col("valid_to").isNull || col("ts") < col("valid_to")))
          .groupBy("state")
          .agg(count(lit(1)).as("n_purchases"),
            countDistinct("user_id").as("n_users"))
          .orderBy("state")
      },
      Some("""WITH c AS (
                SELECT user_id, event_id, ts, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type
                FROM events WHERE event_type <> 'purchase'),
              dim AS (SELECT user_id AS u, event_type AS state, ts AS valid_from,
                        LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS valid_to
                      FROM c WHERE prev_type IS NULL OR prev_type <> event_type),
              p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
              SELECT dim.state, CAST(COUNT(*) AS BIGINT) AS n_purchases,
                     CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users
              FROM p JOIN dim ON p.user_id = dim.u
                AND p.ts >= dim.valid_from
                AND (dim.valid_to IS NULL OR p.ts < dim.valid_to)
              GROUP BY dim.state ORDER BY dim.state""")),

    // exact rolling 28-day distinct active users, one row per day:
    // each (user, active day) contributes to the 28 trailing window
    // ends it can satisfy — a BOUNDED explode (×28) + distinct +
    // count, all keyed shuffles. The window-function formulation
    // (COUNT(DISTINCT) OVER RANGE) doesn't exist in either engine at
    // scale; this is the exact shape, with sliding-HLL (q127
    // registers per day, max-merged) as the approximate path when
    // ×28 is too hot.
    QueryDef("q152_rolling_actives",
      (s, d) => {
        val du = table(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val mx = du.agg(max("day").as("mx"))
        du.select(col("user_id"),
            explode(sequence(col("day"), date_add(col("day"), 27))).as("d"))
          .distinct()
          .crossJoin(broadcast(mx))
          .filter(col("d") <= col("mx"))
          .groupBy("d")
          .agg(count(lit(1)).as("n_active_28d"))
          .orderBy("d")
      },
      Some("""WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
              mx AS (SELECT MAX(day) AS mx FROM du),
              c AS (SELECT DISTINCT user_id,
                      CAST(unnest(range(CAST(day AS TIMESTAMP),
                        CAST(day AS TIMESTAMP) + INTERVAL 28 DAY,
                        INTERVAL 1 DAY)) AS DATE) AS d
                    FROM du)
              SELECT d, CAST(COUNT(*) AS BIGINT) AS n_active_28d
              FROM c CROSS JOIN mx WHERE d <= mx
              GROUP BY d ORDER BY d"""))
  )
}
