package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.EqualTo
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}

import graft.sink.TxLogTable

/** ANSI DML statements against TxLog tables, parsed by SPARK'S OWN
  * SQL parser: `DELETE FROM t WHERE …` and
  * `UPDATE t SET c = e, … [WHERE …]` parse to Catalyst's
  * [[DeleteFromTable]]/[[UpdateTable]] command nodes (the same nodes
  * a DSv2 catalog receives), and this router binds the table
  * reference through a name → table-path registry and executes the
  * copy-on-write [[TxLogTable.delete]]/[[TxLogTable.update]].
  *
  * Using the real parser (not a hand-rolled one) means the full
  * expression grammar works in predicates and assignments —
  * arithmetic, CASE, string functions, IN lists — because the parsed
  * expression trees are re-rendered to SQL (`Expression.sql`) and
  * evaluated by the engine against the snapshot. Returns the
  * committed version (unchanged when nothing matched).
  */
object SqlDml {

  /** Catalog-qualified form: `UPDATE graft.ns.t SET …` resolves the
    * table path through the registered [[graft.sources.GraftCatalog]]
    * — no name→path map needed (DELETE already works as plain
    * `spark.sql` via SupportsDeleteV2; this closes UPDATE too).
    */
  def run(spark: SparkSession, sql: String): Long =
    run(spark, sql, Map.empty)

  def run(spark: SparkSession, sql: String,
      tables: Map[String, String]): Long = {
    def catalogPath(parts: Seq[String]): Option[String] =
      if (parts.size < 2) None
      else scala.util.Try(spark.sessionState.catalogManager
          .catalog(parts.head)).toOption.collect {
        case g: graft.sources.GraftCatalog =>
          g.tablePathOf(org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.tail.init.toArray, parts.last))
      }
    def pathOf(rel: LogicalPlan): String = rel match {
      case u: UnresolvedRelation =>
        val name = u.multipartIdentifier.mkString(".")
        tables.get(name)
          .orElse(catalogPath(u.multipartIdentifier))
          .getOrElse(throw new IllegalArgumentException(
            s"unknown table '$name'; registered: ${tables.keys.toSeq.sorted.mkString(", ")}"))
      case other => throw new IllegalArgumentException(
        s"unsupported table reference: $other")
    }
    def bare(name: String): String = name.stripPrefix("`").stripSuffix("`")
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case d: DeleteFromTable =>
        TxLogTable.delete(spark, pathOf(d.table), d.condition.sql)
      case u: UpdateTable =>
        val where = u.condition.map(_.sql).getOrElse("true")
        val set = u.assignments.map(a => bare(a.key.sql) -> a.value.sql).toMap
        TxLogTable.update(spark, pathOf(u.table), where, set)
      // the canonical CDC upsert: MERGE INTO t USING src ON t.k = src.k
      // WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * —
      // routed to the keyed copy-on-write [[TxLogTable.merge]] (only
      // files containing matched keys rewrite). The source may be any
      // relation or subquery the session can resolve.
      case m: MergeIntoTable =>
        def unalias(p: LogicalPlan): LogicalPlan = p match {
          case SubqueryAlias(_, child) => unalias(child)
          case other                   => other
        }
        val upsertStar =
          m.matchedActions.forall {
            case UpdateStarAction(None) => true; case _ => false } &&
          m.matchedActions.nonEmpty &&
          m.notMatchedActions.forall {
            case InsertStarAction(None) => true; case _ => false } &&
          m.notMatchedActions.nonEmpty &&
          m.notMatchedBySourceActions.isEmpty
        require(upsertStar,
          "SqlDml MERGE supports the upsert-star form only (WHEN MATCHED " +
            "THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *); use the " +
            "TxLogTable API for bespoke merge actions")
        val key = m.mergeCondition match {
          case EqualTo(l, r) =>
            val ln = bare(l.sql).split('.').last
            val rn = bare(r.sql).split('.').last
            require(ln == rn, s"MERGE condition must equate the same-named " +
              s"key on both sides, got ${l.sql} = ${r.sql}")
            ln
          case other => throw new IllegalArgumentException(
            s"MERGE condition must be a single key equality, got ${other.sql}")
        }
        val source = org.apache.spark.sql.graftshim.ColumnShim.ofRows(
          spark, unalias(m.sourceTable))
        TxLogTable.merge(spark, pathOf(unalias(m.targetTable)), source, key)
      case other => throw new IllegalArgumentException(
        "SqlDml handles DELETE FROM / UPDATE / MERGE INTO statements only, got: " +
          other.getClass.getSimpleName)
    }
  }
}
