package graft.sink

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal version-log ACID table on plain parquet.
  *
  * The north-star sink names "Parquet/Delta write"; no Delta jar can
  * resolve in this offline environment, so this implements the
  * write-side guarantees the engine actually needs from first
  * principles — the public Delta-protocol recipe (optimistic
  * concurrency over an append-only commit log) reduced to its core:
  *
  * {{{
  * <table>/data/<version>-<n>-<uuid>.parquet   immutable data files
  * <table>/_txlog/00000000000000000042.txt     one commit per version
  * }}}
  *
  * - **Atomicity**: writers stage parquet through a scratch dir, move
  *   the files into `data/`, and only then publish a commit file.
  *   Readers resolve the file set exclusively from commits, so a
  *   crashed writer leaves invisible orphans (reclaimed by
  *   [[vacuum]]), never a torn table.
  * - **Isolation**: the commit file is claimed with create-exclusive
  *   (`FileSystem.create(overwrite = false)` — atomic on HDFS-like
  *   stores). Losing a race throws [[CommitConflict]]; `append`
  *   retries under a fresh version (its files are still unpublished,
  *   so retry is safe), `overwrite` retries likewise under
  *   last-write-wins semantics.
  * - **Time travel**: a read replays commits `1..asOfVersion`
  *   (`overwrite` resets the live set, `append` extends it) — the
  *   read side of Delta's `VERSION AS OF`.
  * - **Schema**: every commit embeds the schema DDL; `append` must
  *   match the current schema exactly (evolution belongs to
  *   `overwrite`), and empty snapshots stay readable because the
  *   schema never depends on data files being present.
  *
  * Scale posture: data moves with full executor parallelism through
  * the normal parquet writer; the commit itself is one driver-side
  * metadata file of O(files) lines. Log replay is O(commits) driver
  * work — fine for the checkpoint-less minimal core (a production log
  * would fold checkpoints in, as the public protocol does).
  */
object TxLogTable {

  final class CommitConflict(version: Long)
    extends RuntimeException(s"version $version was claimed by a concurrent writer")

  private val LogDir = "_txlog"
  private val DataDir = "data"
  private val MaxCommitRetries = 20

  /** Append `df` as a new version; returns the committed version.
    *
    * `txn` carries idempotence across writer restarts (the public
    * protocol's transaction-identifier action): a commit records
    * `(appId, epoch)`, and a later append with the same appId and an
    * epoch <= the highest committed one is a NO-OP returning the
    * existing latest version. A streaming foreachBatch sink passes
    * `(queryName, batchId)` and replayed micro-batches deduplicate —
    * exactly-once table contents over at-least-once batch delivery.
    */
  def append(df: DataFrame, tablePath: String,
      txn: Option[(String, Long)] = None): Long =
    write(df, tablePath, overwrite = false, txn)

  /** Replace the table contents with `df`; returns the version. */
  def overwrite(df: DataFrame, tablePath: String): Long =
    write(df, tablePath, overwrite = true, None)

  /** MERGE INTO the table: read the latest snapshot, apply `updates`
    * with [[graft.ops.Merge.upsert]] semantics (matched keys replaced
    * wholesale, unmatched appended), and commit the result as one new
    * overwrite version. Readers of prior versions are unaffected —
    * the copy-on-write MERGE shape. Returns the committed version.
    */
  def merge(spark: SparkSession, tablePath: String,
      updates: DataFrame, key: String): Long = {
    val current = read(spark, tablePath)
    overwrite(graft.ops.Merge.upsert(current, updates, key), tablePath)
  }

  /** Snapshot read at `asOfVersion` (default: latest). */
  def read(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    val fs = fileSystem(spark, tablePath)
    val commits = committedVersions(fs, tablePath)
    require(commits.nonEmpty, s"not a TxLog table (no commits): $tablePath")
    val upTo = asOfVersion.getOrElse(commits.max)
    require(commits.contains(upTo),
      s"version $upTo does not exist; have ${commits.mkString(", ")}")
    val replayed = commits.filter(_ <= upTo).sorted
      .foldLeft((Vector.empty[String], Option.empty[String])) {
        case ((live, _), v) =>
          val c = parseCommit(fs, tablePath, v)
          val base = if (c.isOverwrite) Vector.empty[String] else live
          (base ++ c.files, Some(c.schemaDdl))
      }
    val (files, Some(ddl)) = replayed: @unchecked
    val schema = StructType.fromDDL(ddl)
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      spark.read.schema(schema)
        .parquet(files.map(f => s"$tablePath/$DataDir/$f"): _*)
    }
  }

  /** Committed versions, ascending. */
  def versions(spark: SparkSession, tablePath: String): Seq[Long] =
    committedVersions(fileSystem(spark, tablePath), tablePath).sorted

  /** Delete data files referenced by NO commit (crashed writers,
    * lost races). Every committed version stays readable — this never
    * truncates time travel. Returns the number of files removed.
    */
  def vacuum(spark: SparkSession, tablePath: String): Int = {
    val fs = fileSystem(spark, tablePath)
    val referenced = committedVersions(fs, tablePath)
      .flatMap(v => parseCommit(fs, tablePath, v).files).toSet
    val dataPath = new Path(tablePath, DataDir)
    if (!fs.exists(dataPath)) 0
    else {
      val orphans = fs.listStatus(dataPath)
        .map(_.getPath).filterNot(p => referenced.contains(p.getName))
      orphans.foreach(fs.delete(_, false))
      orphans.length
    }
  }

  // ---------------------------------------------------------------

  private final case class Commit(
      isOverwrite: Boolean, schemaDdl: String, files: Seq[String],
      txn: Option[(String, Long)] = None)

  /** Highest committed epoch for `appId`, if any commit carries it. */
  private def lastEpoch(fs: FileSystem, tablePath: String,
      versions: Seq[Long], appId: String): Option[Long] = {
    val epochs = versions.flatMap(v => parseCommit(fs, tablePath, v).txn)
      .collect { case (a, e) if a == appId => e }
    if (epochs.isEmpty) None else Some(epochs.max)
  }

  private def write(df: DataFrame, tablePath: String, overwrite: Boolean,
      txn: Option[(String, Long)]): Long = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, tablePath)
    val ddl = df.schema.toDDL

    // replayed transaction: the epoch is already in the log — skip
    // before paying for the staging write
    txn.foreach { case (appId, epoch) =>
      val commits0 = committedVersions(fs, tablePath)
      if (lastEpoch(fs, tablePath, commits0, appId).exists(_ >= epoch))
        return commits0.max
    }

    // 1. stage with full parallelism, invisible to readers
    val stagingId = java.util.UUID.randomUUID().toString
    val staging = new Path(tablePath, s"_staging/$stagingId")
    df.write.parquet(staging.toString)
    val staged = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).sortBy(_.getName)

    // 2..3. move into data/ under a version-stamped name, then race
    // for the commit file; on a lost race re-claim under the next
    // version (our files are unreferenced until a commit names them,
    // so the retry republishes the same data, never duplicates it)
    var attempt = 0
    var published: Option[(Long, Seq[String])] = None
    var result = -1L
    try {
      while (result < 0) {
        attempt += 1
        if (attempt > MaxCommitRetries)
          throw new IllegalStateException(
            s"gave up after $MaxCommitRetries commit attempts on $tablePath")
        val commits = committedVersions(fs, tablePath)
        // a concurrent writer may have landed our epoch while we
        // raced — re-check under every retry so a replayed batch can
        // never double-commit (our moved files become vacuumable)
        txn.foreach { case (appId, epoch) =>
          if (lastEpoch(fs, tablePath, commits, appId).exists(_ >= epoch))
            return commits.max
        }
        val version = if (commits.isEmpty) 1L else commits.max + 1L
        if (!overwrite && commits.nonEmpty) {
          val current = parseCommit(fs, tablePath, commits.max).schemaDdl
          require(current == ddl,
            s"append schema mismatch: table has [$current], batch has [$ddl] " +
              "— schema changes go through overwrite")
        }
        val names = published match {
          case Some((_, ns)) => ns // files already in data/ from a lost race
          case None =>
            val dataPath = new Path(tablePath, DataDir)
            fs.mkdirs(dataPath)
            // names are uuid-based and version-free: only the commit
            // log binds a file to a version (a lost race re-publishes
            // the same names under the next version)
            val ns = staged.zipWithIndex.map { case (src, i) =>
              val name = s"$stagingId-$i.parquet"
              require(fs.rename(src, new Path(dataPath, name)),
                s"failed to move staged file $src")
              name
            }.toSeq
            published = Some((version, ns))
            ns
        }
        try {
          claimCommit(fs, tablePath, version, Commit(overwrite, ddl, names, txn))
          result = version
        } catch {
          case _: CommitConflict => () // loop: re-read log, next version
        }
      }
    } finally fs.delete(staging, true)
    result
  }

  private def claimCommit(fs: FileSystem, tablePath: String, version: Long,
      c: Commit): Unit = {
    val logPath = new Path(tablePath, LogDir)
    fs.mkdirs(logPath)
    val commitPath = new Path(logPath, commitName(version))
    if (fs.exists(commitPath)) throw new CommitConflict(version)
    val out =
      try fs.create(commitPath, /* overwrite = */ false)
      catch { case _: java.io.IOException => throw new CommitConflict(version) }
    try {
      val body = new StringBuilder()
        .append("action=").append(if (c.isOverwrite) "overwrite" else "append").append('\n')
        .append("schema=").append(c.schemaDdl).append('\n')
      c.txn.foreach { case (appId, epoch) =>
        body.append("txnApp=").append(appId).append('\n')
          .append("txnEpoch=").append(epoch).append('\n')
      }
      c.files.foreach(f => body.append("file=").append(f).append('\n'))
      out.write(body.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
  }

  private def parseCommit(fs: FileSystem, tablePath: String, version: Long): Commit = {
    val p = new Path(new Path(tablePath, LogDir), commitName(version))
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split('\n').filter(_.nonEmpty)
    def field(k: String): String = lines
      .collectFirst { case l if l.startsWith(s"$k=") => l.substring(k.length + 1) }
      .getOrElse(throw new IllegalStateException(s"corrupt commit $p: missing $k"))
    def opt(k: String): Option[String] = lines
      .collectFirst { case l if l.startsWith(s"$k=") => l.substring(k.length + 1) }
    Commit(
      isOverwrite = field("action") == "overwrite",
      schemaDdl = field("schema"),
      files = lines.collect { case l if l.startsWith("file=") => l.substring(5) }.toSeq,
      txn = for { a <- opt("txnApp"); e <- opt("txnEpoch") } yield (a, e.toLong))
  }

  private def commitName(version: Long): String = f"$version%020d.txt"

  private def committedVersions(fs: FileSystem, tablePath: String): Seq[Long] = {
    val logPath = new Path(tablePath, LogDir)
    if (!fs.exists(logPath)) Seq.empty
    else fs.listStatus(logPath).map(_.getPath.getName)
      .filter(_.endsWith(".txt"))
      .flatMap(n => scala.util.Try(n.stripSuffix(".txt").toLong).toOption)
      .toSeq
  }

  private def fileSystem(spark: SparkSession, tablePath: String): FileSystem =
    new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
