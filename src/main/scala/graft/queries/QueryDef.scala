package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark plan builder plus (when SQL-expressible)
  * an equivalent ANSI SQL text for the DuckDB oracle. Column names and
  * row order must agree between the two (the driver's compare hashes
  * values after sorting columns by name).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Per-JVM scratch base for queries that materialize side tables
    * (TxLog tables, bucketed warehouses, ORC round-trips). One temp
    * base per session, removed by a shutdown hook — repeated
    * verify/bench/stability sweeps previously leaked one
    * `Files.createTempDirectory` per query execution (27 sites),
    * accumulating unbounded /tmp dirs. */
  private lazy val scratchBase: java.nio.file.Path = {
    // scratch is ephemeral by definition — prefer the memory-backed
    // tmpfs when the host has one. Scratch-table I/O (TxLog side
    // tables, bucketed warehouses, ORC round-trips) is pure machinery
    // cost, and three rounds of official-bench attribution traced the
    // dominant cross-run variance to host disk slow windows landing
    // exactly on these writes (r15 checkpoint: the code-unchanged
    // TxLog family +14 s in one window, q232 +3.2 s alone). At
    // deployment scale scratch lives on the cluster's ephemeral
    // local-SSD tier; tmpfs is the single-node equivalent, and losing
    // scratch on restart IS the contract (every site re-creates via
    // [[scratch]]).
    //
    // Guards (round 16): SPARK_GRAFT_NO_SHM — the kill-switch
    // SCALE.md advertises — gates this choice too, not just Bench's
    // spark.local.dir; and tmpfs is only taken when its filestore
    // reports a usable-space floor (4 GiB). Docker's default /dev/shm
    // is 64 MiB — writable, but ENOSPC on the first ORC round-trip;
    // the old /tmp fallback is the right answer there.
    val shm = java.nio.file.Paths.get("/dev/shm")
    def shmUsable: Boolean =
      try java.nio.file.Files.getFileStore(shm).getUsableSpace >= (4L << 30)
      catch { case _: Throwable => false }
    val base =
      if (!sys.env.contains("SPARK_GRAFT_NO_SHM") &&
          java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm) && shmUsable)
        java.nio.file.Files.createTempDirectory(shm, "graft_scratch")
      else java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(base)))
    base
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
  }

  /** A deterministic per-prefix scratch dir, EMPTIED on every call:
    * re-running the same query overwrites its previous scratch
    * instead of leaking a fresh temp dir. Queries run sequentially in
    * Verify/Bench; the synchronization is a backstop for concurrent
    * callers with distinct prefixes. Returns a freshly-created empty
    * directory — the exact `createTempDirectory` contract the call
    * sites were written against. */
  def scratch(prefix: String): java.nio.file.Path = scratchBase.synchronized {
    val p = scratchBase.resolve(prefix)
    deleteRecursively(p)
    java.nio.file.Files.createDirectories(p)
  }

  /** Shorthand parquet table loader for the testdata star schema.
    *
    * `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark
    * cannot read as a timestamp; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so it scans as LONG
    * nanos, and the loader converts to TIMESTAMP_NTZ here via integer
    * division (`div 1000` — a double-precision divide would lose
    * microseconds at ~1.7e18 ns epoch values).
    */
  /** Inferred-schema cache for [[table]]. Every `spark.read.parquet`
    * without an explicit schema fires a one-task footer-read JOB —
    * a scheduler barrier — before the query proper starts; a query
    * touching six tables pays six. The testdata star schema is
    * immutable for the life of the JVM, so the first inference per
    * path is authoritative and every later load passes it explicitly
    * (zero jobs). Keyed by path PLUS the nanos-as-long conf: `events`
    * infers `ts` as LONG only under that flag, and a session reading
    * without it must not inherit the flagged session's schema.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = path + "|" + spark.conf
      .getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    val converted =
      if (name == "events")
        // normalize ts to TIMESTAMP_NTZ whatever the writer encoded:
        // TIMESTAMP(NANOS) scans as LONG under nanosAsLong; micro-
        // precision parquet (e.g. written by another engine) scans as
        // a timestamp type already — a lake has mixed writers
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts",
              org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
                .cast(org.apache.spark.sql.types.TimestampNTZType))
          case _ =>
            df.withColumn("ts",
              org.apache.spark.sql.functions.col("ts")
                .cast(org.apache.spark.sql.types.TimestampNTZType))
        }
      else df
    // documents/embeddings are tiny ON DISK (<1 MB → one input split)
    // but per-ROW expensive (shingling, hashing, 64-dim math): split
    // them across the cluster explicitly. At 100 TB these tables are
    // many-splits anyway and this round-robin is a no-op cost; in
    // local bench it is the difference between 1 and 32 busy cores.
    if (name == "documents" || name == "embeddings")
      converted.repartition(spark.sparkContext.defaultParallelism)
    else converted
  }
}
