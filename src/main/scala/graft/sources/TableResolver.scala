package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Catalog abstraction (SURVEY §7 environment note): the serving layer
  * resolves `namespace.table` through this trait so the storage backend is
  * swappable. In production the implementation is one line per method over
  * an Iceberg catalog (`spark.table("lakehouse.ns.tbl")`,
  * `df.writeTo(...).append()`, `SELECT ... VERSION AS OF`, `SHOW
  * NAMESPACES` — the reference's own Spark wiring,
  * sedona-defaults.conf:5-21); `iceberg-spark-runtime` is not in this
  * offline image, so tests run on [[ParquetCatalog]], which gives the same
  * surface — including snapshot pinning (S2) and a snapshot-keyed scan
  * cache (reference engine.py:26-28,190-229) — over a directory tree of
  * parquet tables.
  *
  * Covers S2 (snapshot pinning), S3 (discovery), S6/S9 (create/append),
  * S11 (namespace DDL).
  */
trait TableResolver {
  /** Load the table at its CURRENT snapshot. */
  def load(namespace: String, table: String): DataFrame
  /** Load the table pinned at `version` (Iceberg: `VERSION AS OF`). */
  def loadAt(namespace: String, table: String, version: Long): DataFrame
  /** Snapshot ids, oldest first (Iceberg: the `.snapshots` metadata table). */
  def snapshots(namespace: String, table: String): Seq[Long]
  def listNamespaces(): Seq[String]
  def listTables(namespace: String): Seq[String]
  def createOrReplace(namespace: String, table: String, df: DataFrame): Unit
  def append(namespace: String, table: String, df: DataFrame): Unit
  def dropNamespace(namespace: String): Unit
}

/** Directory-backed implementation with Iceberg-like snapshot semantics:
  *
  * {{{
  * root/<namespace>/<table>/
  *   d3/part-*.parquet     write dirs (one per commit, immutable)
  *   v3.manifest           snapshot = newline list of write dirs
  * }}}
  *
  * Every commit writes a NEW data dir plus a NEW manifest: `replace` lists
  * only its own dir, `append` lists the previous manifest's dirs plus its
  * own — so old snapshots stay readable (time travel) without rewriting
  * data, exactly the Iceberg metadata shape at directory granularity.
  * A flat legacy dir of bare `*.parquet` files reads as snapshot 1 (the
  * manifest line `.` denotes the table dir itself).
  *
  * Snapshot-keyed cache (reference engine.py:26-28,190-229): `load`/
  * `loadAt` return a persisted plan keyed `(ns, table, version)`, so
  * repeated queries on an unchanged snapshot never re-plan the scan, and
  * loading a table whose current snapshot advanced evicts the stale
  * versions' cache entries. Disable with `cacheSnapshots = false`.
  * Nested namespaces use '.'-separated path segments (the Iceberg REST
  * 0x1F separator maps to '/' here).
  */
final class ParquetCatalog(spark: SparkSession, root: String,
    cacheSnapshots: Boolean = true) extends TableResolver {

  private def nsDir(ns: String) = new java.io.File(root, ns.replace('.', '/'))
  private def tblDir(ns: String, t: String) = new java.io.File(nsDir(ns), t)

  private val registry =
    scala.collection.mutable.Map.empty[(String, String, Long), DataFrame]
  // last current version observed per table: stale-eviction triggers only
  // when this ADVANCES, so a pinned old snapshot stays cached across
  // repeated time-travel reads of an unchanged table
  private val lastSeenCurrent =
    scala.collection.mutable.Map.empty[(String, String), Long]

  private def hasFlatParquet(dir: java.io.File): Boolean =
    Option(dir.listFiles()).exists(_.exists(f =>
      f.isFile && f.getName.endsWith(".parquet")))

  private def manifestVersions(dir: java.io.File): Seq[Long] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches("v\\d+\\.manifest"))
      .map(_.getName.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted.toSeq

  override def snapshots(namespace: String, table: String): Seq[Long] = {
    val dir = tblDir(namespace, table)
    require(dir.exists(), s"no such table: $namespace.$table")
    val ms = manifestVersions(dir)
    if (ms.nonEmpty) ms else if (hasFlatParquet(dir)) Seq(1L) else Seq.empty
  }

  private def currentVersion(ns: String, t: String): Long = {
    val snaps = snapshots(ns, t)
    require(snaps.nonEmpty, s"empty table: $ns.$t")
    snaps.last
  }

  /** Uncached read of one snapshot's file list. */
  private def readAt(ns: String, t: String, version: Long): DataFrame = {
    val dir = tblDir(ns, t)
    val mf = new java.io.File(dir, s"v$version.manifest")
    if (mf.exists()) {
      val dirs = java.nio.file.Files.readAllLines(mf.toPath)
      val paths = dirs.toArray(Array.empty[String]).toSeq
        .filter(_.nonEmpty)
        .map(d => if (d == ".") dir.getPath else new java.io.File(dir, d).getPath)
      spark.read.parquet(paths: _*)
    } else {
      require(version == 1L && hasFlatParquet(dir),
        s"no such snapshot: $ns.$t v$version")
      spark.read.parquet(dir.getPath)
    }
  }

  override def load(namespace: String, table: String): DataFrame =
    loadAt(namespace, table, currentVersion(namespace, table))

  override def loadAt(namespace: String, table: String, version: Long): DataFrame = {
    require(snapshots(namespace, table).contains(version),
      s"no such snapshot: $namespace.$table v$version")
    if (!cacheSnapshots) return readAt(namespace, table, version)
    synchronized {
      // stale-snapshot eviction: evict older versions' cached scans only
      // when the table's current snapshot ADVANCES (engine.py:213-229
      // semantics) — not on every loadAt, which would unpersist a pinned
      // old snapshot that was deliberately cached for time travel
      val cur = currentVersion(namespace, table)
      if (lastSeenCurrent.get((namespace, table)).exists(_ < cur)) {
        registry.keys
          .filter { case (n, t, v) => n == namespace && t == table && v < cur }
          .toSeq.foreach { k => registry.remove(k).foreach(_.unpersist(false)) }
      }
      lastSeenCurrent((namespace, table)) = cur
      registry.getOrElseUpdate((namespace, table, version),
        readAt(namespace, table, version)
          .persist(StorageLevel.MEMORY_AND_DISK))
    }
  }

  /** Iceberg `.snapshots` metadata-table analogue (S10): one row per
    * snapshot — (version, n_dirs, operation, committed_at). `operation`
    * is inferred from the manifest: a snapshot whose file list extends
    * the previous one is an append, otherwise a replace. */
  def snapshotsTable(namespace: String, table: String): DataFrame = {
    val dir = tblDir(namespace, table)
    val versions = snapshots(namespace, table)
    def dirsOf(v: Long): Seq[String] = {
      val mf = new java.io.File(dir, s"v$v.manifest")
      if (mf.exists())
        java.nio.file.Files.readAllLines(mf.toPath)
          .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
      else Seq(".")
    }
    val rows = versions.zipWithIndex.map { case (v, i) =>
      val ds = dirsOf(v)
      val op =
        if (i == 0) "replace"
        else if (ds.startsWith(dirsOf(versions(i - 1)))) "append"
        else "replace"
      val mf = new java.io.File(dir, s"v$v.manifest")
      val committed = if (mf.exists()) mf.lastModified() else dir.lastModified()
      (v, ds.size, op, committed)
    }
    import spark.implicits._
    rows.toDF("version", "n_dirs", "operation", "committed_at")
  }

  /** Iceberg `.files` metadata-table analogue (S10): the data files of
    * one snapshot (current by default) — (path, size_bytes). */
  def filesTable(namespace: String, table: String,
      version: Option[Long] = scala.None): DataFrame = {
    val dir = tblDir(namespace, table)
    val v = version.getOrElse(currentVersion(namespace, table))
    require(snapshots(namespace, table).contains(v),
      s"no such snapshot: $namespace.$table v$v")
    val mf = new java.io.File(dir, s"v$v.manifest")
    val dataDirs =
      if (mf.exists())
        java.nio.file.Files.readAllLines(mf.toPath)
          .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
          .map(d => if (d == ".") dir else new java.io.File(dir, d))
      else Seq(dir)
    val files = dataDirs.flatMap { d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length()))
    }.sortBy(_._1)
    import spark.implicits._
    files.toDF("path", "size_bytes")
  }

  override def listNamespaces(): Seq[String] = {
    def isTableDir(d: java.io.File) =
      hasFlatParquet(d) || manifestVersions(d).nonEmpty
    def walk(dir: java.io.File, prefix: String): Seq[String] = {
      val subs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory)
      subs.flatMap { d =>
        val name = if (prefix.isEmpty) d.getName else s"$prefix.${d.getName}"
        if (isTableDir(d)) Seq.empty else name +: walk(d, name)
      }.toSeq
    }
    walk(new java.io.File(root), "").sorted
  }

  override def listTables(namespace: String): Seq[String] =
    Option(nsDir(namespace).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        (hasFlatParquet(d) || manifestVersions(d).nonEmpty))
      .map(_.getName).sorted.toSeq

  private def commit(ns: String, t: String, df: DataFrame,
      carryForward: Boolean): Unit = synchronized {
    val dir = tblDir(ns, t)
    dir.mkdirs()
    val prev = snapshots(ns, t)
    val v = prev.lastOption.getOrElse(0L) + 1
    df.write.mode(SaveMode.Overwrite)
      .parquet(new java.io.File(dir, s"d$v").getPath)
    val prevDirs =
      if (!carryForward || prev.isEmpty) Seq.empty
      else {
        val lastMf = new java.io.File(dir, s"v${prev.last}.manifest")
        if (lastMf.exists())
          java.nio.file.Files.readAllLines(lastMf.toPath)
            .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
        else Seq(".") // legacy flat layout is snapshot 1's file list
      }
    val lines = (prevDirs :+ s"d$v").mkString("", "\n", "\n")
    java.nio.file.Files.writeString(
      new java.io.File(dir, s"v$v.manifest").toPath, lines)
    // a write may re-use a path a contraction probe has seen (e.g. a
    // drop + recreate restarts at d1) — drop the memoized duplicate
    // ratios rather than risk a stale statistic mis-picking a path
    graft.pipeline.Dedup.invalidateStats()
    // same contract for memoized fitted ANN models (Models.memo)
    graft.pipeline.Models.invalidate()
  }

  override def createOrReplace(namespace: String, table: String, df: DataFrame): Unit =
    commit(namespace, table, df, carryForward = false)

  override def append(namespace: String, table: String, df: DataFrame): Unit = {
    require(tblDir(namespace, table).exists() &&
      snapshots(namespace, table).nonEmpty,
      s"no such table: $namespace.$table")
    commit(namespace, table, df, carryForward = true)
  }

  override def dropNamespace(namespace: String): Unit = {
    synchronized {
      registry.keys.filter { case (n, _, _) =>
        n == namespace || n.startsWith(namespace + ".")
      }.toSeq.foreach { k => registry.remove(k).foreach(_.unpersist(false)) }
      lastSeenCurrent.keys.filter { case (n, _) =>
        n == namespace || n.startsWith(namespace + ".")
      }.toSeq.foreach(lastSeenCurrent.remove)
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(nsDir(namespace))
    // a recreate after this drop writes d1 again at the same path — any
    // duplicate-ratio statistic probed against the old data is stale
    graft.pipeline.Dedup.invalidateStats()
    graft.pipeline.Models.invalidate()
  }
}
