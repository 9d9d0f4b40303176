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

/** Table-maintenance surface (the Iceberg `DELETE FROM` /
  * `rewrite_data_files` / `expire_snapshots` triple) — split from
  * [[TableResolver]] because read-only resolvers (a production
  * REST-catalog binding without write credentials) legitimately don't
  * have it; the HTTP maintenance routes probe for this trait and
  * answer 501 when the catalog can't. */
trait TableMaintenance {
  /** Copy-on-write row delete; returns rows deleted. */
  def deleteWhere(namespace: String, table: String,
      pred: org.apache.spark.sql.Column): Long
  /** Bin-pack the current snapshot toward `targetFileBytes`; returns
    * the resulting file count. */
  def compactFiles(namespace: String, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int
  /** Expire all but the newest `keepLast` snapshots; returns the
    * expired snapshot ids. */
  def expireSnapshots(namespace: String, table: String,
      keepLast: Int = 1): Seq[Long]
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
    cacheSnapshots: Boolean = true) extends TableResolver
    with TableMaintenance {

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

  /** Copy-on-write row delete — the Iceberg `DELETE FROM` COW shape
    * (the other Iceberg mode, merge-on-read delete files, trades write
    * amplification for read cost; COW is the right default for a
    * batch-maintained analytics table). Rewrites the current
    * snapshot's SURVIVORS into one new data dir and commits it as a
    * replace-style snapshot, so every prior snapshot stays readable
    * (time travel over the delete). Returns the number of rows
    * deleted. At scale the predicate is a Catalyst column: it pushes
    * into the parquet scan of the rewrite, and files whose row groups
    * are entirely survivors are still rewritten — directory-granular
    * manifests can't splice file lists; real Iceberg keeps untouched
    * FILES, which is exactly the metadata granularity the offline
    * image can't express (see the class scaladoc). */
  override def deleteWhere(namespace: String, table: String,
      pred: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    // SQL DELETE semantics: a NULL predicate row is NOT deleted. The
    // naive survivor filter `!pred` is also NULL there — the row would
    // vanish from BOTH the delete count and the survivors. Three-valued
    // logic is collapsed once, and both legs use the same collapsed
    // column, so matched + survivors is always the full row count.
    val deleted = coalesce(pred, lit(false))
    val cur = load(namespace, table)
    val matched = cur.filter(deleted).count()
    if (matched == 0L) return 0L // no-op deletes must not burn a snapshot
    commit(namespace, table, cur.filter(not(deleted)), carryForward = false)
    matched
  }

  /** Small-file compaction — the Iceberg `rewrite_data_files`
    * bin-pack analogue, THE table-maintenance operation at 100 TB
    * (streaming appends leave thousands of KB-sized files per
    * partition; scan tasks then pay per-file open/footer costs and
    * the driver pays per-file planning memory). Rewrites the current
    * snapshot into ~`ceil(bytes / targetFileBytes)` files via
    * `coalesce` (a partition-merge NARROW dependency — no shuffle: at
    * 100 TB a compaction that shuffles every byte would double its own
    * cost; `repartition` would also break any within-file ordering a
    * writer established). Rows are unchanged; prior snapshots stay
    * readable. Returns the new file count. No-ops (returns the
    * current count) when the table is already at or below the target
    * file count — compaction must never make MORE files. */
  override def compactFiles(namespace: String, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive")
    val files = filesTable(namespace, table).collect()
    val totalBytes = files.map(_.getLong(1)).sum
    val target = math.max(1, math.ceil(
      totalBytes.toDouble / targetFileBytes).toInt)
    if (files.length <= target) return files.length
    commit(namespace, table, load(namespace, table).coalesce(target),
      carryForward = false)
    filesTable(namespace, table).count().toInt
  }

  /** Snapshot expiry — the Iceberg `expire_snapshots` analogue:
    * drops every snapshot except the newest `keepLast`, then deletes
    * the data dirs no surviving manifest references (orphan cleanup —
    * a time-travel window must be bounded or COW deletes/compactions
    * retain every byte ever written). The legacy flat layout (`.`)
    * is never deleted: it IS the table dir. Returns the expired
    * snapshot ids. */
  override def expireSnapshots(namespace: String, table: String,
      keepLast: Int = 1): Seq[Long] = synchronized {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val dir = tblDir(namespace, table)
    val all = snapshots(namespace, table)
    val (expired, kept) = all.splitAt(math.max(0, all.size - keepLast))
    if (expired.isEmpty) return Seq.empty
    def dirsOf(v: Long): Set[String] = {
      val mf = new java.io.File(dir, s"v$v.manifest")
      if (mf.exists())
        java.nio.file.Files.readAllLines(mf.toPath)
          .toArray(Array.empty[String]).toSet.filter(_.nonEmpty)
      else Set(".")
    }
    val keptDirs = kept.flatMap(dirsOf).toSet
    val orphaned = expired.flatMap(dirsOf).toSet -- keptDirs - "."
    expired.foreach { v =>
      new java.io.File(dir, s"v$v.manifest").delete()
      registry.remove((namespace, table, v)).foreach(_.unpersist(false))
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    orphaned.foreach(d => rm(new java.io.File(dir, d)))
    expired
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
