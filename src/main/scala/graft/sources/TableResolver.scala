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
  *   v3.manifest           snapshot = newline list of DATA FILES
  * }}}
  *
  * Every commit writes a NEW data dir plus a NEW manifest: `replace` lists
  * only its own files, `append` lists the previous manifest's entries plus
  * its own — so old snapshots stay readable (time travel) without
  * rewriting data. Manifests are FILE-granular (the real Iceberg manifest
  * shape): each line names one parquet file relative to the table dir
  * (`d3/part-0001.parquet`), which is what lets [[deleteWhere]] keep
  * untouched files and [[compactFiles]] bin-pack only the small-file
  * tail. Two legacy line forms still read: a bare dir name (`d3`, the
  * pre-file-granular manifest shape) expands to that dir's parquet files,
  * and `.` denotes a flat legacy dir of bare `*.parquet` files (which
  * also reads as snapshot 1 when no manifest exists at all). Maintenance
  * commits migrate legacy lines to file granularity as they rewrite.
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

  /** Raw manifest lines of one snapshot; a table with no manifest file
    * is the flat legacy layout, whose implied line is `.`. */
  private def linesOf(dir: java.io.File, v: Long): Seq[String] = {
    val mf = new java.io.File(dir, s"v$v.manifest")
    if (mf.exists())
      java.nio.file.Files.readAllLines(mf.toPath)
        .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
    else Seq(".")
  }

  private def parquetFilesIn(d: java.io.File): Seq[java.io.File] =
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq

  /** Expand manifest lines to (absolute file, file-granular line)
    * pairs. A file line maps to itself; a legacy dir line expands to
    * the dir's current parquet files (stable — write dirs are
    * immutable); `.` expands to the table dir's top-level files. The
    * file-granular side of each pair is what maintenance commits carry
    * forward, so legacy manifests migrate on first rewrite. */
  private def expandLines(dir: java.io.File,
      lines: Seq[String]): Seq[(java.io.File, String)] =
    lines.flatMap {
      case "." =>
        parquetFilesIn(dir).map(f => (f, f.getName))
      case l if l.endsWith(".parquet") =>
        Seq((new java.io.File(dir, l), l))
      case l =>
        parquetFilesIn(new java.io.File(dir, l))
          .map(f => (f, s"$l/${f.getName}"))
    }

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
    * the previous one is an append, otherwise a replace. `n_dirs`
    * counts the distinct DATA DIRS the snapshot's files span (the
    * pre-file-granular semantic, kept: it reads as "how many commits'
    * output does this snapshot stitch together"). */
  def snapshotsTable(namespace: String, table: String): DataFrame = {
    val dir = tblDir(namespace, table)
    val versions = snapshots(namespace, table)
    val rows = versions.zipWithIndex.map { case (v, i) =>
      val ds = linesOf(dir, v)
      val nDirs = ds.map {
        case "." => "."
        case l if l.endsWith(".parquet") && l.contains("/") =>
          l.substring(0, l.lastIndexOf('/'))
        case l if l.endsWith(".parquet") => "."
        case l => l
      }.distinct.size
      val op =
        if (i == 0) "replace"
        else if (ds.startsWith(linesOf(dir, versions(i - 1)))) "append"
        else "replace"
      val mf = new java.io.File(dir, s"v$v.manifest")
      val committed = if (mf.exists()) mf.lastModified() else dir.lastModified()
      (v, nDirs, op, committed)
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
    val files = expandLines(dir, linesOf(dir, v))
      .map { case (f, _) => (f.getPath, f.length()) }.sortBy(_._1)
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

  /** Synchronized end-to-end: the carried-lines read and the manifest
    * write must be one atomic section, or two concurrent appends can
    * both carry the same previous manifest and the second silently
    * drops the first's files (and an append racing deleteWhere can
    * resurrect deleted rows). The monitor is reentrant, so the nested
    * `commitWith` lock is free. */
  private def commit(ns: String, t: String, df: DataFrame,
      carryForward: Boolean): Unit = synchronized {
    val dir = tblDir(ns, t)
    val carried =
      if (!carryForward || snapshots(ns, t).isEmpty) Seq.empty[String]
      else linesOf(dir, snapshots(ns, t).last)
    commitWith(ns, t, df, carried)
  }

  /** Write `df` as a new data dir and commit a manifest of `carried`
    * lines (verbatim — appends carry the previous manifest, maintenance
    * passes the untouched FILE lines) plus the new dir's files. */
  private def commitWith(ns: String, t: String, df: DataFrame,
      carried: Seq[String]): Unit = synchronized {
    val dir = tblDir(ns, t)
    dir.mkdirs()
    val prev = snapshots(ns, t)
    val v = prev.lastOption.getOrElse(0L) + 1
    val ddir = new java.io.File(dir, s"d$v")
    df.write.mode(SaveMode.Overwrite).parquet(ddir.getPath)
    val newLines = parquetFilesIn(ddir).map(f => s"d$v/${f.getName}")
    val lines = (carried ++ newLines).mkString("", "\n", "\n")
    java.nio.file.Files.writeString(
      new java.io.File(dir, s"v$v.manifest").toPath, lines)
    // a write may re-use a path a contraction probe has seen (e.g. a
    // drop + recreate restarts at d1) — drop the memoized duplicate
    // ratios rather than risk a stale statistic mis-picking a path
    graft.pipeline.Dedup.invalidateStats()
    // same contract for memoized fitted ANN models (Models.memo)
    graft.pipeline.Models.invalidate()
  }

  override def createOrReplace(namespace: String, table: String, df: DataFrame): Unit = {
    commit(namespace, table, df, carryForward = false)
    // a replace discards the corpus a stored ANN artifact summarizes;
    // appends deliberately do NOT pass here (Models staleness contract)
    graft.pipeline.Models.dropStored(
      tblDir(namespace, table).getAbsolutePath)
  }

  override def append(namespace: String, table: String, df: DataFrame): Unit = {
    require(tblDir(namespace, table).exists() &&
      snapshots(namespace, table).nonEmpty,
      s"no such table: $namespace.$table")
    commit(namespace, table, df, carryForward = true)
  }

  /** Copy-on-write row delete — the Iceberg `DELETE FROM` COW shape
    * (the other Iceberg mode, merge-on-read delete files, trades write
    * amplification for read cost; COW is the right default for a
    * batch-maintained analytics table). FILE-granular, the real
    * Iceberg rewrite shape: one column-pruned discovery scan (the
    * predicate pushes into the parquet scan, so min/max row-group
    * stats skip clean files) finds the files that CONTAIN matches;
    * only those files' survivors rewrite into the new data dir, and
    * every untouched file carries into the new manifest verbatim. At
    * 100 TB that is the whole game: a delete touching 0.1% of files
    * pays 0.1% of the write amplification. The deleted count rides an
    * `observe()` metric on the rewrite itself (SURVEY §7's
    * double-scan directive) — no separate count job; the only other
    * job is the discovery scan, which reads predicate columns only.
    * Prior snapshots stay readable (time travel over the delete).
    * Synchronized end to end so the snapshot it rewrites is the
    * snapshot it commits over (no lost concurrent append). */
  override def deleteWhere(namespace: String, table: String,
      pred: org.apache.spark.sql.Column): Long = synchronized {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val dir = tblDir(namespace, table)
    val expanded = expandLines(dir, linesOf(dir,
      currentVersion(namespace, table)))
    val allPaths = expanded.map(_._1.getAbsolutePath)
    if (allPaths.isEmpty) return 0L
    // discovery: which files contain a matched row. filter(pred) keeps
    // exactly the pred-TRUE rows (SQL DELETE three-valued logic: NULL
    // rows are not matches), and the plain predicate — no coalesce
    // wrapper — is what stays pushable into the parquet scan. Per-
    // partition-deduped paths flow through an accumulator instead of a
    // collect_set aggregate: same driver-bounded result (≤ one entry
    // per file either way), but ONE shuffle-free job instead of an
    // exchange AQE would run as extra jobs. Accumulator at-least-once
    // semantics under task retry are harmless — the union is a set.
    val acc = spark.sparkContext
      .collectionAccumulator[String]("deleteWhere.touchedFiles")
    // explicit schema from the (registry-cached) current snapshot: both
    // maintenance reads skip parquet footer-inference jobs entirely
    val schema = load(namespace, table).schema
    spark.read.schema(schema).parquet(allPaths: _*)
      .filter(pred)
      .select(col("_metadata.file_path").as("__f"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val seen = scala.collection.mutable.HashSet.empty[String]
        it.foreach(r => seen += r.getString(0))
        seen.foreach(acc.add)
      }
    val touched = {
      import scala.jdk.CollectionConverters._
      acc.value.asScala
        // `_metadata.file_path` is a URI string; canonicalize BOTH sides
        // of the match so a symlinked root can't silently mis-partition
        .map(p => new java.io.File(new java.net.URI(p).getPath)
          .getCanonicalPath)
        .toSet
    }
    if (touched.isEmpty) return 0L // no-op deletes must not burn a snapshot
    val (touchedLines, untouched) = expanded.partition { case (f, _) =>
      touched.contains(f.getCanonicalPath)
    }
    // fail loud, never silently under-delete: every discovered file must
    // map back to exactly one manifest line
    require(touchedLines.size == touched.size,
      s"deleteWhere: ${touched.size} matched files but " +
        s"${touchedLines.size} manifest lines resolved — path mapping bug")
    // rewrite ONLY the touched files' survivors; the deleted count is
    // an observation on the same job. The survivor filter collapses
    // NULL to false once, so matched + survivors covers every row.
    val deleted = coalesce(pred, lit(false))
    val obs = new org.apache.spark.sql.Observation()
    val survivors = spark.read.schema(schema)
      .parquet(touchedLines.map(_._1.getAbsolutePath): _*)
      .observe(obs, org.apache.spark.sql.functions
        .count(org.apache.spark.sql.functions.when(deleted, lit(1)))
        .as("n_deleted"))
      .filter(not(deleted))
    commitWith(namespace, table, survivors, untouched.map(_._2))
    // rows are GONE: stored ANN artifacts summarizing them drop too
    // (compaction, by contrast, preserves rows and keeps artifacts)
    graft.pipeline.Models.dropStored(dir.getAbsolutePath)
    obs.get("n_deleted").asInstanceOf[Long]
  }

  /** Small-file compaction — the Iceberg `rewrite_data_files`
    * bin-pack analogue, THE table-maintenance operation at 100 TB
    * (streaming appends leave thousands of KB-sized files per
    * partition; scan tasks then pay per-file open/footer costs and
    * the driver pays per-file planning memory). FILE-granular and
    * MERGE-ONLY: files already at or above `targetFileBytes` carry
    * into the new manifest untouched (compaction never splits a
    * well-formed file — that is the `rewrite_data_files` contract
    * too), and only the SMALL-FILE TAIL rewrites, bin-packed into
    * ~`ceil(smallBytes / targetFileBytes)` files via `coalesce` (a
    * partition-merge NARROW dependency — no shuffle: at 100 TB a
    * compaction that shuffles every byte would double its own cost;
    * `repartition` would also break any within-file ordering a writer
    * established). Rows are unchanged; prior snapshots stay readable.
    * Returns the new file count. No-ops (returns the current count)
    * when merging the tail cannot reduce the file count — compaction
    * must never make MORE files. Synchronized like [[deleteWhere]]:
    * the snapshot it rewrites is the snapshot it commits over. */
  override def compactFiles(namespace: String, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = synchronized {
    require(targetFileBytes > 0, s"targetFileBytes must be positive")
    val dir = tblDir(namespace, table)
    val expanded = expandLines(dir, linesOf(dir,
      currentVersion(namespace, table)))
    val (large, small) = expanded.partition(_._1.length() >= targetFileBytes)
    val smallBytes = small.map(_._1.length()).sum
    val target = math.max(1, math.ceil(
      smallBytes.toDouble / targetFileBytes).toInt)
    if (small.length <= target) return expanded.length
    commitWith(namespace, table,
      spark.read.schema(load(namespace, table).schema)
        .parquet(small.map(_._1.getAbsolutePath): _*)
        .coalesce(target),
      large.map(_._2))
    filesTable(namespace, table).count().toInt
  }

  /** Snapshot expiry — the Iceberg `expire_snapshots` analogue:
    * drops every snapshot except the newest `keepLast`, then deletes
    * the data FILES no surviving manifest references (orphan cleanup —
    * a time-travel window must be bounded or COW deletes/compactions
    * retain every byte ever written). File-granular like the
    * manifests: after a file-targeted delete, the replaced file can be
    * reclaimed while its write dir's surviving siblings stay put; a
    * data dir is removed wholesale only once ALL its files are
    * orphans. Top-level files of the legacy flat layout are never
    * deleted — that layout predates the catalog and the table dir
    * itself must survive. Returns the expired snapshot ids. */
  override def expireSnapshots(namespace: String, table: String,
      keepLast: Int = 1): Seq[Long] = synchronized {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val dir = tblDir(namespace, table)
    val all = snapshots(namespace, table)
    val (expired, kept) = all.splitAt(math.max(0, all.size - keepLast))
    if (expired.isEmpty) return Seq.empty
    def filesOf(v: Long): Set[java.io.File] =
      expandLines(dir, linesOf(dir, v)).map(_._1).toSet
    val keptFiles = kept.flatMap(filesOf).toSet
    // orphan detection must expand EXPIRED manifests before their
    // manifest files are deleted below (linesOf on a deleted manifest
    // would fall back to the `.` legacy form)
    val orphans = (expired.flatMap(filesOf).toSet -- keptFiles)
      .filter(_.getParentFile != dir) // never touch flat-layout files
    expired.foreach { v =>
      new java.io.File(dir, s"v$v.manifest").delete()
      registry.remove((namespace, table, v)).foreach(_.unpersist(false))
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    orphans.groupBy(_.getParentFile).foreach { case (parent, fs) =>
      if (parquetFilesIn(parent).toSet.subsetOf(fs)) rm(parent)
      else fs.foreach { f =>
        f.delete()
        // the hadoop local FS writes a sibling checksum per part file;
        // reclaim it too or the dir never empties
        new java.io.File(parent, s".${f.getName}.crc").delete()
      }
    }
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
    graft.pipeline.Models.dropStored(nsDir(namespace).getAbsolutePath)
  }
}
