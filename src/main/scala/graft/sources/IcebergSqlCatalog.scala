package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The production [[TableResolver]]: an Iceberg catalog driven entirely
  * through Spark's public SQL surface and the `DataFrameWriterV2` API —
  * no Iceberg classes are referenced, so this compiles (and is
  * unit-testable at the SQL-text level) without `iceberg-spark-runtime`
  * on the classpath; at runtime it requires a session configured with an
  * Iceberg catalog (the reference's own wiring, sedona-defaults.conf:5-21).
  *
  * Statement shapes (all public Spark/Iceberg SQL):
  *  - load:       `spark.table("cat.ns.tbl")`
  *  - loadAt:     `SELECT * FROM cat.ns.tbl VERSION AS OF <snapshot>`
  *  - snapshots:  `SELECT snapshot_id FROM cat.ns.tbl.snapshots ORDER BY committed_at`
  *  - create:     `df.writeTo("cat.ns.tbl").createOrReplace()`
  *  - append:     `df.writeTo("cat.ns.tbl").append()`
  *  - namespaces: `SHOW NAMESPACES IN cat`
  *  - drop:       `DROP NAMESPACE cat.ns CASCADE`
  *
  * Identifiers are validated against the same `[A-Za-z_][A-Za-z0-9_]*`
  * per-segment rule the serving layer enforces (api/main.py:28-29), so
  * interpolation into SQL text is injection-safe by construction.
  */
final class IcebergSqlCatalog(spark: SparkSession, catalog: String)
    extends TableResolver {
  import IcebergSqlCatalog._

  require(validIdent(catalog), s"invalid catalog name: $catalog")

  override def load(namespace: String, table: String): DataFrame =
    spark.table(fqn(catalog, namespace, table))

  override def loadAt(namespace: String, table: String, version: Long): DataFrame =
    spark.sql(loadAtSql(catalog, namespace, table, version))

  override def snapshots(namespace: String, table: String): Seq[Long] =
    spark.sql(snapshotsSql(catalog, namespace, table))
      .collect().map(_.getLong(0)).toSeq

  /** Iceberg metadata tables, verbatim (S10). */
  def snapshotsTable(namespace: String, table: String): DataFrame =
    spark.table(fqn(catalog, namespace, table) + ".snapshots")
  def filesTable(namespace: String, table: String): DataFrame =
    spark.table(fqn(catalog, namespace, table) + ".files")

  override def listNamespaces(): Seq[String] =
    spark.sql(s"SHOW NAMESPACES IN $catalog")
      .collect().map(_.getString(0)).sorted.toSeq

  override def listTables(namespace: String): Seq[String] =
    spark.sql(s"SHOW TABLES IN ${nsFqn(catalog, namespace)}")
      .collect().map(_.getAs[String]("tableName")).sorted.toSeq

  override def createOrReplace(namespace: String, table: String, df: DataFrame): Unit =
    df.writeTo(fqn(catalog, namespace, table)).createOrReplace()

  override def append(namespace: String, table: String, df: DataFrame): Unit =
    df.writeTo(fqn(catalog, namespace, table)).append()

  override def dropNamespace(namespace: String): Unit = {
    spark.sql(s"DROP NAMESPACE IF EXISTS ${nsFqn(catalog, namespace)} CASCADE")
    ()
  }
}

/** [[TableMaintenance]] over the same public SQL surface — the
  * statement shapes real Iceberg executes natively (COW/MOR delete,
  * `rewrite_data_files` bin-pack, `expire_snapshots`), so the HTTP
  * maintenance routes serve unchanged against a production catalog.
  * Split from [[IcebergSqlCatalog]] so a read-only binding (no write
  * credentials) can instantiate the resolver alone and the routes
  * answer 501, exactly the [[ParquetCatalog]] contract. */
final class IcebergSqlMaintenance(spark: SparkSession, catalog: String)
    extends TableMaintenance {
  import IcebergSqlCatalog._

  require(validIdent(catalog), s"invalid catalog name: $catalog")

  /** `DELETE FROM` — Iceberg splices untouched files at the manifest
    * level natively; the predicate arrives pre-sanitized (the HTTP
    * route runs WhereSanitizer before building the Column). The
    * deleted-row count is read from the DELETE commit's OWN snapshot
    * summary via [[IcebergSqlCatalog.deleteCountSql]] — O(metadata),
    * attributed by operation + commit order rather than "latest", and
    * netted against COW survivor rewrites (see that builder's doc for
    * the exact arithmetic and the residual ambiguity when another
    * DELETE races in the same window). */
  override def deleteWhere(namespace: String, table: String,
      pred: org.apache.spark.sql.Column): Long = {
    val t = fqn(catalog, namespace, table)
    spark.table(t).filter(pred).limit(1) // resolve pred against the schema
    val prevLatest = latestSnapshotId(t)
    spark.sql(s"DELETE FROM $t WHERE " +
      org.apache.spark.sql.graftbridge.expression(pred).sql)
    spark.sql(deleteCountSql(s"$t.snapshots", prevLatest))
      .collect().headOption match {
        // a DELETE matching nothing commits no new snapshot -> no row
        case Some(r) if !r.isNullAt(1) => math.max(0L, r.getLong(1))
        case _ => 0L
      }
  }

  private def latestSnapshotId(t: String): Option[Long] =
    spark.sql(s"SELECT snapshot_id FROM $t.snapshots " +
        "ORDER BY committed_at DESC LIMIT 1")
      .collect().headOption.map(_.getLong(0))

  override def compactFiles(namespace: String, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    spark.sql(IcebergSqlCatalog.compactSql(catalog, namespace, table,
      targetFileBytes))
    spark.table(fqn(catalog, namespace, table) + ".files").count().toInt
  }

  /** Expire every snapshot but the newest `keepLast`, NOW — matching
    * the [[ParquetCatalog]] contract, which reclaims immediately.
    * `older_than` is passed explicitly (one hour ahead, session time
    * zone): without it the procedure applies Iceberg's 5-day default
    * retention and silently expires nothing on a recently-written
    * table; `retain_last` still protects the newest `keepLast`. The
    * returned ids are derived from the actual before/after `.snapshots`
    * state, not precomputed, so the method reports what the procedure
    * really expired. */
  override def expireSnapshots(namespace: String, table: String,
      keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    def ids: Seq[Long] = spark
      .sql(IcebergSqlCatalog.snapshotsSql(catalog, namespace, table))
      .collect().map(_.getLong(0)).toSeq
    val before = ids
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val olderThan = java.time.ZonedDateTime.now(zone).plusHours(1)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    spark.sql(IcebergSqlCatalog.expireSql(catalog, namespace, table,
      keepLast, olderThan))
    val after = ids.toSet
    before.filterNot(after)
  }
}

object IcebergSqlCatalog {
  private val IdentRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  def validIdent(s: String): Boolean =
    s.nonEmpty && s.split("\\.").forall(p => IdentRe.findFirstIn(p).isDefined)

  /** `cat.ns.tbl` with every segment validated (injection-safe). */
  def fqn(catalog: String, namespace: String, table: String): String = {
    require(validIdent(namespace), s"invalid namespace: $namespace")
    require(validIdent(table) && !table.contains("."), s"invalid table: $table")
    s"$catalog.$namespace.$table"
  }

  def nsFqn(catalog: String, namespace: String): String = {
    require(validIdent(namespace), s"invalid namespace: $namespace")
    s"$catalog.$namespace"
  }

  def loadAtSql(catalog: String, ns: String, table: String, version: Long): String =
    s"SELECT * FROM ${fqn(catalog, ns, table)} VERSION AS OF $version"

  def snapshotsSql(catalog: String, ns: String, table: String): String =
    s"SELECT snapshot_id FROM ${fqn(catalog, ns, table)}.snapshots " +
      "ORDER BY committed_at"

  /** Iceberg `rewrite_data_files` bin-pack (the stored-procedure form;
    * identifiers validated by [[fqn]] before interpolation). */
  def compactSql(catalog: String, ns: String, table: String,
      targetFileBytes: Long): String = {
    fqn(catalog, ns, table) // validation side effect
    s"CALL $catalog.system.rewrite_data_files(table => '$ns.$table', " +
      s"options => map('target-file-size-bytes', '$targetFileBytes'))"
  }

  private val TsLiteralRe =
    "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3}$".r

  /** Iceberg `expire_snapshots` bounded to the newest `retainLast`,
    * with an explicit `older_than` cutoff (a `yyyy-MM-dd HH:mm:ss.SSS`
    * literal, validated before interpolation). */
  def expireSql(catalog: String, ns: String, table: String,
      retainLast: Int, olderThan: String): String = {
    fqn(catalog, ns, table)
    require(TsLiteralRe.findFirstIn(olderThan).isDefined,
      s"invalid timestamp literal: $olderThan")
    s"CALL $catalog.system.expire_snapshots(table => '$ns.$table', " +
      s"older_than => TIMESTAMP '$olderThan', retain_last => $retainLast)"
  }

  /** Count-attribution query for [[IcebergSqlMaintenance.deleteWhere]]:
    * picks the DELETE's OWN commit — the EARLIEST `delete`/`overwrite`
    * snapshot committed strictly after `prevLatest` (not the newest
    * snapshot overall, which a concurrent writer landing between the
    * DELETE and this read would own: an append there carries no
    * `deleted-records` and used to misreport 0, and a racing delete's
    * summary would be misattributed). With no racer this is exactly the
    * snapshot whose `parent_id` is `prevLatest`; parent-matching alone
    * is NOT used because Iceberg's optimistic retry rebases a conflicted
    * DELETE onto the racer's snapshot, changing its parent. Residual
    * ambiguity: two DELETEs racing in the same window can still swap
    * attribution — Spark's SQL surface does not return the commit's
    * snapshot id, so that is the attribution limit of this API.
    *
    * The returned `net_deleted` nets the summary fields so copy-on-write
    * does not overcount: a partial-file COW DELETE (operation
    * `overwrite`) removes whole files and rewrites the survivors, so
    * `deleted-records` (rows in REMOVED files) minus `added-records`
    * (rewritten survivors) is the true row delta; a file-aligned DELETE
    * (operation `delete`) has `added-records` 0; a merge-on-read DELETE
    * leaves data files in place and commits the deleted rows as
    * `added-position-deletes` instead.
    *
    * `target` is the `.snapshots` metadata identifier in production and
    * a temp view with the same shape in tests, so the identical text is
    * EXECUTED against simulated commit interleavings (CatalogSpec), not
    * just parsed. Segments are validated before interpolation. */
  def deleteCountSql(target: String, prevLatest: Option[Long]): String = {
    require(validIdent(target), s"invalid snapshots target: $target")
    val after = prevLatest.fold("")(id =>
      s" AND committed_at > (SELECT committed_at FROM $target " +
        s"WHERE snapshot_id = ${id}L)")
    "SELECT snapshot_id, " +
      "coalesce(CAST(summary['deleted-records'] AS BIGINT), 0L) - " +
      "coalesce(CAST(summary['added-records'] AS BIGINT), 0L) + " +
      "coalesce(CAST(summary['added-position-deletes'] AS BIGINT), 0L) " +
      s"AS net_deleted FROM $target " +
      s"WHERE operation IN ('delete', 'overwrite')$after " +
      "ORDER BY committed_at, snapshot_id LIMIT 1"
  }
}
