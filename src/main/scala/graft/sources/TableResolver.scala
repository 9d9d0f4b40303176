package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog abstraction (SURVEY §7 environment note): the serving layer
  * resolves `namespace.table` through this trait so the storage backend is
  * swappable. In production the implementation is one line per method over
  * an Iceberg catalog (`spark.table("lakehouse.ns.tbl")`,
  * `df.writeTo(...).append()`, `SHOW NAMESPACES` — the reference's own
  * Spark wiring, sedona-defaults.conf:5-21); `iceberg-spark-runtime` is not
  * in this offline image, so tests run on [[ParquetCatalog]], which gives
  * the same surface over a directory tree of parquet tables.
  *
  * Covers S3 (discovery), S6/S9 (create/append), S11 (namespace DDL).
  */
trait TableResolver {
  def load(namespace: String, table: String): DataFrame
  def listNamespaces(): Seq[String]
  def listTables(namespace: String): Seq[String]
  def createOrReplace(namespace: String, table: String, df: DataFrame): Unit
  def append(namespace: String, table: String, df: DataFrame): Unit
  def dropNamespace(namespace: String): Unit
}

/** Directory-backed implementation: `root/<namespace>/<table>` parquet
  * dirs. Nested namespaces use '.'-separated path segments (the Iceberg
  * REST 0x1F separator maps to '/' here). */
final class ParquetCatalog(spark: SparkSession, root: String) extends TableResolver {
  private def nsDir(ns: String) = new java.io.File(root, ns.replace('.', '/'))
  private def tblDir(ns: String, t: String) = new java.io.File(nsDir(ns), t)

  override def load(namespace: String, table: String): DataFrame = {
    val dir = tblDir(namespace, table)
    require(dir.exists(), s"no such table: $namespace.$table")
    spark.read.parquet(dir.getPath)
  }

  override def listNamespaces(): Seq[String] = {
    def walk(dir: java.io.File, prefix: String): Seq[String] = {
      val subs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory)
      subs.flatMap { d =>
        val name = if (prefix.isEmpty) d.getName else s"$prefix.${d.getName}"
        // a namespace is a dir whose children include table dirs (parquet)
        val isTableDir = Option(d.listFiles()).exists(_.exists(f =>
          f.isFile && f.getName.endsWith(".parquet")))
        if (isTableDir) Seq.empty else name +: walk(d, name)
      }.toSeq
    }
    walk(new java.io.File(root), "").sorted
  }

  override def listTables(namespace: String): Seq[String] =
    Option(nsDir(namespace).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        Option(d.listFiles()).exists(_.exists(f => f.getName.endsWith(".parquet"))))
      .map(_.getName).sorted.toSeq

  override def createOrReplace(namespace: String, table: String, df: DataFrame): Unit = {
    nsDir(namespace).mkdirs()
    df.write.mode(SaveMode.Overwrite).parquet(tblDir(namespace, table).getPath)
  }

  override def append(namespace: String, table: String, df: DataFrame): Unit = {
    require(tblDir(namespace, table).exists(), s"no such table: $namespace.$table")
    df.write.mode(SaveMode.Append).parquet(tblDir(namespace, table).getPath)
  }

  override def dropNamespace(namespace: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(nsDir(namespace))
  }
}
