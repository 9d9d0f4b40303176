package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fitted-model lifecycle for the ANN family — train-once/serve-many
  * (round-15 verdict #1). Two halves:
  *
  *  1. **Plan-keyed memoization** of training passes inside one JVM:
  *     [[Similarity.ivfCentroids]], [[Pq.train]], and [[Sq.train]]
  *     consult a bounded in-process cache keyed by the SAME
  *     SHA-256(canonicalized plan, leaf paths, semanticHash, params)
  *     digest [[Dedup.distinctRatio]] uses — semantically-equal scans
  *     of the same snapshot hit, a new snapshot (new path → new plan)
  *     misses naturally. Before this, emb_ivf / emb_ivfsq(+_sound) /
  *     emb_ivfpq(+_sound) each re-ran identical Lloyd iterations over
  *     the same corpus in one suite run (2 eager jobs per iteration),
  *     and a serving session paid the same per query.
  *
  *  2. **Persist/load** of fitted models as small parquet tables —
  *     the production shape where training is a scheduled job and
  *     serving sessions load the artifact. Floats/doubles round-trip
  *     parquet bit-for-bit (fixed-width IEEE storage, no text path),
  *     which the `emb_model_reuse` gate asserts via raw-bit compare.
  *
  * Invalidation follows [[Dedup.invalidateStats]]'s contract exactly:
  * only a same-path in-place overwrite can go stale (the key
  * canonicalizes root paths), and the serving layer's write paths call
  * [[invalidate]] alongside `invalidateStats()`.
  */
object Models {

  // Bounded model cache. Values are small driver-held arrays (an IVF
  // codebook is nlist·dim floats ≈ 4 KB at gate scale; PQ m·k·subDim);
  // 256 entries is generous for any serving mix while bounding memory.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private[graft] def cacheSize: Int = cache.size()

  /** Drop every memoized fitted model. Needed ONLY on same-path
    * in-place overwrites (see [[Dedup.invalidateStats]]); snapshot /
    * partition-append workflows miss the cache naturally. */
  def invalidate(): Unit = cache.clear()

  /** SHA-256 over (canonicalized plan string, leaf data-source paths,
    * 32-bit semanticHash, extra) — the [[Dedup]] ratio-cache key shape
    * shared verbatim so both caches collide (or not) identically: the
    * bare semanticHash birthday-collides at ~2^16 plans, and the plan
    * STRING alone prints schema+format but never the path, so two
    * same-schema tables would deterministically collide without the
    * explicit leaf `HadoopFsRelation` root paths. */
  private[graft] def planKey(df: DataFrame, extra: String): String = {
    val plan = df.queryExecution.analyzed
    val leafPaths = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }.mkString(";")
    val material = Seq(plan.canonicalized.toString, leafPaths,
      plan.semanticHash().toString, extra).mkString("\n--\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(material.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.util.Base64.getEncoder.encodeToString(digest)
  }

  /** Memoize `train` under (plan of `df`, `extra`). Training runs at
    * most once per key per JVM (modulo a benign race: two concurrent
    * first calls may both train — identical deterministic results, the
    * second put wins; never a wrong value). */
  private[pipeline] def memo[T <: AnyRef](df: DataFrame, extra: String)(
      train: => T): T = {
    val key = planKey(df, extra)
    val hit = cache.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val v = train
    if (cache.size >= 256) cache.clear() // bounded; entries are tiny
    cache.put(key, v)
    v
  }

  // ---- artifact store: train-once ACROSS snapshots (r16 verdict #5) --
  // The plan-keyed memo deliberately misses after an append (new data
  // dir → new leaf paths → new key): that is correct for STATISTICS,
  // but retraining an ANN codebook on every appended batch is not how
  // production serves — coarse quantizers are scheduled jobs, and
  // serving ASSIGNS new rows against the fitted model until the next
  // retrain. With a store enabled, trainers consult it under a STABLE
  // key (snapshot data-dir segments stripped from the leaf paths, so
  // the key names the logical table + the query shape + params, not
  // the snapshot) and load the persisted artifact instead of
  // retraining.
  //
  // Staleness contract: an APPEND serves the stored model unchanged
  // (new rows are assigned, never retrained-for — bounded recall drift
  // until the next scheduled retrain, the Milvus/FAISS-segment
  // production shape); a REPLACE or a row DELETE drops the table's
  // stored artifacts ([[dropStored]], wired in the catalog's write
  // paths) because the corpus the model summarizes is gone; COMPACTION
  // preserves rows bit-for-bit and keeps artifacts valid. Retraining
  // is explicit: delete the artifact (or call [[dropStored]]) and the
  // next query trains + persists fresh.
  @volatile private var storeRoot: Option[String] = scala.None

  /** Enable (Some(dir)) / disable (None) the artifact store. */
  def setStore(path: Option[String]): Unit = { storeRoot = path }
  def storeEnabled: Boolean = storeRoot.isDefined

  /** Stable artifact key: canonicalized plan STRING (filters and
    * projections print; leaf relations print schema-only, never paths)
    * + leaf root paths with the per-snapshot segments stripped — a
    * `part-*.parquet` file name, then a `d<N>` write-dir name — so
    * every snapshot of one catalog table folds to the same key. The
    * plain parquet-directory case (no `d<N>` segment) passes through
    * unchanged. semanticHash is deliberately EXCLUDED: it hashes the
    * relation objects and would re-split the key per snapshot. */
  private[graft] def stableKey(df: DataFrame,
      extra: String): (String, Seq[String]) = {
    val plan = df.queryExecution.analyzed
    val roots = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map { p =>
              var segs = p.toUri.getPath.split('/').toSeq
              if (segs.nonEmpty && segs.last.startsWith("part-") &&
                segs.last.endsWith(".parquet")) segs = segs.dropRight(1)
              if (segs.nonEmpty && segs.last.matches("d\\d+"))
                segs = segs.dropRight(1)
              segs.mkString("/")
            }.toSeq
          case other => Seq(other.toString)
        }
    }.flatten.distinct.sorted
    val material = Seq(plan.canonicalized.toString,
      roots.mkString(";"), extra).mkString("\n--\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(material.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(digest),
      roots)
  }

  /** Drop every stored artifact whose table root starts with `prefix`
    * (canonical path of a table or namespace dir). Called by the
    * catalog's replace/delete/drop paths — see the staleness contract
    * above. */
  def dropStored(prefix: String): Unit = storeRoot.foreach { root =>
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).foreach { d =>
        val meta = new java.io.File(d, "_roots.txt")
        val hit = meta.exists() &&
          java.nio.file.Files.readAllLines(meta.toPath)
            .toArray(Array.empty[String])
            .exists(r => r == prefix || r.startsWith(prefix + "/"))
        if (hit) rm(d)
      }
  }

  /** [[memo]] with the artifact store behind it: JVM memo → stored
    * artifact (loaded, then memoized) → train + persist + memoize. */
  private[pipeline] def memoStored[T <: AnyRef](df: DataFrame,
      extra: String,
      save: (SparkSession, String, T) => Unit,
      load: (SparkSession, String) => T)(train: => T): T = {
    val root = storeRoot.getOrElse { return memo(df, extra)(train) }
    val pk = planKey(df, extra)
    val hit = cache.get(pk)
    if (hit != null) return hit.asInstanceOf[T]
    val (sk, roots) = stableKey(df, extra)
    val dir = new java.io.File(root, sk)
    val model = new java.io.File(dir, "model")
    val spark = df.sparkSession
    val v =
      if (new java.io.File(model, "_SUCCESS").exists())
        load(spark, model.getPath)
      else {
        val trained = train
        save(spark, model.getPath, trained)
        java.nio.file.Files.writeString(
          new java.io.File(dir, "_roots.txt").toPath,
          roots.mkString("", "\n", "\n"))
        trained
      }
    if (cache.size >= 256) cache.clear()
    cache.put(pk, v)
    v
  }

  // ---- persist/load: models as small parquet tables ----------------
  // Each save writes a single-partition parquet table (the artifact is
  // KB-scale by construction); each load sorts by the key columns so
  // reader parallelism cannot reorder entries.

  /** IVF codebook → rows `(cluster int, centroid array<float>)`. */
  def saveIvf(spark: SparkSession, path: String,
      centroids: Array[Array[Float]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadIvf(spark: SparkSession, path: String): Array[Array[Float]] = {
    val rows = spark.read.parquet(path)
      .orderBy(col("cluster")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i, s"IVF artifact at $path has a gap at $i")
    }
    rows.map(_.getSeq[Float](1).toArray)
  }

  /** SQ model → rows `(pos int, min_d double, step_d double)`. */
  def saveSq(spark: SparkSession, path: String, model: Sq.Model): Unit = {
    import spark.implicits._
    (0 until model.dim).map(p => (p, model.mins(p), model.steps(p)))
      .toDF("pos", "min_d", "step_d")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadSq(spark: SparkSession, path: String): Sq.Model = {
    val rows = spark.read.parquet(path).orderBy(col("pos")).collect()
    val dim = rows.length
    val mins = new Array[Double](dim)
    val steps = new Array[Double](dim)
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i, s"SQ artifact at $path has a gap at $i")
      mins(i) = r.getDouble(1)
      steps(i) = r.getDouble(2)
    }
    Sq.Model(dim, mins, steps)
  }

  /** PQ codebooks → rows `(subspace int, code int, centroid
    * array<float>)`; (dim, m, k) reconstruct from the table shape. */
  def savePq(spark: SparkSession, path: String, model: Pq.Model): Unit = {
    import spark.implicits._
    (for {
      s <- 0 until model.m
      c <- 0 until model.k
    } yield (s, c, model.books(s)(c).toSeq))
      .toDF("subspace", "code", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadPq(spark: SparkSession, path: String): Pq.Model = {
    val rows = spark.read.parquet(path)
      .orderBy(col("subspace"), col("code")).collect()
    require(rows.nonEmpty, s"empty PQ artifact at $path")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * k,
      s"PQ artifact at $path is ragged: ${rows.length} rows for m=$m k=$k")
    val subDim = rows.head.getSeq[Float](2).length
    val books = Array.ofDim[Array[Float]](m, k)
    rows.foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray
    }
    Pq.Model(m * subDim, m, k, books)
  }
}
