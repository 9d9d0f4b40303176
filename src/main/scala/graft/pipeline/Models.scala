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
