package graft

import graft.pipeline.{Models, Pq, Similarity, Sq}
import org.apache.spark.sql.functions._

/** Fitted-model lifecycle (round-15 verdict #1): plan-keyed training
  * memoization, bit-exact persist/load, and the IVF empty-cluster
  * determinism contract (round-15 verdict #8). */
class ModelsSpec extends SparkFunSuite {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf("sf0.001"))

  test("training is memoized per (plan, params): same call returns the " +
      "same instance; changed params or plan miss") {
    Models.invalidate()
    val a = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val sizeAfterFirst = Models.cacheSize
    // a SEPARATE read of the same table must hit (semantically-equal
    // plans hash identically — the Dedup.distinctRatio guarantee)
    val b = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    assert(a eq b, "second identical call must return the memoized array")
    assert(Models.cacheSize === sizeAfterFirst)
    // different nlist -> different key -> fresh training
    val c = Similarity.ivfCentroids(emb, "vec_id", "embedding", 4)
    assert(!(c eq a) && Models.cacheSize === sizeAfterFirst + 1)
    // different plan (filtered corpus) -> fresh training
    val d = Similarity.ivfCentroids(emb.filter(col("vec_id") < 50),
      "vec_id", "embedding", 8)
    assert(!(d eq a) && Models.cacheSize === sizeAfterFirst + 2)
    // Sq and Pq share the same memo
    val s1 = Sq.train(emb, "embedding", 64)
    val s2 = Sq.train(emb, "embedding", 64)
    assert(s1 eq s2)
    val p1 = Pq.train(emb, "vec_id", "embedding", 64)
    val p2 = Pq.train(emb, "vec_id", "embedding", 64)
    assert(p1 eq p2)
    // invalidation drops everything
    Models.invalidate()
    assert(Models.cacheSize === 0)
  }

  test("persist/load round-trips every artifact bit-for-bit") {
    val ivf = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val sq = Sq.train(emb, "embedding", 64)
    val pq = Pq.train(emb, "vec_id", "embedding", 64)
    val dir = java.nio.file.Files.createTempDirectory("models_spec")
    try {
      Models.saveIvf(spark, s"$dir/ivf", ivf)
      Models.saveSq(spark, s"$dir/sq", sq)
      Models.savePq(spark, s"$dir/pq", pq)
      val ivf2 = Models.loadIvf(spark, s"$dir/ivf")
      assert(ivf2.length === ivf.length)
      ivf.zip(ivf2).foreach { case (a, b) =>
        assert(a.map(java.lang.Float.floatToRawIntBits).toSeq ===
          b.map(java.lang.Float.floatToRawIntBits).toSeq)
      }
      val sq2 = Models.loadSq(spark, s"$dir/sq")
      assert(sq2.dim === sq.dim)
      assert(sq.mins.map(java.lang.Double.doubleToRawLongBits).toSeq ===
        sq2.mins.map(java.lang.Double.doubleToRawLongBits).toSeq)
      assert(sq.steps.map(java.lang.Double.doubleToRawLongBits).toSeq ===
        sq2.steps.map(java.lang.Double.doubleToRawLongBits).toSeq)
      val pq2 = Models.loadPq(spark, s"$dir/pq")
      assert((pq2.dim, pq2.m, pq2.k) === ((pq.dim, pq.m, pq.k)))
      for (i <- 0 until pq.m; j <- 0 until pq.k)
        assert(pq.books(i)(j).map(java.lang.Float.floatToRawIntBits).toSeq ===
          pq2.books(i)(j).map(java.lang.Float.floatToRawIntBits).toSeq)
      // loaded models SERVE identically: same top-k as the trained one
      val qs = emb.filter(col("vec_id") < 3)
      val got = Sq.sqTopKWith(sq2, qs, emb, "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      val want = Sq.sqTopKWith(sq, qs, emb, "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      assert(got === want)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir.toFile)
    }
  }

  test("IVF empty cluster keeps its seed centroid unchanged") {
    // two identical seed vectors: every point's argmax tie breaks to
    // the FIRST max (array_position), so cluster 1 receives nothing in
    // the Lloyd round and must retain its seed bit-for-bit. (One
    // iteration only: after cluster 0's centroid moves to the mean,
    // the STALE seed would win round 2's argmax and capture every
    // point — the oscillation is classic k-means, not a gap.)
    Models.invalidate()
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)), // seed 0
      (1L, Array(1.0f, 0.0f)), // seed 1 — identical, never wins a tie
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.2f)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding",
      nlist = 2, iters = 1)
    assert(cents(1).map(java.lang.Float.floatToRawIntBits).toSeq ===
      Array(1.0f, 0.0f).map(java.lang.Float.floatToRawIntBits).toSeq,
      "empty cluster must keep its stale seed centroid")
    // cluster 0 DID update (mean of all four vectors' dims)
    assert(cents(0).toSeq !== Seq(1.0f, 0.0f))
  }
}
