package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Bloom filters for INCREMENTAL dedup — "is this document
  * already in the 100 TB corpus?" without shuffling the corpus.
  *
  * The standard construction (Bloom 1970) with Kirsch–Mitzenmacher
  * double hashing (2006): k probe bits derived as `h1 + i·h2 mod m`
  * from two independent 64-bit hashes, which preserves the asymptotic
  * false-positive rate of k independent hashes. Spark's own
  * `DataFrameStatFunctions.bloomFilter` builds a comparable sketch but
  * returns a driver-side object with no expression-level probe; here
  * both halves are plan-native: the BUILD is a `TypedImperativeAggregate`
  * (byte-array buffer, map-side partials, merge = bitwise OR — each task
  * folds its partition locally and only `m/8`-byte partials cross the
  * shuffle) and the PROBE is a codegen'd scalar expression, so a probe
  * scan stays inside whole-stage codegen.
  *
  * SHARDING is the scale story: one monolithic filter for 10^10 keys at
  * 1% fpp is ~12 GB — un-broadcastable. `buildSharded` routes each key
  * by `floorMod(h1, shards)` to one of `shards` independent filters, so
  * filter size is chosen PER SHARD and the collection of (shard, bits)
  * rows is an ordinary DataFrame: broadcast it when small, equi-join it
  * on the shard key when not. Probing joins each probe row to exactly
  * its shard's row — a broadcast hash join at any realistic shard count.
  *
  * False positives are the SAFE direction for dedup (a duplicate is
  * never missed; a new document is occasionally re-checked), and
  * [[Bloom.newRows]] removes even those: bloom-pruned candidates are
  * re-confirmed against the corpus with a broadcast semi-join, making
  * the final answer EXACT while the corpus is only ever scanned — never
  * shuffled, never joined row-to-row against the full batch.
  */
object BloomKernel {

  /** m = ceil(-n·ln(p) / ln(2)²) rounded up to a byte multiple — the
    * optimal bit count for `n` keys at false-positive rate `p`. Bounded
    * by [[BloomAgg]]'s own 128 MiB per-shard cap so an oversized `n`
    * fails HERE with actionable guidance, not later with a misleading
    * byte-multiple error (review finding: the old Int.MaxValue check
    * also let m round up past 2^31 and wrap negative). */
  def optimalBits(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0 && fpp < 1, "need n > 0 and fpp in (0, 1)")
    val m = (math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
      .toLong + 7) / 8 * 8
    require(m <= (1L << 30), s"filter of $m bits exceeds the 128 MiB " +
      "per-shard cap: shard more")
    m.toInt
  }

  /** k = max(1, round(m/n · ln 2)) — the fpp-minimizing probe count. */
  def optimalHashes(m: Long, n: Long): Int =
    math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)

  def set(bits: Array[Byte], h1: Long, h2: Long, k: Int): Unit = {
    val m = bits.length.toLong * 8
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, m)
      bits((idx >>> 3).toInt) = (bits((idx >>> 3).toInt) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  def contains(bits: Array[Byte], h1: Long, h2: Long, k: Int): Boolean = {
    val m = bits.length.toLong * 8
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, m)
      if ((bits((idx >>> 3).toInt) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Aggregate a (h1, h2) hash-pair stream into one Bloom filter of
  * `numBits` bits with `k` probes per key. NULL hashes are skipped (a
  * NULL key is never "seen"). Partials are `numBits/8`-byte arrays;
  * merge is bitwise OR, so the aggregate is commutative, associative,
  * and idempotent per key — safe under speculative re-execution. */
case class BloomAgg(h1: Expression, h2: Expression, numBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(numBits > 0 && numBits % 8 == 0, "numBits must be a positive byte multiple")
  require(numBits <= (1 << 30), "shard filters above 128 MiB: shard more")
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val a = h1.eval(input); val b = h2.eval(input)
    if (a != null && b != null)
      BloomKernel.set(buf, a.asInstanceOf[Long], b.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomAgg = copy(h1 = c(0), h2 = c(1))
}

/** Membership probe: true iff all k bits for (h1, h2) are set in
  * `bits`. Codegen'd — a probe scan stays in whole-stage codegen. */
case class BloomContains(first: Expression, second: Expression,
    third: Expression, k: Int) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_contains expects (binary, bigint, bigint)")
    }
  override def nullSafeEval(bits: Any, h1: Any, h2: Any): Any =
    BloomKernel.contains(bits.asInstanceOf[Array[Byte]],
      h1.asInstanceOf[Long], h2.asInstanceOf[Long], k)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (b, a1, a2) =>
      s"graft.pipeline.BloomKernel.contains($b, $a1, $a2, $k)")
  override def prettyName: String = "bloom_contains"
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): BloomContains =
    copy(first = f, second = s, third = t)
}

object Bloom {
  import org.apache.spark.sql.graftbridge

  private def expr(c: Column): Expression = graftbridge.expression(c)
  private def column(e: Expression): Column = graftbridge.column(e)

  /** The two independent 64-bit key hashes the KM construction needs:
    * xxhash64 of the key alone, and of the key salted with a fixed
    * literal — different functions of the key for every practical
    * purpose, both codegen'd built-ins. */
  def keyHashes(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(lit("graft-bloom-h2"), key))

  /** Shard router — a THIRD salted hash, independent of both probe
    * hashes (review finding: routing by `pmod(h1, shards)` conditions
    * h1's low bits within a shard, which collapses every key's i=0
    * probe into a 1/gcd(shards, m) slice of the filter and inflates the
    * realized fpp well past the sizing). */
  private def shardOf(key: Column, shards: Int): Column =
    pmod(xxhash64(lit("graft-bloom-shard"), key), lit(shards.toLong))
      .cast("int")

  /** Build `shards` independent filters over `df`'s keys, routed by
    * `floorMod(h1, shards)`: returns one (`__shard` int, `__bits`
    * binary) row per non-empty shard. Size `bitsPerShard` for the
    * EXPECTED KEYS PER SHARD (n/shards), not the total. */
  def buildSharded(df: DataFrame, key: Column, shards: Int,
      bitsPerShard: Int, k: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val (h1, h2) = keyHashes(key)
    // hashing + partial bloom_agg are scan-side CPU: unlock cores when
    // the corpus sits in one row group (no-op on any multi-split table)
    Decontaminate.spreadSmall(df, key)
      .select(shardOf(key, shards).as("__shard"),
        h1.as("__h1"), h2.as("__h2"))
      .groupBy(col("__shard"))
      .agg(column(BloomAgg(expr(col("__h1")), expr(col("__h2")),
        bitsPerShard, k).toAggregateExpression()).as("__bits"))
  }

  /** Add a `maybe_seen` boolean to `df`: whether `key` might be in the
    * sharded filter set (false = DEFINITELY unseen). `blooms` is
    * broadcast — at any realistic shard count it is KBs to MBs. */
  def probeSharded(df: DataFrame, key: Column, blooms: DataFrame,
      shards: Int, k: Int): DataFrame = {
    // maybe_seen is in the guard too: it is CREATED by withColumn, so a
    // pre-existing caller column would be silently replaced, not refused
    val internals = Seq("__shard", "__bits", "__h1", "__h2", "maybe_seen")
    val clash = df.columns.filter(internals.contains)
    require(clash.isEmpty,
      s"input columns collide with bloom internals: ${clash.mkString(", ")}")
    val (h1, h2) = keyHashes(key)
    df.withColumn("__h1", h1).withColumn("__h2", h2)
      .withColumn("__shard", shardOf(key, shards))
      .join(broadcast(blooms), Seq("__shard"), "left")
      .withColumn("maybe_seen",
        col("__bits").isNotNull &&
          column(BloomContains(expr(col("__bits")), expr(col("__h1")),
            expr(col("__h2")), k)))
      .drop("__shard", "__bits", "__h1", "__h2")
  }

  /** EXACT incremental dedup: the rows of `incoming` whose `key` does
    * not appear in `existing` — the "is this new crawl batch actually
    * new?" question asked against a corpus too large to join.
    *
    * Plan: build sharded filters over the corpus (one scan, tiny
    * shuffle of byte-array partials) → probe the batch scan-side →
    * rows the filter rejects are PROVABLY new (no false negatives) and
    * skip everything else → only the `maybe_seen` candidates (true
    * duplicates + ~fpp of the new rows) have their distinct keys
    * broadcast into a semi-join that re-scans the corpus to confirm.
    * Total: existing scanned twice, shuffled never; incoming scanned
    * once plus candidate-sized joins. Assumes the INCREMENTAL regime —
    * batch ≪ corpus, candidates bounded by the batch — which is what
    * makes the broadcasts legal; a batch comparable to the corpus
    * should use a plain anti-join instead (one shuffle of each side,
    * no filter pass).
    *
    * `exact = false` skips the confirm join and drops all `maybe_seen`
    * rows: ~fpp of genuinely-new rows are lost, no second corpus scan —
    * the trade production pipelines take when the corpus is cold
    * storage. */
  def newRows(existing: DataFrame, incoming: DataFrame, key: Column,
      expectedExisting: Long, fpp: Double = 0.01, shards: Int = 32,
      exact: Boolean = true): DataFrame = {
    // __bk is the confirm legs' join alias on BOTH frames — refuse a
    // collision up front instead of an opaque ambiguous-reference error
    val bk = (existing.columns ++ incoming.columns).filter(_ == "__bk")
    require(bk.isEmpty, "input columns collide with bloom internals: __bk")
    val perShard = math.max(1L, expectedExisting / shards)
    val bits = BloomKernel.optimalBits(perShard, fpp)
    val k = BloomKernel.optimalHashes(bits.toLong, perShard)
    val blooms = buildSharded(existing, key, shards, bits, k)
    // the probe feeds two consumers (definitely-new pass-through and the
    // candidate confirm) — persistTracked keeps it one scan of the batch
    val probed = Caches.persistTracked(
      probeSharded(incoming, key, blooms, shards, k))
    val definitelyNew = probed.filter(!col("maybe_seen")).drop("maybe_seen")
    if (!exact) definitelyNew
    else {
      val cands = probed.filter(col("maybe_seen")).drop("maybe_seen")
      val candKeys = cands.select(key.as("__bk")).distinct()
      val seen = existing.join(broadcast(candKeys), key === col("__bk"),
        "left_semi").select(key.as("__bk")).distinct()
      val confirmedNew = cands.join(broadcast(seen), key === col("__bk"),
        "left_anti")
      definitelyNew.unionByName(confirmedNew)
    }
  }
}
