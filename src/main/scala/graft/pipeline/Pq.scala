package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

/** Product quantization (Jégou, Douze, Schmid — "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split each dim-`d` vector
  * into `m` subspaces of d/m dims, learn a k-entry codebook per
  * subspace (k-means), and represent every vector as `m` small codes —
  * 64 dims of float (256 B) become 8 one-byte codes, a 32× memory cut
  * that is what lets a 100 TB embedding corpus keep its index in
  * executor memory. Queries score candidates by ASYMMETRIC DISTANCE
  * (ADC): one m×k lookup table of partial inner products per query,
  * then each candidate costs m table lookups + adds instead of d
  * multiplies.
  *
  * Scale shape: training is the [[Similarity.ivfCentroids]] pattern
  * per subspace but fused — ONE scan per Lloyd iteration assigns all
  * m subspaces and one exploded aggregate updates every (subspace,
  * code, dim) mean; codebooks are m·k·(d/m) floats (a few KB),
  * broadcast as literals into codegen'd expressions. Encoding and ADC
  * scoring are stateless scan-side work. [[adcTopK]] is the PQ-FLAT
  * form (every candidate scored — the small-query-set regime of the
  * gate); at corpus scale compose the same codes with the IVF
  * bucketing ([[Similarity.ivfJoin]]'s inverted file) so each query
  * scores only its probed cells — IVF-PQ, the production layout.
  *
  * Determinism: codebook init = the k lowest-id vectors' slices;
  * Lloyd means are exact float avgs with fixed iteration count;
  * nearest-code ties break to the LOWEST code index (array_position
  * returns the first maximum). Scores are Det-rounded before ranking
  * with an id tiebreak, so output cannot flip on a 1-ulp divergence.
  */
object Pq {

  /** Trained model: `books(sub)(code)` is the (d/m)-dim centroid. */
  final case class Model(dim: Int, m: Int, k: Int,
      books: Array[Array[Array[Float]]])

  /** Shared interpreted kernels: a literal-expression formulation of the
    * m×k nearest-code / lookup-table scans blows the generated method
    * past janino's limit (observed: CodeGenerator compile failures with
    * whole-plan interpreted fallback). One compact loop per row beats a
    * 128-subexpression tree in BOTH compile time and eval cost. */
  private[pipeline] def encodeRow(v: org.apache.spark.sql.catalyst.util.ArrayData,
      books: Array[Array[Array[Float]]]): Array[Int] = {
    val m = books.length
    val subDim = books(0)(0).length
    require(v.numElements() == m * subDim,
      s"pq_encode: vector has ${v.numElements()} elements, model expects " +
        s"${m * subDim} — a silent misread here would produce garbage codes")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      var best = 0; var bestScore = Long.MinValue
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        // EXACT integer-micros assignment score (round-15 verdict #5
        // discipline): per-dim `x·c − |c|²/2` terms round to micros
        // once, then exact integer sums — order-free and replayable in
        // the DuckDB oracle, so codebook assignment cannot drift with
        // summation order on a real cluster.
        var acc = 0L; var i = 0
        while (i < subDim) {
          val x = v.getFloat(s * subDim + i).toDouble
          val y = cen(i).toDouble
          acc += math.floor((x * y - 0.5 * y * y) * 1000000.0 + 0.5).toLong
          i += 1
        }
        if (acc > bestScore) { bestScore = acc; best = c } // ties -> lowest
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  private[pipeline] def tableRow(v: org.apache.spark.sql.catalyst.util.ArrayData,
      books: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val m = books.length
    val subDim = books(0)(0).length
    require(v.numElements() == m * subDim,
      s"pq_table: vector has ${v.numElements()} elements, model expects " +
        s"${m * subDim}")
    Array.tabulate(m) { s =>
      val book = books(s)
      Array.tabulate(book.length) { c =>
        val cen = book(c)
        var acc = 0.0; var i = 0
        while (i < subDim) {
          acc += v.getFloat(s * subDim + i).toDouble * cen(i).toDouble
          i += 1
        }
        acc
      }
    }
  }

  /** Inner product as a codegen'd column (shared with the certificate
    * gate's exact leg). */
  def dotCol(a: Column, b: Column): Column =
    graftbridge.column(DotProduct(graftbridge.expression(a),
      graftbridge.expression(b)))
  private def dot(a: Column, b: Column): Column = dotCol(a, b)

  private def subSlice(vec: Column, s: Int, subDim: Int): Column =
    slice(vec, s * subDim + 1, subDim)

  private def encodeCol(vec: Column, books: Array[Array[Array[Float]]])
      : Column =
    graftbridge.column(PqEncodeExpr(graftbridge.expression(vec), books))

  private def tableCol(vec: Column, books: Array[Array[Array[Float]]])
      : Column =
    graftbridge.column(PqTableExpr(graftbridge.expression(vec), books))

  /** Learn per-subspace codebooks with `iters` fused Lloyd iterations.
    * `idCol` pins deterministic initialization (k lowest-id vectors).
    * Memoized per (corpus plan, params) via [[Models.memo]] — see
    * [[Similarity.ivfCentroids]] for the contract. */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, k: Int = 16, iters: Int = 2): Model =
    Models.memoStored(df, s"pq|$idCol|$vecCol|$dim|$m|$k|$iters",
      Models.savePq, Models.loadPq) {
      trainModel(df, idCol, vecCol, dim, m, k, iters)
    }

  private def trainModel(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int): Model = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    val init = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(init.length == k, s"need at least $k vectors to train")
    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m)(s => init.map(_.slice(s * subDim, (s + 1) * subDim)))
    var it = 0
    while (it < iters) {
      // ONE scan: per row, one compact encode pass assigns all m codes,
      // then an array of (subspace, code, slice) structs exploded twice
      // into (s, c, pos, x) and averaged — a single shuffle updates
      // every codebook entry of every subspace
      val entries = (0 until m).map { s =>
        struct(lit(s).as("s"), col("__codes").getItem(s).as("c"),
          subSlice(col(vecCol), s, subDim).as("v"))
      }
      // EXACT integer-micros update (the trainIvfCentroids discipline):
      // a double `avg` is partial-merge-order-dependent; `Σ micros(x)`
      // is an exact BIGINT folded to float once on the driver —
      // order-free AND replayable in the emb_pq DuckDB oracle.
      val updated = df
        .withColumn("__codes", encodeCol(col(vecCol), books))
        .select(explode(array(entries: _*)).as("e"))
        .select(col("e.s").as("s"), col("e.c").as("c"),
          posexplode(col("e.v")).as(Seq("p", "x")))
        .groupBy(col("s"), col("c"), col("p"))
        .agg(sum(floor(col("x").cast("double") * 1000000.0 + 0.5)
            .cast("long")).as("sm"),
          count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      updated.foreach { r =>
        next(r.getAs[Int]("s"))(r.getAs[Int]("c"))(r.getAs[Int]("p")) =
          (r.getAs[Long]("sm").toDouble / 1000000.0 /
            r.getAs[Long]("n")).toFloat
      }
      books = next
      it += 1
    }
    Model(dim, m, k, books)
  }

  /** Code array (one int per subspace) for a vector column. */
  def encode(vec: Column, model: Model): Column =
    encodeCol(vec, model.books)

  /** Reconstruction (decode) of a code array — concatenated centroid
    * slices; used by the quantization-error certificate. */
  def decode(codes: Column, model: Model): Column = {
    val bookLits = model.books.map(book =>
      array(book.map(c => array(c.map(lit(_)): _*)): _*))
    concat((0 until model.m).map(s =>
      element_at(bookLits(s), codes.getItem(s) + 1)): _*)
  }

  /** ADC approximate max-inner-product top-k: train on the corpus,
    * encode it (codes only cross the join), precompute each query's
    * m×k partial-dot table ONCE, then score candidates by m lookups.
    * Returns (query_id, neighbor_id, score, rank) — `score` is the
    * Det-rounded ADC inner-product approximation (equals cosine
    * ranking when inputs are unit-norm). */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int = 8, k: Int = 16, topK: Int = 10,
      iters: Int = 2): DataFrame = {
    val model = train(corpus, idCol, vecCol, dim, m, k, iters)
    val subDim = dim / m
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), model).as("__codes"))
    // per-query lookup table: __tab(s)(code) = q_s · c_{s,code}
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qvec"))
      .withColumn("__tab", tableCol(col("__qvec"), model.books))
    scoreAndRank(broadcast(q).crossJoin(coded), m, topK)
  }

  /** Shared ADC scoring tail: sum the m table lookups, Det-round, rank
    * per query with the id tie-break, keep topK. ONE definition so the
    * flat and IVF paths cannot diverge on the determinism pins (the
    * PipelineSpec nprobe = nlist equivalence depends on it). */
  private def scoreAndRank(candidates: DataFrame, m: Int,
      topK: Int): DataFrame = {
    val score = (0 until m).map(s =>
      element_at(col("__tab").getItem(s), col("__codes").getItem(s) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    candidates
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", graft.Det.r(score, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("score"),
        col("rank"))
  }

  /** IVF-PQ: the production composition — corpus rows carry an IVF
    * cell id (the [[Similarity.ivfJoin]] inverted file) AND their PQ
    * codes; each query probes its `nprobe` max-dot cells and
    * ADC-scores ONLY the codes in those cells. Candidate count drops
    * to ~nprobe/nlist of the corpus and the scored payload is 8-int
    * codes, not vectors — the layout that serves billion-vector
    * corpora from executor memory. Same output contract and
    * determinism pins as [[adcTopK]]. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, k: Int = 16, topK: Int = 10, iters: Int = 2): DataFrame = {
    val cents = Similarity.ivfCentroids(corpus, idCol, vecCol, nlist, iters)
    val model = train(corpus, idCol, vecCol, dim, m, k, iters)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
        encode(col(vecCol), model).as("__codes"),
        Similarity.nearestCentroid(col(vecCol), cents).as("__cluster"))
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
      .withColumn("__tab", tableCol(col("__qvec"), model.books))
      .withColumn("__probe",
        Similarity.probeCells(col("__qvec"), cents, nprobe))
      .select(col("query_id"), col("__tab"),
        explode(col("__probe")).as("__cluster"))
    scoreAndRank(broadcast(probed).join(coded, Seq("__cluster")), m, topK)
  }

  // whole-stage-codegen entry points for the PQ expressions: same
  // kernels as the interpreted eval, ArrayData-typed so generated Java
  // links the static forwarders directly (the TextHash discipline)
  def encodeRowArr(v: org.apache.spark.sql.catalyst.util.ArrayData,
      books: Array[Array[Array[Float]]])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encodeRow(v, books))

  def tableRowArr(v: org.apache.spark.sql.catalyst.util.ArrayData,
      books: Array[Array[Array[Float]]])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      tableRow(v, books).map(r =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(r): Any))
}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** PQ code array for a float-vector column (compact loop — see
  * [[Pq.encodeRow]]'s scaladoc for why not a literal tree; the books
  * bind into codegen as a reference object, round 20). */
case class PqEncodeExpr(child: Expression,
    books: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  // float arrays ONLY (the kernels read via getFloat): an array<double>
  // child would silently misread UnsafeArrayData bytes as garbage codes
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName requires array<float>, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Pq.encodeRowArr(v.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.pipeline.Pq.encodeRowArr($c, $b)")
  }
  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-query ADC lookup table: m×k partial inner products. */
case class PqTableExpr(child: Expression,
    books: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName requires array<float>, got $other")
    }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Pq.tableRowArr(v.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.pipeline.Pq.tableRowArr($c, $b)")
  }
  override def prettyName: String = "pq_table"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
