package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

import graft.pipeline._

/** Pins the round-20 codegen campaign: every custom pipeline expression
  * that lost its `CodegenFallback` must (a) compile under whole-stage
  * codegen with fallback DISABLED — a broken `doGenCode` fails here
  * instead of silently falling back to the interpreted path at the next
  * bench — and (b) produce rows identical to the interpreted eval
  * (`NO_CODEGEN`), so the two execution paths can never diverge on the
  * oracle-certified values. */
class CodegenSpec extends SparkFunSuite {

  private def c(e: Expression) = graftbridge.column(e)
  private def x(col: org.apache.spark.sql.Column) = graftbridge.expression(col)

  // deterministic PQ books / PCA model / DSIR table fixtures
  private val books: Array[Array[Array[Float]]] =
    Array.tabulate(2, 4, 4)((m, k, d) => (m + 1) * 0.25f * k - 0.125f * d)
  private val pcaMean: Array[Double] = Array.tabulate(8)(i => 0.1 * i - 0.3)
  private val pcaComp: Array[Array[Double]] =
    Array.tabulate(2, 8)((j, d) => math.sin(j + 1.0 + d * 0.7))
  private val dsirTable: Map[Long, Long] =
    Map(1L -> 5000000L, 2L -> -3000000L, 42L -> 1L)

  private def inputs: DataFrame = {
    import spark.implicits._
    Seq(
      ("the quick brown fox jumps over the lazy dog",
        "the quick brown fox leaps over the lazy dog",
        Seq(0.1f, -0.2f, 0.3f, 0.4f, -0.5f, 0.6f, 0.7f, -0.8f),
        Seq(0L, 3L, 1L, 2L, 3L, 0L, 1L, 2L), Seq(1L, 2L, 42L)),
      ("", "x", Seq.fill(8)(0.0f), Seq.fill(8)(0L), Seq.empty[Long]),
      ("Héllo wörld — ligatures ﬁne, ümlauts",
        "Héllo wörld",
        Seq(1.5f, 2.5f, -3.5f, 4.5f, 5.5f, -6.5f, 7.5f, 8.5f),
        Seq(3L, 3L, 3L, 3L, 3L, 3L, 3L, 3L), Seq(2L, 7L, 7L)),
      ("aaaa bbbb aaaa bbbb aaaa bbbb cccc dddd eeee ffff gggg hhhh " * 4,
        "aaaa bbbb aaaa bbbb",
        Seq(-0.9f, 0.8f, -0.7f, 0.6f, -0.5f, 0.4f, -0.3f, 0.2f),
        Seq(1L, 0L, 2L, 3L, 1L, 0L, 2L, 3L), Seq(42L, 1L))
    ).toDF("ta", "tb", "vf", "codes", "bkts")
  }

  /** One projection exercising every converted expression. */
  private def allExprs(df: DataFrame): DataFrame = df.select(
    c(Fingerprint64(x(col("ta")))).as("fp"),
    c(SimHash64(x(col("ta")))).as("sh"),
    c(MinHashSig(x(col("ta")), 16, 5)).as("mh"),
    c(WinnowFingerprints(x(col("ta")), 5, 4)).as("wn"),
    c(ShingleSet(x(col("ta")), 5)).as("ss"),
    c(SortedIntersectSize(x(c(ShingleSet(x(col("ta")), 5))),
      x(c(ShingleSet(x(col("tb")), 5))))).as("ix"),
    c(JaccardShingle(x(col("ta")), x(col("tb")), 5)).as("jc"),
    c(LangId(x(col("ta")))).as("lid"),
    c(UnicodeNormalize(x(col("ta")), "NFKC")).as("nrm"),
    c(DeflateLen(x(col("ta")))).as("dfl"),
    c(CharWindowsExpr(x(col("ta")), 8, 3)).as("cw"),
    c(TokenCountExpr(x(col("ta")))).as("tc"),
    c(WordGramsExpr(x(col("ta")), 2)).as("wg"),
    c(SqScoreExpr(x(col("vf")), x(col("codes")),
      Array.tabulate(8)(i => -1.0 + 0.1 * i),
      Array.tabulate(8)(i => 0.01 * (i + 1)))).as("sq"),
    c(ExactDotMicrosExpr(x(col("vf")), x(col("vf")))).as("dm"),
    c(PqEncodeExpr(x(col("vf")), books)).as("pqe"),
    c(PqTableExpr(x(col("vf")), books)).as("pqt"),
    c(PcaProjectExpr(x(col("vf")), pcaMean, pcaComp)).as("pca"),
    c(DsirGramScoreExpr(x(col("bkts")), dsirTable, -7000000L)).as("dsir"),
    c(LshBucketsExpr(x(col("vf")), 8, 6, 2, 1234L)).as("lsh"),
    c(CosineSim(x(col("vf")), x(col("vf")))).as("cos"),
    c(DotProduct(x(col("vf")), x(col("vf")))).as("dot")
  )

  private def withConfs(pairs: (String, String)*)(body: => Array[Row])
      : Array[Row] = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // without this exclusion the optimizer's ConvertToLocalRelation
  // evaluates the projection EAGERLY (interpreted) over the local Seq
  // relation and neither arm would execute anything
  private val noLocalFold = "spark.sql.optimizer.excludedRules" ->
    "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"

  test("converted expressions run inside one whole-stage-codegen span " +
      "with fallback disabled") {
    val rows = withConfs(noLocalFold,
      "spark.sql.codegen.wholeStage" -> "true",
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val df = allExprs(inputs)
      val plan = df.queryExecution.executedPlan
      assert(plan.isInstanceOf[WholeStageCodegenExec],
        s"projection not whole-stage-codegen'd:\n${plan.treeString}")
      df.collect()
    }
    assert(rows.length == 4)
  }

  test("codegen and interpreted eval produce identical rows") {
    val gen = withConfs(noLocalFold,
      "spark.sql.codegen.wholeStage" -> "true",
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      allExprs(inputs).collect()
    }
    val interp = withConfs(noLocalFold,
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      allExprs(inputs).collect()
    }
    assert(gen.length == interp.length)
    gen.zip(interp).zipWithIndex.foreach { case ((g, i), n) =>
      assert(g == i, s"row $n diverges:\ncodegen    : $g\ninterpreted: $i")
    }
  }
}
