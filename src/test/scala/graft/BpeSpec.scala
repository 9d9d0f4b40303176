package graft

import graft.pipeline.{Bpe, TextFunctions}
import org.apache.spark.sql.functions._

/** Tokenizer-exact BPE counting (round-15 verdict #3): the committed
  * merge table applied per document, checked against an INDEPENDENT
  * naive reimplementation of the same spec and structural invariants.
  * The cross-engine differential is tools/bpe_oracle.py. */
class BpeSpec extends SparkFunSuite {
  import spark.implicits._

  // --- independent naive twin: same spec, different code shape -------
  private lazy val naiveRanks: Map[(Seq[Byte], Seq[Byte]), Int] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/bpe_merges.txt"), "UTF-8")
    try src.getLines().filterNot(l => l.isEmpty || l.startsWith("#"))
      .zipWithIndex.map { case (l, i) =>
        val Array(a, b) = l.split(" ")
        def un(h: String): Seq[Byte] =
          h.grouped(2).map(Integer.parseInt(_, 16).toByte).toSeq
        (un(a), un(b)) -> i
      }.toMap
    finally src.close()
  }

  private def naiveCount(text: String): Long = {
    def wordCount(w: Seq[Byte]): Int = {
      var parts: List[Seq[Byte]] = w.map(Seq(_)).toList
      var go = true
      while (go && parts.length > 1) {
        val ranked = parts.zip(parts.tail)
          .flatMap(p => naiveRanks.get(p).map(r => (r, p)))
        if (ranked.isEmpty) go = false
        else {
          val (_, pair) = ranked.minBy(_._1)
          val out = scala.collection.mutable.ListBuffer.empty[Seq[Byte]]
          var rest = parts
          while (rest.nonEmpty) {
            rest match {
              case a :: b :: t if (a, b) == pair =>
                out += (a ++ b); rest = t
              case a :: t => out += a; rest = t
              case Nil =>
            }
          }
          parts = out.toList
        }
      }
      parts.length
    }
    val words = text.split(s"[ \t\n\f\r]+").filter(_.nonEmpty)
    words.map(w => wordCount(w.getBytes("UTF-8").toSeq).toLong).sum
  }

  test("hand cases: empty, whitespace classes, unmergeable bytes, UTF-8") {
    assert(Bpe.countTokens("") === 0L)
    assert(Bpe.countTokens(" \t\n\f\r") === 0L)
    //  (vertical tab) is NOT whitespace here (RE2 \s pin): it is
    // one unmergeable byte glued to its word
    assert(Bpe.countTokens("a\u000bb") === naiveCount("a\u000bb"))
    // control bytes never appear in the trained table -> one token/byte
    assert(Bpe.countTokens("\u0001\u0002") === 2L)
    // é is 2 UTF-8 bytes, 𝄞 (astral) is 4 — unmerged bytes count each
    assert(Bpe.countTokens("é") === naiveCount("é"))
    assert(Bpe.countTokens("𝄞") === naiveCount("𝄞"))
  }

  test("matches the independent naive twin on the fixture corpus") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text")).collect()
    docs.foreach { r =>
      val t = r.getString(1)
      if (t != null)
        assert(Bpe.countTokens(t) === naiveCount(t),
          s"doc ${r.getLong(0)} diverged")
    }
  }

  test("structural bounds hold corpus-wide via the expression") {
    val lmax = Bpe.maxTokenBytes.toLong
    assert(lmax >= 2L)
    val viol = Tables.documents(spark, sf("sf0.001"))
      .filter(col("text").isNotNull)
      .withColumn("__n", TextFunctions.bpe_token_count(col("text")))
      .withColumn("__b", octet_length(
        regexp_replace(col("text"), "[ \\t\\n\\f\\r]", "")).cast("long"))
      .filter(col("__n") > col("__b") ||
        col("__n") < ceil(col("__b").cast("double") / lit(lmax)) ||
        (col("__n") === 0L) =!= (col("__b") === 0L))
      .count()
    assert(viol === 0L)
  }

  test("expression is deterministic across partitionings and NULL-safe") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val one = docs.repartition(1)
      .select(sum(TextFunctions.bpe_token_count(col("text")))).head().getLong(0)
    val many = docs.repartition(7)
      .select(sum(TextFunctions.bpe_token_count(col("text")))).head().getLong(0)
    assert(one === many)
    val n = Seq((1L, null.asInstanceOf[String]), (2L, "hello world"))
      .toDF("id", "t")
      .select(TextFunctions.bpe_token_count(col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(n === Seq(-1L, Bpe.countTokens("hello world")))
  }
}
