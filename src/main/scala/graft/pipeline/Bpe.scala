package graft.pipeline

/** Tokenizer-EXACT byte-level BPE token counting (round-15 verdict #3)
  * — the rung above [[TokenCountExpr]]'s calibrated closed-form scheme:
  * a real learned merge table (trained offline on the fixture corpus by
  * `tools/train_bpe.py`, checked in as DATA at
  * `src/main/resources/graft/bpe_merges.txt`) applied per document at
  * scan time, so packing/chunking budgets are denominated in the exact
  * tokens a model with this vocabulary would see.
  *
  * Tokenizer spec (shared verbatim with the trainer and the
  * `tools/bpe_oracle.py` differential twin):
  *  1. Pre-tokenize: split on runs of exactly {space, \t, \n, \f, \r}
  *     (RE2's `\s` class, the [[TextHash.tokenCount]] pin — NOT Java's
  *     `\s`, which adds \x0B). Empty splits drop.
  *  2. Each pre-token's UTF-8 bytes are the initial symbol sequence.
  *  3. Merges apply in rank order: repeatedly find the LOWEST-rank
  *     adjacent symbol pair present and fuse every non-overlapping
  *     occurrence left-to-right (the Sennrich et al. 2016 apply loop;
  *     GPT-2's `bpe()` shape).
  *  4. The document count is the summed symbol count over pre-tokens.
  *
  * Determinism: the merge table is a committed artifact (training
  * tie-breaks are totally ordered: frequency desc, then
  * lexicographically smallest pair), the apply loop is sequential per
  * word, and counting is order-free across words — so counts are
  * identical across partitionings, sessions, and the Python twin.
  *
  * Scale shape: a per-row scan-side expression (codegen'd static call,
  * no shuffle); repeated words hit a bounded in-executor memo (natural
  * corpora repeat words heavily — the GPT-2 cache trick), so the merge
  * loop amortizes to a hash lookup per word. */
object Bpe {

  /** Symbols are byte strings encoded latin-1 (chars 0-255 ↔ bytes 1:1
    * — cheap, hashable, concatenation = byte concat). */
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** rank per (left, right) pair; lower = earlier merge. */
  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bpe_merges.txt missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      var rank = 0
      src.getLines().foreach { line =>
        val t = line.trim
        if (t.nonEmpty && !t.startsWith("#")) {
          val Array(a, b) = t.split(" ")
          m.put(key(unhex(a), unhex(b)), Integer.valueOf(rank))
          rank += 1
        }
      }
    } finally src.close()
    m
  }

  private def unhex(s: String): String = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(out, Latin1)
  }

  // '￿' cannot appear in a latin-1-decoded symbol, so the joined
  // key is collision-free
  private def key(a: String, b: String): String = a + '￿' + b

  /** Bounded word→count memo (cleared when full; entries are tiny).
    * Correctness-neutral: the merge loop is deterministic, so a miss
    * recomputes the identical value. */
  private val wordCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[graft] def cacheSize: Int = wordCache.size()

  /** Token count of ONE pre-token (no whitespace inside). */
  private def wordTokens(word: String): Int = {
    val hit = wordCache.get(word)
    if (hit != null) return hit.intValue()
    val bytes = word.getBytes(Utf8)
    var parts = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      parts(i) = new String(bytes, i, 1, Latin1)
      i += 1
    }
    var n = parts.length
    var done = n < 2
    while (!done) {
      // lowest-rank adjacent pair present
      var bestRank = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = ranks.get(key(parts(j), parts(j + 1)))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // fuse every non-overlapping occurrence, left to right
        val next = new Array[String](n)
        var w = 0
        var k = 0
        while (k < n) {
          if (k < n - 1 && {
            val r = ranks.get(key(parts(k), parts(k + 1)))
            r != null && r.intValue() == bestRank
          }) {
            next(w) = parts(k) + parts(k + 1)
            k += 2
          } else {
            next(w) = parts(k)
            k += 1
          }
          w += 1
        }
        parts = next
        n = w
        if (n < 2) done = true
      }
    }
    if (wordCache.size >= (1 << 16)) wordCache.clear()
    wordCache.put(word, Integer.valueOf(n))
    n
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** BPE token count of a document under the committed merge table. */
  def countTokens(text: String): Long = {
    var total = 0L
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) total += wordTokens(text.substring(start, i))
    }
    total
  }

  /** Longest merged token in the committed table, in BYTES — the
    * constant the `doc_tokens_bpe_sound` certificate's lower bound
    * uses (`n_tok ≥ ceil(nonws_bytes / maxTokenBytes)`). */
  lazy val maxTokenBytes: Int = {
    var mx = 1
    val it = ranks.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      mx = math.max(mx, k.length - 1) // key = left + '￿' + right
    }
    mx
  }
}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Codegen'd scan-side wrapper over [[Bpe.countTokens]]. */
case class BpeTokenCountExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a STRING child, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    Bpe.countTokens(v.toString)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.Bpe.countTokens($c.toString())")
  override def prettyName: String = "bpe_token_count"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
