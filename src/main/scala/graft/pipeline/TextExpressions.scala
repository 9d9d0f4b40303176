package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-pipeline Catalyst expressions for large-scale training-data work:
  * document fingerprinting, MinHash signatures, SimHash, n-gram Jaccard,
  * language ID. All pure single-pass Scala over the string — no
  * per-row array materialization of shingles, no external deps, fully
  * deterministic (fixed seeds) so results are stable across cluster sizes.
  */
object TextHash {
  /** FNV-1a 64-bit over a char range (cheap, allocation-free). */
  def fnv1a(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit finalizer (splitmix64) for independent hash families. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Normalize for fingerprinting: lowercase, collapse runs of whitespace
    * to single spaces, trim. Single pass. */
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastSpace = true
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else {
        sb.append(Character.toLowerCase(c)); lastSpace = false
      }
      i += 1
    }
    var n = sb.length()
    if (n > 0 && sb.charAt(n - 1) == ' ') sb.setLength(n - 1)
    sb.toString
  }

  /** Subword-budget token count (see [[TokenCountExpr]] for the scheme
    * and its rationale): one pass, no allocation, per-code-point. */
  def tokenCount(s: String): Long = {
    val n = s.length
    var total = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') {
        i += 1
      } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
        var j = i + 1
        while (j < n && {
          val d = s.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z')
        }) j += 1
        total += (j - i + 5) / 6
        i = j
      } else if (c >= '0' && c <= '9') {
        var j = i + 1
        while (j < n && { val d = s.charAt(j); d >= '0' && d <= '9' }) j += 1
        total += (j - i + 2) / 3
        i = j
      } else {
        // one token per CODE POINT: an astral surrogate pair advances
        // two chars but counts once, matching the SQL twin's
        // per-codepoint regex
        total += 1
        i += Character.charCount(s.codePointAt(i))
      }
    }
    total
  }

  /** MinHash signature over character n-gram shingles of the normalized
    * text: one base hash per shingle, k permutations via double hashing
    * (Kirsch-Mitzenmacher, "Less Hashing, Same Performance": the j-th
    * permutation is `h1 + j*h2` with independently mixed h1/h2, h2 forced
    * odd so the step is a bijection mod 2^64) — one splitmix finalizer
    * per shingle instead of k, turning the k-wide inner loop into an
    * add+compare. Texts shorter than one shingle get the empty signature
    * (Long.MaxValue everywhere). */
  def minhash(text: String, k: Int, shingle: Int): Array[Long] = {
    val norm = normalize(text)
    val sig = Array.fill(k)(Long.MaxValue)
    if (norm.length >= shingle) {
      var i = 0
      val last = norm.length - shingle
      while (i <= last) {
        val base = fnv1a(norm, i, i + shingle)
        val h2 = mix(base + 0x9e3779b97f4a7c15L) | 1L
        var h = mix(base)
        var j = 0
        while (j < k) {
          if (h < sig(j)) sig(j) = h
          h += h2
          j += 1
        }
        i += 1
      }
    }
    sig
  }

  /** Distinct character-shingle hash set of the normalized text, sorted
    * (fnv1a, the SAME per-shingle hash [[jaccard]] compares with, so set
    * sizes agree between candidate generation and the exact refine even
    * under a hash collision). Texts shorter than one shingle yield the
    * empty array — the [[jaccard]] empty-set convention's domain. */
  def shingleSet(text: String, shingle: Int): Array[Long] = {
    val norm = normalize(text)
    if (norm.length < shingle) return Array.empty
    val set = new java.util.HashSet[Long]()
    var i = 0
    val last = norm.length - shingle
    while (i <= last) { set.add(fnv1a(norm, i, i + shingle)); i += 1 }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Exact character-shingle Jaccard between two texts (the refine step
    * after LSH candidate generation). */
  def jaccard(a: String, b: String, shingle: Int): Double = {
    def shingles(s: String): java.util.HashSet[Long] = {
      val norm = normalize(s)
      val set = new java.util.HashSet[Long]()
      var i = 0
      val last = norm.length - shingle
      while (i <= last) { set.add(fnv1a(norm, i, i + shingle)); i += 1 }
      set
    }
    val sa = shingles(a); val sb = shingles(b)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** 64-bit SimHash over whitespace word tokens of the normalized text. */
  def simhash(text: String): Long = {
    val norm = normalize(text)
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    val n = norm.length
    while (i <= n) {
      if (i == n || norm.charAt(i) == ' ') {
        if (i > start) {
          val h = mix(fnv1a(norm, start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): min shingle-hash
    * per sliding window, deduplicated — the standard local document
    * fingerprint for near-copy detection at corpus scale. */
  def winnow(text: String, shingle: Int, window: Int): Array[Long] = {
    val norm = normalize(text)
    if (norm.length < shingle) return Array.empty
    val m = norm.length - shingle + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = mix(fnv1a(norm, i, i + shingle)); i += 1 }
    if (m <= window) return Array(hs.min)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var last = -1L
    i = 0
    while (i + window <= m) {
      var mn = Long.MaxValue
      var j = i
      while (j < i + window) { if (hs(j) < mn) mn = hs(j); j += 1 }
      if (mn != last) { out += mn; last = mn }
      i += 1
    }
    out.toArray
  }

  // ---- whole-stage-codegen entry points ------------------------------
  // Static forwarders with UTF8String/ArrayData signatures so generated
  // Java calls the SAME kernels the interpreted eval runs — no boxing, no
  // InternalRow, and (the point) no CodegenFallback splitting the WSCG
  // span of every projection/aggregate these appear in (the GeoOps
  // discipline). TextHash is a standalone object, so the Scala compiler
  // emits real static forwarders the generated code can link against.

  def minhashArr(s: UTF8String, k: Int, shingle: Int): ArrayData =
    new GenericArrayData(minhash(s.toString, k, shingle))

  def shingleSetArr(s: UTF8String, shingle: Int): ArrayData =
    new GenericArrayData(shingleSet(s.toString, shingle))

  def winnowArr(s: UTF8String, shingle: Int, window: Int): ArrayData =
    new GenericArrayData(winnow(s.toString, shingle, window))

  def simhashU(s: UTF8String): Long = simhash(s.toString)

  def fingerprintU(s: UTF8String): Long = {
    val n = normalize(s.toString)
    mix(fnv1a(n, 0, n.length))
  }

  def jaccardU(a: UTF8String, b: UTF8String, shingle: Int): Double =
    jaccard(a.toString, b.toString, shingle)

  def langidU(s: UTF8String): UTF8String =
    UTF8String.fromString(LangProfiles.detect(s.toString))

  def normalizeTo(s: UTF8String, form: java.text.Normalizer.Form): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString, form))

  /** Intersection size of two SORTED long arrays — see
    * [[SortedIntersectSize]]. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val nx = a.numElements(); val ny = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < nx && j < ny) {
      val xv = a.getLong(i); val yv = b.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  /** Deflate-compressed length — see [[DeflateLen]]. One native Deflater
    * + output buffer per task thread (per-row new/end pays native zlib
    * stream setup/teardown on every document); reset() restores the
    * configured level, end() is left to thread death (bounded by the
    * executor pool size). */
  def deflateLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes); d.finish()
    val buf = localDeflateBuf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  private val localDeflater =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6, false))
  private val localDeflateBuf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))
}

/** Tiny stopword-profile language identifier (n-gram/lexicon heuristic).
  * Script detection first (CJK/kana/hangul/cyrillic), then stopword voting
  * for latin-script languages. */
object LangProfiles {
  val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
      "was", "with", "on", "as", "are", "this", "be", "at", "have", "not"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "auf", "sich", "des", "dem", "den", "von", "zu", "im", "für"),
    "fr" -> Set("le", "la", "les", "des", "et", "est", "une", "dans", "que",
      "qui", "pour", "pas", "sur", "avec", "au", "du", "ce", "il"),
    "es" -> Set("el", "los", "las", "de", "que", "y", "en", "un", "una",
      "es", "no", "con", "por", "para", "su", "se", "del", "lo"),
    "it" -> Set("il", "di", "che", "e", "la", "per", "un", "una", "in",
      "non", "sono", "con", "del", "si", "da", "come", "anche"),
    "pt" -> Set("o", "a", "de", "que", "e", "do", "da", "em", "um", "uma",
      "para", "com", "não", "os", "as", "no", "na", "por"))

  def detect(text: String): String = {
    var cjk = 0; var kana = 0; var hangul = 0; var cyr = 0; var letters = 0
    var i = 0
    val n = math.min(text.length, 4000)
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN) cjk += 1
        else if (b == Character.UnicodeScript.HIRAGANA ||
          b == Character.UnicodeScript.KATAKANA) kana += 1
        else if (b == Character.UnicodeScript.HANGUL) hangul += 1
        else if (b == Character.UnicodeScript.CYRILLIC) cyr += 1
      }
      i += 1
    }
    if (letters == 0) return "und"
    if (kana * 10 > letters) return "ja"
    if (hangul * 10 > letters) return "ko"
    if (cjk * 10 > letters * 3) return "zh"
    if (cyr * 10 > letters * 3) return "ru"
    val words = TextHash.normalize(text.substring(0, n))
      .split(' ').iterator.take(400)
    val votes = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    words.foreach { w =>
      profiles.foreach { case (lang, set) => if (set.contains(w)) votes(lang) += 1 }
    }
    if (votes.isEmpty) "und"
    else votes.toSeq.sortBy { case (l, v) => (-v, l) }.head match {
      case (_, 0) => "und"
      case (l, _) => l
    }
  }
}

// ---- expressions ---------------------------------------------------------

/** Base for the unary text expressions: null-intolerant, string-typed
  * input enforced at ANALYSIS time (the [[TokenCountExpr]] rationale: a
  * non-string child would stringify fine interpreted but emit invalid
  * Java under codegen), and REAL whole-stage codegen — each subclass
  * names its static kernel call via [[genCall]]. These were
  * CodegenFallback through round 19, which evicted every projection and
  * partial aggregate they appear in from the WSCG span (the scan-side
  * hashing stages of the dedup/fingerprint gates ran interpreted,
  * re-boxing an InternalRow per row); the kernels are identical either
  * way, so the span is free. */
abstract class TextUnaryExpr extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.sql}")
  /** The Java call computing this expression from the child value `c`. */
  protected def genCall(ctx: CodegenContext, c: String): String
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => genCall(ctx, c))
}

/** Deterministic subword-budget token count — a tokenizer-GRADE (not
  * tokenizer-exact) model-token estimate that both engines can compute
  * in closed form, so context budgets (packing, chunking) stop meaning
  * "whitespace words" (round-14 directive #6). The scheme mirrors how
  * byte-level BPE spends its merge table: a run of ASCII letters costs
  * ceil(len/6) tokens (≈ one learned wordpiece per ~6 chars — the
  * GPT-2 family averages ~4-6 chars/token on English), a run of ASCII
  * digits ceil(len/3) (BPE vocabularies carry 1-3-digit groups), and
  * every other non-whitespace CODE POINT one token (punctuation and
  * non-ASCII rarely merge). Whitespace — exactly {space, \t, \n, \f,
  * \r}, RE2's `\s` class, so the DuckDB regex twin agrees char-for-char
  * — costs nothing. Counting is per code point (an astral pair is ONE
  * token on both sides). */
case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  // Require a string child at ANALYSIS time: without this, a non-string
  // child stringifies fine interpreted but emits invalid Java (e.g.
  // `int.toString()`) under codegen — a runtime failure instead of an
  // analysis error (round-15 ADVICE #2).
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires a STRING child, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    TextHash.tokenCount(v.toString)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.TextHash.tokenCount($c.toString())")
  override def prettyName: String = "token_count"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class MinHashSig(child: Expression, numHashes: Int = 64, shingle: Int = 5)
    extends TextUnaryExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.minhashArr(v.asInstanceOf[UTF8String], numHashes, shingle)
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextHash.minhashArr($c, $numHashes, $shingle)"
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SimHash64(child: Expression) extends TextUnaryExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.simhashU(v.asInstanceOf[UTF8String])
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextHash.simhashU($c)"
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class Fingerprint64(child: Expression) extends TextUnaryExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.fingerprintU(v.asInstanceOf[UTF8String])
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextHash.fingerprintU($c)"
  override def prettyName: String = "fingerprint64"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class WinnowFingerprints(child: Expression, shingle: Int = 5, window: Int = 4)
    extends TextUnaryExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.winnowArr(v.asInstanceOf[UTF8String], shingle, window)
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextHash.winnowArr($c, $shingle, $window)"
  override def prettyName: String = "winnow_fingerprints"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ShingleSet(child: Expression, shingle: Int = 5)
    extends TextUnaryExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.shingleSetArr(v.asInstanceOf[UTF8String], shingle)
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextHash.shingleSetArr($c, $shingle)"
  override def prettyName: String = "shingle_set"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Intersection size of two SORTED long arrays (as produced by
  * [[ShingleSet]]): allocation-free two-pointer merge, O(|A|+|B|) — the
  * exact-Jaccard verify step without per-pair re-hashing of the texts. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedIntersectSize(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.pipeline.TextHash.sortedIntersectSize($a, $b)")
  override def prettyName: String = "sorted_intersect_size"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class LangId(child: Expression) extends TextUnaryExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextHash.langidU(v.asInstanceOf[UTF8String])
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextHash.langidU($c)"
  override def prettyName: String = "langid"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class JaccardShingle(left: Expression, right: Expression, shingle: Int = 5)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.jaccardU(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], shingle)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.pipeline.TextHash.jaccardU($a, $b, $shingle)")
  override def prettyName: String = "jaccard_shingle"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Unicode normalization (UAX #15) as a scan-side expression — the
  * canonicalization step corpus prep runs before any hashing/dedup so
  * that visually-identical text (precomposed vs combining sequences,
  * compatibility ligatures under NFKC) hashes identically. Backed by
  * `java.text.Normalizer` (the JDK's ICU-derived tables); DuckDB's
  * `nfc_normalize` implements the same algorithm, so the NFC form
  * carries a full cross-engine hash oracle (gate doc_unicode).
  * `form` ∈ NFC | NFD | NFKC | NFKD, validated at construction. */
case class UnicodeNormalize(child: Expression, form: String = "NFC")
    extends TextUnaryExpr {
  private val normForm = java.text.Normalizer.Form.valueOf(form)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextHash.normalizeTo(v.asInstanceOf[UTF8String], normForm)
  override protected def genCall(ctx: CodegenContext, c: String): String = {
    val f = ctx.addReferenceObj("normForm", normForm,
      "java.text.Normalizer.Form")
    s"graft.pipeline.TextHash.normalizeTo($c, $f)"
  }
  override def prettyName: String = "unicode_normalize"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Deflate-compressed byte length of the UTF-8 text — the
  * compression-ratio quality signal (repetitive/templated text
  * compresses far below prose; Rae et al. 2021 §A1 and RedPajama-v2
  * both ship it as a corpus filter). Scan-side and allocation-bounded:
  * one Deflater per eval with a fixed dictionary-free stream,
  * level 6 (the zlib default every production pipeline quotes).
  * Deterministic for a given JDK's zlib; there is no SQL-engine twin,
  * so the gate certifies internal invariants (ratio bounds and
  * doubled-text sub-additivity) rather than a cross-engine hash. */
case class DeflateLen(child: Expression) extends TextUnaryExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.deflateLen(v.asInstanceOf[UTF8String])
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextHash.deflateLen($c)"
  override def prettyName: String = "deflate_len"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Byte-level word n-gram builder backing [[WordGramsExpr]]. */
object TextGrams {
  private val Empty = new GenericArrayData(Array.empty[Any])
  /** For codegen: the shared empty array<string> value. */
  def empty(): org.apache.spark.sql.catalyst.util.ArrayData = Empty

  /** All space-joined word `n`-grams of `s` under single-space split
    * semantics — byte-for-byte the rows
    * `transform(sequence(1, size(words)-(n-1)), i ->
    *   array_join(slice(words, i, n), ' '))` over
    * `words = split(s, ' ', -1)` produced: tokens split on EVERY single
    * space (empty tokens kept), so consecutive tokens are separated by
    * exactly one space and each gram is a contiguous byte slice of the
    * input — no token array, no per-gram join, one allocation per gram.
    * Space is ASCII 0x20 and UTF-8 multibyte sequences never contain it,
    * so byte scanning is exact. Fewer than `n` tokens → empty array
    * (the `when(size >= n, …)` guard's behavior). */
  def wordGrams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val m = spaces + 1
    if (m < n) return Empty
    val starts = new Array[Int](m + 1)
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(m) = len + 1 // sentinel: token m-1 ends at len = starts(m)-1
    val out = new Array[Any](m - n + 1)
    var g = 0
    while (g <= m - n) {
      val from = starts(g)
      out(g) = UTF8String.fromBytes(bytes, from, starts(g + n) - 1 - from)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Strided code-point windows — see [[CharWindowsExpr]]. Offsets of
    * every code point are computed once; each window is one byte-slice
    * allocation. */
  def charWindows(s: UTF8String, window: Int,
      stride: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // byte offset of each code point start, plus the end sentinel
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0
    var c = 0
    while (i < len) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = len
    val n = c
    if (n < window) return Empty
    val count = (n - window) / stride + 1
    val out = new Array[Any](count)
    var w = 0
    var p = 0
    while (w < count) {
      out(w) = UTF8String.fromBytes(bytes, offs(p),
        offs(p + window) - offs(p))
      w += 1
      p += stride
    }
    new GenericArrayData(out)
  }
}

/** Strided character windows (and, at stride 1, character shingles) of a
  * string as ONE codegen'd pass — byte-for-byte the rows
  * `transform(sequence(1, length(s) - (window-1), stride),
  *   p -> substr(s, p, window))` produced (SQL SUBSTR semantics: 1-based
  * CODE-POINT positions), with the code-point byte offsets computed once
  * per string instead of an interpreted lambda + O(n) position scan per
  * window. Fewer than `window` code points → empty array (the callers'
  * `when(length < window, …)` guard); null → null (what the old
  * `otherwise` branch evaluated to on null input). Backs
  * [[graft.pipeline.Dedup.substringDup]]'s strided windows and the
  * certificate-side shingle sets. */
case class CharWindowsExpr(child: Expression, window: Int, stride: Int)
    extends TextUnaryExpr {
  require(window >= 1 && stride >= 1,
    s"window/stride must be >= 1: $window/$stride")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextGrams.charWindows(v.asInstanceOf[UTF8String], window, stride)
  override protected def genCall(ctx: CodegenContext, c: String): String =
    s"graft.pipeline.TextGrams.charWindows($c, $window, $stride)"
  override def prettyName: String = "char_windows"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Word n-grams of a pre-normalized text column as ONE codegen'd pass
  * (see [[TextGrams.wordGrams]]).
  *
  * The higher-order-function formulation this replaces
  * (`transform(sequence(…), i -> array_join(slice(words, i, n), ' '))`)
  * evaluates an interpreted lambda per gram with a fresh slice array and
  * join buffer each — measured as the dominant task time of the
  * gram-shaped operators (decontamination, source overlap, repetition,
  * DSIR). NULL input yields the EMPTY array, not null — exactly what the
  * old `when(size(words) >= n, …).otherwise(array())` returned when
  * `size(null)` nulled the predicate — so the expression is non-nullable
  * and null-row behavior is unchanged. */
case class WordGramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1: $n")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_grams requires a STRING child, got ${child.dataType.sql}")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextGrams.empty()
    else TextGrams.wordGrams(v.asInstanceOf[UTF8String], n)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.pipeline.TextGrams.empty()
            : graft.pipeline.TextGrams.wordGrams(${c.value}, $n);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }
  override def prettyName: String = "word_grams"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column API for the text expressions. */
object TextFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge

  def minhash_sig(c: Column, k: Int = 64, shingle: Int = 5): Column =
    graftbridge.column(MinHashSig(graftbridge.expression(c), k, shingle))
  def simhash64(c: Column): Column =
    graftbridge.column(SimHash64(graftbridge.expression(c)))
  def fingerprint64(c: Column): Column =
    graftbridge.column(Fingerprint64(graftbridge.expression(c)))
  def winnow_fingerprints(c: Column, shingle: Int = 5, window: Int = 4): Column =
    graftbridge.column(WinnowFingerprints(graftbridge.expression(c), shingle, window))
  def shingle_set(c: Column, shingle: Int = 5): Column =
    graftbridge.column(ShingleSet(graftbridge.expression(c), shingle))
  def sorted_intersect_size(a: Column, b: Column): Column =
    graftbridge.column(SortedIntersectSize(
      graftbridge.expression(a), graftbridge.expression(b)))
  def langid(c: Column): Column =
    graftbridge.column(LangId(graftbridge.expression(c)))
  def jaccard_shingle(a: Column, b: Column, shingle: Int = 5): Column =
    graftbridge.column(JaccardShingle(
      graftbridge.expression(a), graftbridge.expression(b), shingle))
  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    graftbridge.column(UnicodeNormalize(graftbridge.expression(c), form))
  def deflate_len(c: Column): Column =
    graftbridge.column(DeflateLen(graftbridge.expression(c)))
  def token_count(c: Column): Column =
    graftbridge.column(TokenCountExpr(graftbridge.expression(c)))
  def bpe_token_count(c: Column): Column =
    graftbridge.column(BpeTokenCountExpr(graftbridge.expression(c)))
  def word_grams(c: Column, n: Int): Column =
    graftbridge.column(WordGramsExpr(graftbridge.expression(c), n))
  def char_windows(c: Column, window: Int, stride: Int): Column =
    graftbridge.column(CharWindowsExpr(graftbridge.expression(c),
      window, stride))
}
