package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword-regularization SAMPLING of one word under a unigram LM
  * (Kudo, ACL 2018 — the mode [[UnigramEncode]]'s hard Viterbi
  * approximates at α→∞): draws a segmentation x with
  * P(x) ∝ (∏ p(piece))^α via forward-filtering backward-sampling over
  * the same piece lattice the Viterbi kernel walks.
  *
  * Every draw is a PURE FUNCTION of (salt, word, position) — the
  * [[graft.llm.Sampling]] md5 discipline — so the sample is reproducible
  * row-independent, partition-independent, and ENGINE-portable: the
  * DuckDB mirror recomputes the identical draws and the identical
  * lattice arithmetic.
  *
  * Portability of the float ops (the one place this family leaves exact
  * Long arithmetic): the forward pass stays on the NANO-LOG grid —
  * `a(j) = mx + floor(ln(Σ exp((c−mx)·1e-9))·1e9)` with the Σ in pinned
  * l = 1..maxLen order — so libm-vs-libm ulp noise is crushed by the
  * 1e9 grid exactly like the idf/λ nano-ln convention; the backward
  * step's `cum > u` comparison is the only raw-double decision, with a
  * ~1e-16-per-draw boundary risk (the q_lm_score noise class, accepted
  * and documented there). α rides as `floor(lp·α)` per piece — exact
  * for the integer-valued α the catalog uses. Missing multi-char pieces
  * are not lattice edges; a missing single char scores the Viterbi
  * kernel's `neg` sentinel, so every position stays reachable and the
  * log domain never underflows. */
case class UnigramSample(child: Expression, vocab: Map[String, Long],
    maxLen: Int, negSentinel: Long, alpha: Double, salt: String)
    extends UnaryExpression {

  require(maxLen >= 1, s"unigram_sample: maxLen must be >= 1: $maxLen")
  require(alpha > 0.0, s"unigram_sample: alpha must be > 0: $alpha")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_sample"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_sample requires string, got ${t.simpleString}")
    }

  @transient private lazy val jVocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    UnigramSample.compute(input.asInstanceOf[UTF8String], jVocab, maxLen,
      negSentinel, alpha, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", jVocab,
      "java.util.HashMap<String, Long>")
    val saltRef = ctx.addReferenceObj("salt", salt, "String")
    defineCodeGen(ctx, ev, s =>
      s"graft.expr.UnigramSample$$.MODULE$$.compute($s, $vRef, $maxLen, " +
        s"${negSentinel}L, $alpha, $saltRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSample {

  /** hex13(md5("salt:word:pos")) / 2^52 — the deterministic uniform
    * draw; 52 bits so the integer and the division are both exact, and
    * DuckDB's `CAST('0x'||substr(md5(..),1,13) AS BIGINT)` parses the
    * identical value. */
  private def draw(salt: String, word: String, pos: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$word:$pos".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
  }

  def compute(word: UTF8String, vocab: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, neg: Long, alpha: Double, salt: String): ArrayData = {
    val s = word.toString
    val nChars = s.length
    var n = 0
    var o = 0
    val off = new Array[Int](nChars + 1)
    while (o < nChars) {
      off(n) = o
      o += Character.charCount(s.codePointAt(o))
      n += 1
    }
    off(n) = nChars

    // candidate score ending at `to` with piece length l: a(to−l) +
    // floor(lp·α); null (no edge) for a missing multi-char piece
    @inline def lpA(from: Int, to: Int): java.lang.Long = {
      val v = vocab.get(s.substring(off(from), off(to)))
      val raw = if (v == null) { if (to - from == 1) neg else return null }
                else v.longValue()
      java.lang.Long.valueOf(math.floor(raw.toDouble * alpha).toLong)
    }

    // forward: nano-log marginals on the grid (see class doc)
    val a = new Array[Long](n + 1)
    var j = 1
    while (j <= n) {
      val lMax = if (j < maxLen) j else maxLen
      var mx = Long.MinValue
      var l = 1
      while (l <= lMax) {
        val p = lpA(j - l, j)
        if (p != null) {
          val c = a(j - l) + p.longValue()
          if (c > mx) mx = c
        }
        l += 1
      }
      var sum = 0.0
      l = 1
      while (l <= lMax) { // pinned l order — the mirror sums identically
        val p = lpA(j - l, j)
        if (p != null)
          sum += math.exp((a(j - l) + p.longValue() - mx).toDouble * 1e-9)
        l += 1
      }
      a(j) = mx + math.floor(math.log(sum) * 1e9).toLong
      j += 1
    }

    // backward: at position k draw u and take the smallest l whose
    // running probability mass crosses it (fallback: the largest edge —
    // the grid makes Σ ≈ 1 − O(1e-9), never exactly 1)
    val toks = new Array[UTF8String](n)
    var k = n
    var m = 0
    while (k > 0) {
      val u = draw(salt, s, k)
      val lMax = if (k < maxLen) k else maxLen
      var cum = 0.0
      var chosen = 0
      var lastValid = 0
      var l = 1
      while (l <= lMax) {
        val p = lpA(k - l, k)
        if (p != null) {
          lastValid = l
          cum += math.exp((a(k - l) + p.longValue() - a(k)).toDouble * 1e-9)
          if (chosen == 0 && cum > u) chosen = l
        }
        l += 1
      }
      if (chosen == 0) chosen = lastValid
      toks(m) = UTF8String.fromString(s.substring(off(k - chosen), off(k)))
      m += 1
      k -= chosen
    }
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) { out(i) = toks(m - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  def apply(word: Column, vocab: Map[String, Long], maxLen: Int,
      negSentinel: Long, alpha: Double, salt: String): Column =
    GraftBridge.column(UnigramSample(GraftBridge.expression(word), vocab,
      maxLen, negSentinel, alpha, salt))
}
