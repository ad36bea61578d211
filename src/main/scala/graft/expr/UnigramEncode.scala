package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation of one word, in ONE JVM pass straight
  * to `array<string>` — the codegen'd kernel behind
  * [[graft.llm.Unigram.encode]] and the trainer's E-step.
  *
  * Drop-in replacement (bit-identical tokens, pinned by UnigramSpec's
  * kernel ≡ staged-HOF parity) for the four-stage higher-order-function
  * chain ([[graft.llm.Unigram.withViterbiHof]]): HOFs never enter
  * whole-stage codegen, and tokenizer encode is the step that touches
  * every byte of a release corpus — the same rationale as [[PqEncode]] /
  * [[RepetitionGrams]]. The replicated semantics, all exact Long
  * arithmetic so any engine picks the same path:
  *
  *  - forward DP maximizes the sum of nano log-probs over segmentations,
  *    pieces of 1..[[graft.llm.Unigram.MaxLen]] codepoints;
  *  - a missing MULTI-char piece is not a candidate; a missing single
  *    char scores the [[graft.llm.Unigram.Neg]] sentinel (every position
  *    stays reachable);
  *  - backward reconstruction takes the SHORTEST last piece among
  *    score-equal predecessors (the pinned tie-break).
  *
  * Positions are CODEPOINTS (Spark's `substr`/`length` semantics), not
  * Java chars — surrogate pairs count once. The vocab rides along as a
  * codegen reference object — |V| entries, KBs, inlined once per task,
  * never shuffled. */
case class UnigramEncode(child: Expression, vocab: Map[String, Long],
    maxLen: Int, negSentinel: Long)
    extends UnaryExpression {

  require(maxLen >= 1, s"unigram_encode: maxLen must be >= 1: $maxLen")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_encode requires string, got ${t.simpleString}")
    }

  // one java.util map per expression instance (not per row): HashMap.get
  // with no Option boxing on the per-position hot path
  @transient private lazy val jVocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    UnigramEncode.compute(input.asInstanceOf[UTF8String], jVocab, maxLen,
      negSentinel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", jVocab,
      "java.util.HashMap<String, Long>")
    defineCodeGen(ctx, ev, s =>
      s"graft.expr.UnigramEncode$$.MODULE$$.compute($s, $vRef, $maxLen, ${negSentinel}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramEncode {

  def compute(word: UTF8String, vocab: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, neg: Long): ArrayData = {
    val s = word.toString
    // codepoint index -> Java-char offset, so substrings slice codepoints
    // exactly like Spark's substr (surrogate pairs count once)
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

    @inline def lp(from: Int, to: Int): java.lang.Long = {
      val v = vocab.get(s.substring(off(from), off(to)))
      if (v == null && to - from == 1) java.lang.Long.valueOf(neg) else v
    }

    // forward: best(j) = max over l of best(j-l) + lp(piece ending at j);
    // l = 1 always scores (char fallback), so every position is reachable
    val best = new Array[Long](n + 1)
    var j = 1
    while (j <= n) {
      var b = Long.MinValue
      var l = 1
      val lMax = if (j < maxLen) j else maxLen
      while (l <= lMax) {
        val p = lp(j - l, j)
        if (p != null) {
          val cand = best(j - l) + p.longValue()
          if (cand > b) b = cand
        }
        l += 1
      }
      best(j) = b
      j += 1
    }

    // backward: the SHORTEST last piece whose exact-Long score matches —
    // identical to the staged-HOF pred/path/pieces chain
    val toks = new Array[UTF8String](n) // at most n single-char pieces
    var k = n
    var m = 0
    while (k > 0) {
      var found = 0
      var l = 1
      while (found == 0 && l <= maxLen && l <= k) {
        val p = lp(k - l, k)
        if (p != null && best(k - l) + p.longValue() == best(k)) found = l
        l += 1
      }
      toks(m) = UTF8String.fromString(s.substring(off(k - found), off(k)))
      m += 1
      k -= found
    }
    // reverse the backward-collected pieces into word order
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) { out(i) = toks(m - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  def apply(word: Column, vocab: Map[String, Long], maxLen: Int,
      negSentinel: Long): Column =
    GraftBridge.column(UnigramEncode(GraftBridge.expression(word), vocab,
      maxLen, negSentinel))
}
