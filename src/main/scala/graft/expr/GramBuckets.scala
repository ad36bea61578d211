package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR gram-bucket stream in ONE codegen'd pass: the md5-prefix
  * bucket (mod `b`) of every unigram AND bigram of the lowercased
  * whitespace-split text, multiset order preserved — bit-identical to the
  * composable [[graft.llm.Dsir.gramStream]] + bucketOf chain
  * (`explode(concat(words, transform(sequence(...), concat_ws/slice)))` →
  * `pmod(md5-prefix, b)`), which runs the bigram construction as
  * interpreted HOF lambdas allocating a sliced array + joined string per
  * bigram. The DSIR λ build, the scorer, and the per-source KL all consume
  * ONLY buckets — never gram strings — so the fused kernel feeds all
  * three; it was built when the session-3 bench showed the gram family as
  * the top rows with the hex round-trip already removed ([[Md5Prefix]]).
  *
  * Pinned semantics (the [[ShingleHashes]] tokenizer contract):
  *   - trim strips ASCII spaces; lower is Locale.ROOT; split is `\s+`
  *     with limit -1 (empty text yields one empty token, which buckets
  *     like md5("") — exactly as the composable chain did);
  *   - unigrams in token order, then bigrams (token i + ' ' + token i+1)
  *     in order — matching `concat(words, bigrams)`;
  *   - bucket = first 4 md5 bytes of the gram's UTF-8, big-endian,
  *     mod b (non-negative — the pmod convention). */
case class GramBuckets(child: Expression, b: Int) extends UnaryExpression {

  require(b > 0, s"bucket count must be positive: $b")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gram_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_buckets requires string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    GramBuckets.compute(input.asInstanceOf[UTF8String], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expr.GramBuckets$$.MODULE$$.compute($s, $b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramBuckets {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  @inline private def bucketOf(gram: String, b: Int,
      md: java.security.MessageDigest): Long = {
    md.reset()
    val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var j = 0
    while (j < 4) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v % b
  }

  /** Shared eval/codegen kernel. */
  def compute(input: UTF8String, b: Int): ArrayData = {
    val raw = input.toString
    var s0 = 0
    var e0 = raw.length
    while (s0 < e0 && raw.charAt(s0) == ' ') s0 += 1
    while (e0 > s0 && raw.charAt(e0 - 1) == ' ') e0 -= 1
    val s = raw.substring(s0, e0).toLowerCase(java.util.Locale.ROOT)

    // split(-1) semantics: one token before/after/between separator runs
    val tokens = new java.util.ArrayList[String](64)
    var i = 0
    var tokStart = 0
    while (i < s.length) {
      if (ShingleHashes.isSepChar(s.charAt(i))) {
        tokens.add(s.substring(tokStart, i))
        while (i < s.length && ShingleHashes.isSepChar(s.charAt(i))) i += 1
        tokStart = i
      } else i += 1
    }
    tokens.add(s.substring(tokStart, s.length))

    val md = digests.get()
    val n = tokens.size
    val nBi = if (n >= 2) n - 1 else 0
    val arr = new Array[Long](n + nBi)
    i = 0
    while (i < n) { arr(i) = bucketOf(tokens.get(i), b, md); i += 1 }
    i = 0
    while (i < nBi) {
      arr(n + i) = bucketOf(tokens.get(i) + " " + tokens.get(i + 1), b, md)
      i += 1
    }
    new GenericArrayData(arr)
  }

  def apply(text: Column, b: Int): Column =
    GraftBridge.column(GramBuckets(GraftBridge.expression(text), b))
}
