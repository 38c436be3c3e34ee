package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenizer kernel: maximal runs of non-ASCII-whitespace
  * characters, byte-identical to
  * `filter(split(trim(c), "\s+"), t => length(t) > 0)` (Java-regex
  * `\s` = the six ASCII whitespace chars; `trim`'s removed spaces only
  * ever produce empty fragments the filter drops anyway). One char
  * scan instead of a regex split per row — this feeds the langid /
  * quality / token-count / fingerprint / chunker family. */
object WsTokensKernel {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokenize(in: UTF8String): ArrayData = {
    val s = in.toString
    val n = s.length
    val out = new java.util.ArrayList[Object]()
    var i = 0
    var start = -1
    while (i <= n) {
      if (i < n && !isWs(s.charAt(i))) {
        if (start < 0) start = i
      } else if (start >= 0) {
        out.add(UTF8String.fromString(s.substring(start, i)))
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** ws_tokens(text): array<string> — see [[WsTokensKernel]]. */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(in: Any): Any =
    WsTokensKernel.tokenize(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.WsTokensKernel.tokenize($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Language-ID kernel: per-language function-word hit counts + the
  * priority argmax, in one pass over the token array. Byte-identical
  * to the column program it replaced (per-language
  * `size(filter(toks, array_contains(words, t)))` + nested whens; the
  * DuckDB oracle twin is still generated from that declarative form,
  * parity pinned by spec). A token in several languages' lists counts
  * for each, exactly as the per-language filters did. */
object LangIdKernel {
  private val langs: Array[String] = TextFunctions.langWords.map(_._1).toArray
  private val wordLang: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for ((lang, words) <- TextFunctions.langWords; w <- words) {
      val i = langs.indexOf(lang)
      val prev = m.get(w)
      m.put(w, if (prev == null) Array(i) else prev :+ i)
    }
    m
  }
  private val und = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)

  def eval(toks: ArrayData): UTF8String = {
    val counts = new Array[Int](langs.length)
    var total = 0
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val tok = toks.getUTF8String(i) // null element = no hit, as in the
      val hit = if (tok == null) null else wordLang.get(tok.toString) // filter program
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; total += 1; j += 1 }
      }
      i += 1
    }
    if (total == 0) return und
    // first language (priority order) whose count >= max of later ones
    var best = langs.length - 1
    var k = langs.length - 2
    while (k >= 0) {
      if (counts(k) >= counts(best)) best = k
      k -= 1
    }
    langU8(best)
  }
}

/** lang_id(toks): string — see [[LangIdKernel]]. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  override def nullSafeEval(in: Any): Any =
    LangIdKernel.eval(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.LangIdKernel.eval($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC kernel: canonical composition via the JDK's
  * `java.text.Normalizer` — both the JVM and DuckDB's `nfc_normalize`
  * implement the Unicode-conformant NFC transform, so outputs are
  * byte-identical for any valid input (the parity foundation for the
  * text-normalization operator, [[graft.operators.Clean]]). The
  * already-normalized fast path (`isNormalized`, a scan without
  * allocation) matters because real corpora are overwhelmingly NFC. */
object NfcKernel {
  def eval(in: UTF8String): UTF8String = {
    val s = in.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) in
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** nfc_normalize(text): string — see [[NfcKernel]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(in: Any): Any =
    NfcKernel.eval(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NfcKernel.eval($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
