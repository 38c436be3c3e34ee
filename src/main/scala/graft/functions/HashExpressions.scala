package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** One-pass sketch kernels for large-scale dedup (training-data
  * pipeline ops). Both consume pre-hashed tokens/shingles (the portable
  * `TextFunctions.hashMod` 56-bit-md5-mod-2^31-1 hash) so their output
  * is reproducible by the DuckDB oracle with plain integer arithmetic.
  *
  * A HOF formulation (`transform(sequence(...), i -> array_min(...))`)
  * walks the token array k times and boxes every element; these
  * expressions do one O(n·k) / O(n·b) tight primitive loop inside
  * whole-stage codegen — the difference between hours and minutes on a
  * 100 TB dedup sweep.
  */

/** minhash_sig(hashes, k): array<long> of k min-hash values;
  * sig_i = min over h of ((2i+1)·h + 1299721·i + 7) mod (2^31-1).
  * Empty input ⇒ null (no signature for empty docs).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = ((2L * i + 1L) * h + 1299721L * i + 7L) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$k];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $hs.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ((2L * $i + 1L) * $h + 1299721L * $i + 7L) % ${P}L;
         |      if ($v < $sig[$i]) $sig[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash(hashes, bits): long whose bit b is set iff
  * Σ_tokens (((h >> b) & 1)·2 − 1) > 0. Empty input ⇒ 0.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 63)

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |int[] $counts = new int[$bits];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($counts[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** k-permutation min-hash signature over pre-modded hashes. */
  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes.cast("array<bigint>")), k))

  /** SimHash over pre-modded hashes (default 32 bits). */
  def simhash(hashes: Column, bits: Int = 32): Column =
    Bridge.column(SimHash(Bridge.expression(hashes.cast("array<bigint>")), bits))

  /** DuckDB-SQL twin of [[minhashSig]] (joined to a string for compare). */
  def minhashSigSql(hashes: String, k: Int): String =
    s"list_transform(range($k), i -> list_min(list_transform($hashes, h -> ((2*i + 1)*h + 1299721*i + 7) % 2147483647)))"

  /** DuckDB-SQL twin of [[simhash]]. */
  def simhashSql(hashes: String, bits: Int = 32): String =
    s"CAST(list_sum(list_transform(range($bits), b -> CASE WHEN list_sum(list_transform($hashes, h -> CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT)"
}
