package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Deterministic feature-hash embedder (I9 stand-in for the reference's
  * BGE model, `src/embeddings/dense_embedder.py:27-78`, per SURVEY §7
  * design stance): tokens → signed hash buckets → L2-normalized
  * array<double>. bucket = h mod dim, sign from bit 7 of h. Normalized
  * like the reference (`normalize_embeddings=True`), so cosine ≡ dot.
  * One-pass codegen'd kernel; same formula is expressible in DuckDB for
  * oracle checks.
  */
case class FeatureHashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "feature_hash_embed"

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val v = new Array[Double](dim)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      // floorMod: negative inputs must not index out of bounds (the
      // public wrapper accepts any array<bigint>)
      val b = java.lang.Math.floorMod(h, dim.toLong).toInt
      val sign = if (((h >> 7) & 1L) == 1L) 1.0 else -1.0
      v(b) += sign
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j) * v(j); j += 1 }
    // divide (not multiply-by-reciprocal): keeps the doubles bit-identical
    // with the SQL oracle's x / sqrt(S)
    if (norm > 0) {
      val s = math.sqrt(norm)
      j = 0
      while (j < dim) { v(j) /= s; j += 1 }
    }
    new GenericArrayData(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val v = ctx.freshName("v"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val b = ctx.freshName("b"); val norm = ctx.freshName("norm")
      val j = ctx.freshName("j"); val inv = ctx.freshName("inv")
      s"""
         |double[] $v = new double[$dim];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  int $b = (int) java.lang.Math.floorMod($h, ${dim}L);
         |  $v[$b] += ((($h >> 7) & 1L) == 1L) ? 1.0 : -1.0;
         |}
         |double $norm = 0.0;
         |for (int $j = 0; $j < $dim; $j++) { $norm += $v[$j] * $v[$j]; }
         |if ($norm > 0) {
         |  double $inv = java.lang.Math.sqrt($norm);
         |  for (int $j = 0; $j < $dim; $j++) { $v[$j] /= $inv; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($v);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmbedFunctions {
  /** Column form: token-hash array → normalized dim-dimensional embedding. */
  def featureHashEmbed(hashes: Column, dim: Int): Column =
    Bridge.column(FeatureHashEmbed(Bridge.expression(hashes.cast("array<bigint>")), dim))

  /** Driver-side twin for embedding query strings (same arithmetic as
    * the kernel + the portable hash56). */
  def embedQuery(tokens: Seq[String], dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    for (t <- tokens) {
      val h = TextFunctions.hash56Jvm(t)
      val b = java.lang.Math.floorMod(h, dim.toLong).toInt
      v(b) += (if (((h >> 7) & 1L) == 1L) 1.0 else -1.0)
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    if (norm > 0) v.map(_ / norm) else v
  }
}
