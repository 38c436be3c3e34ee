package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Custom Catalyst scalar kernels for the vector-retrieval core.
  *
  * The reference engine delegates these to Qdrant: cosine/dot similarity
  * for dense retrieval (reference `src/storage/vector_store.py:230-273`,
  * normalized embeddings so cosine == dot, `src/embeddings/
  * dense_embedder.py:55-74`) and MaxSim late interaction for multi-vector
  * retrieval (`src/embeddings/colpali_embedder.py:136-169`,
  * `src/storage/vector_store.py:384-394`). Here they are whole-stage
  * codegen'd Catalyst expressions so the scoring loop runs fused inside
  * the scan-project stage — no UDF boxing, no shuffle, no row
  * materialization between filter and score.
  */

/** dot(a, b): Σ a_i * b_i over array<double> (float inputs are cast by
  * the analyzer via ExpectsInputTypes). Length mismatch uses min length.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (||a|| * ||b||); 0.0 when either norm is 0. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i); double $y = $b.getDouble($i);
         |  $d += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** maxsim(query, doc): Σ over query rows of max over doc rows of
  * dot(queryRow, docRow) — ColPali late interaction (reference
  * `src/embeddings/colpali_embedder.py:136-169`). Inputs are
  * array<array<double>>; an empty doc side contributes 0.
  */
case class MaxSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "maxsim"

  override def nullSafeEval(q: Any, d: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val da = d.asInstanceOf[ArrayData]
    val nq = qa.numElements(); val nd = da.numElements()
    var total = 0.0
    var qi = 0
    while (qi < nq) {
      val qv = qa.getArray(qi)
      val dim = qv.numElements()
      var best = Double.NegativeInfinity
      var di = 0
      while (di < nd) {
        val dv = da.getArray(di)
        val n = math.min(dim, dv.numElements())
        var s = 0.0; var i = 0
        while (i < n) { s += qv.getDouble(i) * dv.getDouble(i); i += 1 }
        if (s > best) best = s
        di += 1
      }
      if (nd > 0) total += best
      qi += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, d) => {
      val nq = ctx.freshName("nq"); val nd = ctx.freshName("nd")
      val total = ctx.freshName("total"); val qi = ctx.freshName("qi")
      val qv = ctx.freshName("qv"); val dim = ctx.freshName("dim")
      val best = ctx.freshName("best"); val di = ctx.freshName("di")
      val dv = ctx.freshName("dv"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |int $nq = $q.numElements(); int $nd = $d.numElements();
         |double $total = 0.0;
         |for (int $qi = 0; $qi < $nq; $qi++) {
         |  $ad $qv = $q.getArray($qi);
         |  int $dim = $qv.numElements();
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $di = 0; $di < $nd; $di++) {
         |    $ad $dv = $d.getArray($di);
         |    int $n = java.lang.Math.min($dim, $dv.numElements());
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $qv.getDouble($i) * $dv.getDouble($i);
         |    }
         |    if ($s > $best) $best = $s;
         |  }
         |  if ($nd > 0) $total += $best;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_buckets(vec, tables, bits): array<long> of `tables` LSH
  * bucket ids for random-hyperplane (sign) LSH over array<double>.
  * Hyperplane p (p = table*bits + bit) has deterministic ±1 components
  * w_p[j] = ((((p+1)*2654435761 + (j+1)*40503) >> 13) & 1)*2 − 1, so
  * the same buckets are computable in plain integer SQL (DuckDB twin in
  * [[VectorFunctions.hyperplaneBucketsSql]]). Bucket bit i of table t is
  * set iff dot(vec, w_{t*bits+i}) > 0 (sequential-order summation —
  * bit-for-bit reproducible). Cosine-similar vectors collide with high
  * probability; the retrieval path (operators.AnnKnn) equi-joins on
  * (table, bucket) instead of scanning the corpus. Replaces the
  * reference's HNSW role (`src/storage/vector_store.py:136-146`).
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(tables > 0 && bits > 0 && bits <= 62)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(in: Any): Any = {
    val x = in.asInstanceOf[ArrayData]
    val d = x.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        val p = t * bits + i
        var s = 0.0
        var j = 0
        while (j < d) {
          val w = ((((p + 1) * 2654435761L + (j + 1) * 40503L) >> 13) & 1L) * 2L - 1L
          s += x.getDouble(j) * w
          j += 1
        }
        if (s > 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val d = ctx.freshName("d"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      s"""
         |int $d = $x.numElements();
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    int $p = $t * $bits + $i;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $d; $j++) {
         |      long $w = (((($p + 1) * 2654435761L + ($j + 1) * 40503L) >> 13) & 1L) * 2L - 1L;
         |      $s += $x.getDouble($j) * $w;
         |    }
         |    if ($s > 0) $bucket |= (1L << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  // AbstractDataType (ExpectsInputTypes) is private[sql], so input
  // normalization to array<double> happens here in the wrappers instead
  // of via implicit analyzer casts.
  private def vec(c: Column): Column = c.cast("array<double>")
  private def mat(c: Column): Column = c.cast("array<array<double>>")

  /** Exact dot product as a codegen'd Column. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(vec(a)), Bridge.expression(vec(b))))

  /** Cosine similarity as a codegen'd Column. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(vec(a)), Bridge.expression(vec(b))))

  /** ColPali MaxSim late-interaction score as a codegen'd Column. */
  def maxsim(q: Column, d: Column): Column =
    Bridge.column(MaxSim(Bridge.expression(mat(q)), Bridge.expression(mat(d))))

  /** Random-hyperplane LSH bucket ids (one per table) as a codegen'd
    * Column: array<long> of length `tables`. */
  def hyperplaneBuckets(v: Column, tables: Int, bits: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec(v)), tables, bits))

  /** JVM twin of [[hyperplaneBuckets]] for driver-side query vectors
    * (byte-identical to the column/codegen forms) — lets the ANN store
    * read path compute its probe buckets without a Spark job and turn
    * them into a static partition filter. */
  def hyperplaneBucketsJvm(v: Array[Double], tables: Int, bits: Int): Array[Long] = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        val p = t * bits + i
        var s = 0.0
        var j = 0
        while (j < v.length) {
          val w = ((((p + 1) * 2654435761L + (j + 1) * 40503L) >> 13) & 1L) * 2L - 1L
          s += v(j) * w
          j += 1
        }
        if (s > 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** Per-plane signed margins for a query vector — the projection
    * values whose signs form [[hyperplaneBucketsJvm]]'s buckets.
    * `out(t)(i)` is plane (t·bits+i)'s projection; |margin| near zero
    * marks the bits most likely to disagree between a query and its
    * true neighbors — exactly the bits multi-probe LSH flips first. */
  def hyperplaneMarginsJvm(v: Array[Double], tables: Int,
                           bits: Int): Array[Array[Double]] = {
    val out = Array.ofDim[Double](tables, bits)
    var t = 0
    while (t < tables) {
      var i = 0
      while (i < bits) {
        val p = t * bits + i
        var s = 0.0
        var j = 0
        while (j < v.length) {
          val w = ((((p + 1) * 2654435761L + (j + 1) * 40503L) >> 13) & 1L) * 2L - 1L
          s += v(j) * w
          j += 1
        }
        out(t)(i) = s
        i += 1
      }
      t += 1
    }
    out
  }

  /** JVM twin of [[dot]] — same left-to-right accumulation order as
    * the codegen kernel, so results are bit-identical. Used by the
    * driver-side ANN probe selection (ranking a k-row quantizer must
    * agree with the column form to the last ulp, or probe sets drift
    * between the JVM and SQL twins). */
  def dotJvm(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** JVM twin of Spark's `round(x, 6)` (BigDecimal HALF_UP — NOT
    * banker's rounding, which `math.rint` would give). */
  def round6Jvm(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** DuckDB-SQL twin of [[hyperplaneBuckets]] for one table id `t`
    * (a BIGINT SQL expression/column reference), over a DOUBLE[] column
    * expression `vec` of dimension `dim`. */
  def hyperplaneBucketSql(vec: String, t: String, dim: Int, bits: Int): String =
    s"""CAST(list_sum(list_transform(range($bits), i ->
       |  CASE WHEN list_dot_product($vec, list_transform(range($dim), j ->
       |    CAST(((((($t*$bits + i) + 1)*2654435761 + (j+1)*40503) >> 13) & 1)*2 - 1 AS DOUBLE))) > 0
       |  THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT)""".stripMargin.replaceAll("\n\\s*", " ")
}
