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

  override def nullSafeEval(q: Any, d: Any): Any =
    MaxSim.compute(MaxSim.toMatrix(q.asInstanceOf[ArrayData]),
      MaxSim.toMatrix(d.asInstanceOf[ArrayData]))

  // Both sides are unpacked to primitive double[][] ONCE per row and
  // the hot triple loop runs on plain arrays: the naive per-pair
  // `getArray` form allocates an ArrayData wrapper per (query patch ×
  // doc patch) — 33k/page at the real 32×1030 ColPali shape — and its
  // virtual per-element reads defeat JIT vectorization (measured 5×
  // slower on the maxsim_stress bench).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, d) => {
      val ms = "graft.functions.MaxSim"
      s"${ev.value} = $ms.compute($ms.toMatrix($q), $ms.toMatrix($d));"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Primitive MaxSim kernels, shared by the interpreted and codegen
  * paths (codegen calls these via the companion's static forwarders).
  */
object MaxSim {
  import org.apache.spark.unsafe.Platform

  def toMatrix(a: ArrayData): Array[Array[Double]] = {
    val n = a.numElements()
    val out = new Array[Array[Double]](n)
    var i = 0
    while (i < n) { out(i) = a.getArray(i).toDoubleArray(); i += 1 }
    out
  }

  def compute(q: Array[Array[Double]], d: Array[Array[Double]]): Double = {
    var total = 0.0
    var qi = 0
    while (qi < q.length) {
      val qv = q(qi)
      var best = Double.NegativeInfinity
      var di = 0
      while (di < d.length) {
        val dv = d(di)
        val n = math.min(qv.length, dv.length)
        var s = 0.0; var i = 0
        while (i < n) { s += qv(i) * dv(i); i += 1 }
        if (s > best) best = s
        di += 1
      }
      if (d.length > 0) total += best
      qi += 1
    }
    total
  }

  /** Row-major f32 packing of a patch matrix: `rows × dim` floats,
    * native byte order (pack and score always run on the same
    * worker arch; the bytes are an interchange format only between
    * these two kernels). Short rows zero-pad, long rows truncate. */
  def packF32(m: Array[Array[Double]], dim: Int): Array[Byte] = {
    val out = new Array[Byte](m.length * dim * 4)
    var off = Platform.BYTE_ARRAY_OFFSET.toLong
    var r = 0
    while (r < m.length) {
      val row = m(r)
      var i = 0
      while (i < dim) {
        Platform.putFloat(out, off,
          if (i < row.length) row(i).toFloat else 0.0f)
        off += 4; i += 1
      }
      r += 1
    }
    out
  }

  /** MaxSim against a [[packF32]]-packed doc side: one blob read per
    * page instead of per-patch array decode — the layout the page
    * store uses at scale. */
  def computePacked(q: Array[Array[Double]], d: Array[Byte], dim: Int): Double = {
    val rows = d.length / (4 * dim)
    val base = Platform.BYTE_ARRAY_OFFSET.toLong
    var total = 0.0
    var qi = 0
    while (qi < q.length) {
      val qv = q(qi)
      val n = math.min(qv.length, dim)
      var best = Double.NegativeInfinity
      var r = 0
      while (r < rows) {
        val rowOff = base + r.toLong * dim * 4
        var s = 0.0; var i = 0
        while (i < n) { s += qv(i) * Platform.getFloat(d, rowOff + i * 4); i += 1 }
        if (s > best) best = s
        r += 1
      }
      if (rows > 0) total += best
      qi += 1
    }
    total
  }
}

/** pack_f32(patches, dim): row-major float32 binary packing of an
  * array<array<double>> patch matrix — the write-side half of the
  * packed page-store layout. At the real ColPali shape the nested
  * parquet layout costs ~20× the MaxSim math in decode alone (per-
  * element offset/definition levels over 132k values/page); a single
  * binary cell decodes as one blob and halves the bytes (f32 vs f64).
  */
case class PackF32(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(dim > 0)

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_f32"

  override def nullSafeEval(in: Any): Any =
    MaxSim.packF32(MaxSim.toMatrix(in.asInstanceOf[ArrayData]), dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ms = "graft.functions.MaxSim"
      s"${ev.value} = $ms.packF32($ms.toMatrix($x), $dim);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** maxsim_f32(q, packed, dim): [[MaxSim]] where the doc side is a
  * [[PackF32]] binary cell. Scores differ from the f64 form only by
  * f32 rounding of the stored patches (≈1e-7 relative). */
case class MaxSimF32(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {
  require(dim > 0)

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "maxsim_f32"

  override def nullSafeEval(q: Any, d: Any): Any =
    MaxSim.computePacked(MaxSim.toMatrix(q.asInstanceOf[ArrayData]),
      d.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, d) => {
      val ms = "graft.functions.MaxSim"
      s"${ev.value} = $ms.computePacked($ms.toMatrix($q), $d, $dim);"
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

  /** Row-major f32 binary packing of a patch matrix — the write side
    * of the packed page-store layout (see [[PackF32]]). */
  def packF32(patches: Column, dim: Int): Column =
    Bridge.column(PackF32(Bridge.expression(mat(patches)), dim))

  /** MaxSim where the doc side is a [[packF32]]-packed binary cell. */
  def maxsimF32(q: Column, packed: Column, dim: Int): Column =
    Bridge.column(MaxSimF32(Bridge.expression(mat(q)),
      Bridge.expression(packed.cast("binary")), dim))

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
