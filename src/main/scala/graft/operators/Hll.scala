package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
  * dataset-statistics op a 100 TB pipeline runs instead of
  * `COUNT(DISTINCT …)`: per-source document cardinality, vocabulary
  * size, user counts, all in one map pass + an m-row-per-group
  * aggregation, with NO global distinct shuffle and a MERGEABLE
  * register table (max per bucket), so per-shard / per-day sketches
  * roll up without touching rows again — the same mergeability
  * argument as [[Curation.approxTokenQuantiles]]' t-digest.
  *
  * Engine-exact by construction (unlike `approx_count_distinct`,
  * whose sketch is engine-private): registers derive from the
  * portable [[TextFunctions.hash56]] — bucket = low p bits, rho =
  * leading-zero rank of the remaining W = 56−p bits — and the
  * harmonic-mean denominator Σ 2^(−M_j) is kept in INTEGER arithmetic
  * (Σ 2^(G−M_j) as a BIGINT, G = W+1, max m·2^G = 2^57 < 2^63), so
  * both engines sum exactly in any order. Only the final constant
  * multiply / ln touch floats, on identical operands, rounded to 4
  * decimals for the gate. Small-range bias uses linear counting per
  * the paper (raw ≤ 2.5m with empty registers); the 56-bit hash makes
  * the large-range collision correction moot (documented, omitted).
  */
object Hll {

  /** Gate-scale precision: p=6 → m=64 registers (±13% rse) keeps the
    * oracle readable and exercises BOTH estimator branches at the
    * gate SFs (per-source groups land in linear counting, the global
    * group in the raw harmonic path). Production p=14 (±0.8%) changes
    * only these constants. */
  val P = 6
  val M: Int = 1 << P          // registers per group
  val W: Int = 56 - P          // rho field width
  val G: Int = W + 1           // scaled-exponent ceiling (mj ≤ G)
  /** α_64 from the paper's table (m=64). */
  val Alpha = 0.709
  /** Numerator α·m²·2^G as ONE double literal, computed once and
    * embedded verbatim in both engines — no cross-engine product
    * re-association. */
  val RawNum: Double = Alpha * M * M * math.pow(2.0, G)

  /** Register table: (grp, bucket, mj). One map pass + one
    * (grp,bucket)-grouped max — partial-agg'd map-side. */
  def sketch(df: DataFrame, grpCol: Column, valueCol: Column): DataFrame = {
    val h = TextFunctions.hash56(valueCol)
    df.select(grpCol.as("grp"), h.as("h"))
      .select(col("grp"), (col("h") % M).as("bucket"),
        shiftright(col("h"), P).as("r"))
      .select(col("grp"), col("bucket"),
        when(col("r") === 0, lit(G))
          .otherwise(lit(G) - length(bin(col("r")))).as("rho"))
      .groupBy("grp", "bucket").agg(max(col("rho")).as("mj"))
  }

  /** Merge sketches into one group (register-wise max) — the roll-up
    * path: per-shard sketches → corpus sketch, no re-scan. */
  def merge(sk: DataFrame, grp: String): DataFrame =
    sk.groupBy("bucket").agg(max(col("mj")).as("mj"))
      .select(lit(grp).as("grp"), col("bucket"), col("mj"))

  /** Estimates from a register table: raw harmonic mean, linear
    * counting when raw ≤ 2.5m and empty registers remain. */
  def estimate(sk: DataFrame): DataFrame = {
    val twoG = 1L << G
    val s = col("s_present") + (lit(M.toLong) - col("cnt")) * lit(twoG)
    val v = lit(M.toLong) - col("cnt") // empty registers
    val raw = lit(RawNum) / s.cast("double")
    sk.groupBy("grp").agg(
        sum(pow(lit(2.0), lit(G) - col("mj")).cast("long")).as("s_present"),
        count(lit(1)).as("cnt"))
      .select(col("grp"),
        round(when(raw <= lit(2.5 * M) && v > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double")))
          .otherwise(raw), 4).as("hll_estimate"))
  }

  // ---- gate query --------------------------------------------------------

  /** q108: per-source distinct-text cardinality plus a merged global
    * row ('__all__' — register-wise max of the per-source sketches,
    * not a second corpus pass), each next to its exact twin. */
  def distinctGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("source"), col("text"))
    val sk = sketch(docs, col("source"), col("text")).cache()
    val est = estimate(sk.union(merge(sk, "__all__")))
    val exact = docs.groupBy(col("source").as("grp"))
      .agg(countDistinct(col("text")).as("exact_distinct"))
      .union(docs.agg(countDistinct(col("text")).as("exact_distinct"))
        .select(lit("__all__").as("grp"), col("exact_distinct")))
    exact.join(est, "grp").orderBy("grp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_hll_distinct" -> (distinctGate _))

  // ---- oracle SQL --------------------------------------------------------

  private def estSql(skCte: String): String =
    s"""SELECT grp, round(CASE WHEN $RawNum / CAST(s AS DOUBLE) <= ${2.5 * M}
       |      AND v > 0
       |    THEN $M.0 * ln($M.0 / CAST(v AS DOUBLE))
       |    ELSE $RawNum / CAST(s AS DOUBLE) END, 4) AS hll_estimate
       |  FROM (SELECT grp,
       |      SUM(CAST(power(2, $G - mj) AS BIGINT))
       |        + ($M - COUNT(*)) * CAST(power(2, $G) AS BIGINT) AS s,
       |      $M - COUNT(*) AS v
       |    FROM $skCte GROUP BY grp)""".stripMargin

  private def distinctOracle: String = {
    val h = TextFunctions.hash56Sql("text")
    s"""WITH v AS (SELECT source AS grp, $h AS h FROM documents),
       |sk AS (SELECT grp, h % $M AS bucket,
       |    MAX(CASE WHEN h // $M = 0 THEN $G
       |      ELSE $G - length(bin(h // $M)) END) AS mj
       |  FROM v GROUP BY grp, bucket),
       |skall AS (SELECT '__all__' AS grp, bucket, MAX(mj) AS mj
       |  FROM sk GROUP BY bucket),
       |est AS (${estSql("(SELECT * FROM sk UNION ALL SELECT * FROM skall)")}),
       |exact AS (SELECT source AS grp, COUNT(DISTINCT text) AS exact_distinct
       |    FROM documents GROUP BY source
       |  UNION ALL SELECT '__all__', COUNT(DISTINCT text) FROM documents)
       |SELECT exact.grp, exact.exact_distinct, est.hll_estimate
       |FROM exact JOIN est USING(grp) ORDER BY grp""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q108_hll_distinct" -> distinctOracle)
}
