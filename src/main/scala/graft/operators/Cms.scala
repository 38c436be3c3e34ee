package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency
  * estimation for heavy hitters without materializing the long tail:
  * the third mergeable-sketch class next to the t-digest quantiles
  * ([[Curation.approxTokenQuantiles]]) and the HLL cardinalities
  * ([[Hll]]). At 100 TB the exact n-gram histogram (q65's shape) is a
  * shuffle whose reduce side carries BILLIONS of distinct keys; the
  * CMS carries d·w registers per partition — map-side combine
  * collapses each partition to ≤ d·w rows regardless of corpus size,
  * and register tables MERGE by plain addition (per-shard / per-day
  * sketches roll up without re-scanning).
  *
  * Engine-exact by construction: row hashes are the portable
  * [[TextFunctions.hash56]] over a salted key (`"i:" + item`), and
  * registers are INTEGER sums — both engines agree bit-for-bit, so
  * the q109 oracle replays sketch + query wholesale. The classic
  * guarantees hold untouched: estimates never undercount, overshoot
  * ≤ εN with probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  */
object Cms {

  /** Gate-scale dimensions: d=4 rows × w=1024 columns (ε ≈ 0.27%,
    * δ ≈ 1.8%). Production scales w with the tolerated εN, never with
    * the corpus. */
  val D = 4
  val Wd = 1024

  /** Row-hash family: ONE portable md5-based hash per item, then the
    * textbook pairwise-independent derivation c_i = ((a_i·h + b_i)
    * mod p) mod w over the Mersenne prime p = 2³¹−1 — cheap integer
    * mixing instead of d md5 evaluations per item (the first
    * implementation paid 4 md5s per trigram and was 4× slower at
    * sf1). Constants fixed for determinism; h < 2³¹ keeps a_i·h + b_i
    * inside a long. */
  private val HashA = Array(1664525L, 22695477L, 1103515245L, 69069L)
  private val HashB = Array(1013904223L, 1L, 12345L, 362437L)

  /** The d (i, c) probes from an ALREADY-MATERIALIZED hash column —
    * `h` must be a plain column reference, not the md5 expression:
    * the hash appears d times in this projection and Catalyst gives
    * struct fields no common-subexpression elimination (the q58
    * lesson), so inlining the md5 here evaluated it d times. */
  private def cellsFromH(h: Column): Column =
    array((0 until D).map(i =>
      struct(lit(i).as("i"),
        (((lit(HashA(i)) * h + HashB(i)) % TextFunctions.P31) % Wd)
          .as("c"))): _*)

  /** Register table (i, c, cnt) from one pass over `df[valueCol]`:
    * each item lands in one cell per row i; the (i,c) aggregation
    * partial-sums map-side. */
  def sketch(df: DataFrame, valueCol: Column): DataFrame =
    df.select(TextFunctions.hashMod(valueCol).as("h"))
      .select(explode(cellsFromH(col("h"))).as("rc"))
      .groupBy(col("rc.i").as("i"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge register tables: plain addition, the roll-up path. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ union _)
      .groupBy("i", "c").agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a candidate frame `items[itemCol]`: min over
    * the d probed registers (missing register → 0). The sketch side
    * is d·w rows — broadcast it, never shuffle the items. */
  def estimate(sk: DataFrame, items: DataFrame, itemCol: String): DataFrame =
    items.select(col(itemCol).as("item"),
        TextFunctions.hashMod(col(itemCol)).as("h"))
      .select(col("item"), explode(cellsFromH(col("h"))).as("rc"))
      .join(broadcast(sk),
        col("rc.i") === col("i") && col("rc.c") === col("c"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  // ---- gate query --------------------------------------------------------

  /** q109: CMS over the corpus trigram stream (q65's stream), point
    * estimates for the exact top-20 trigrams next to their exact
    * counts — the never-undercount contract is visible in the rows. */
  def heavyGate(spark: SparkSession, dir: String): DataFrame = {
    // toks MUST be staged in its own projection: inlining the
    // tokenizer into shingles' lambda (explode(shingles(wsTokens(…))))
    // re-evaluates it per shingle — measured 18 s vs 2.6 s at sf1 for
    // the identical stream (the q58 no-CSE-in-lambdas lesson; Generate
    // between the projections is what keeps them from collapsing)
    val grams = graft.Tables(spark, dir, "documents")
      .select(TextFunctions.wsTokens(lower(col("text"))).as("toks"))
      .select(explode(TextFunctions.shingles(col("toks"), 3)).as("ngram"))
    // the exact histogram exists only as the gate's verification twin
    // (at 100 TB only the sketch pass runs); cached because the tiny
    // result feeds both the estimate probe and the output join
    val top = grams.groupBy("ngram").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("ngram")).limit(20).cache()
    val sk = sketch(grams, col("ngram"))
    estimate(sk, top, "ngram")
      .join(top.withColumnRenamed("ngram", "item"), "item")
      .select(col("item").as("ngram"), col("exact_cnt"), col("cms_est"))
      .orderBy(col("exact_cnt").desc, col("ngram"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_cms_heavy" -> (heavyGate _))

  // ---- oracle SQL --------------------------------------------------------

  private def heavyOracle: String = {
    val tri = TextFunctions.shinglesSql("toks", 3)
    val wsLowerSql = TextFunctions.wsTokensSql("lower(text)")
    val abRows = (0 until D)
      .map(i => s"(${i}, ${HashA(i)}, ${HashB(i)})").mkString(", ")
    val p = TextFunctions.P31
    s"""WITH g AS (SELECT unnest($tri) AS ngram
       |  FROM (SELECT $wsLowerSql AS toks FROM documents)),
       |ab(i, a, b) AS (SELECT * FROM (VALUES $abRows)),
       |top AS (SELECT ngram, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM g
       |  GROUP BY ngram ORDER BY exact_cnt DESC, ngram LIMIT 20),
       |gh AS (SELECT ${TextFunctions.hashModSql("ngram")} AS h FROM g),
       |sk AS (SELECT ab.i, ((ab.a * gh.h + ab.b) % $p) % $Wd AS c,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM gh CROSS JOIN ab GROUP BY 1, 2),
       |est AS (SELECT t.item, MIN(COALESCE(sk.cnt, 0)) AS cms_est
       |  FROM (SELECT ngram AS item, ab.i,
       |      ((ab.a * ${TextFunctions.hashModSql("ngram")} + ab.b) % $p)
       |        % $Wd AS c
       |    FROM top CROSS JOIN ab) t
       |  LEFT JOIN sk ON t.i = sk.i AND t.c = sk.c
       |  GROUP BY t.item)
       |SELECT top.ngram, top.exact_cnt, est.cms_est
       |FROM top JOIN est ON top.ngram = est.item
       |ORDER BY top.exact_cnt DESC, top.ngram""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q109_cms_heavy" -> heavyOracle)
}
