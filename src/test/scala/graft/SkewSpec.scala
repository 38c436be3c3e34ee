package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting utilities: result parity with the unsalted forms, and the
  * physical property that makes them worth it (the shuffle key gains
  * the salt column, so one hot key spans `salts` reducers). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90%-hot-key fact table joined to a 100-row dim
  private lazy val fact = spark.range(0, 10000)
    .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
      .as("k"), col("id").as("v"))
  private lazy val dim = spark.range(0, 100)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

  test("saltedJoin == plain join on a 90%-hot-key input") {
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
    assert(plain.count(_.getLong(0) == 7L) == 9000)
  }

  test("saltedJoin shuffles on (key, salt)") {
    // force a shuffle join — a broadcastable dim never needs salting
    val p = Skew.saltedJoin(fact, dim.hint("shuffle_hash"), Seq("k"), 8)
      .queryExecution.executedPlan.toString
    val partLine = p.linesIterator
      .find(l => l.contains("hashpartitioning(k")).getOrElse("")
    assert(partLine.contains("__salt"), p.take(2000))
  }

  test("saltedDistinctCount == exact count_distinct") {
    val df = spark.range(0, 5000)
      .select((col("id") % 3).as("g"), (col("id") % 417).as("u"))
    val exact = df.groupBy("g").agg(count_distinct(col("u")).as("n"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val salted = Skew.saltedDistinctCount(df, Seq("g"), "u", salts = 16, out = "n")
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(salted == exact)
  }
}
