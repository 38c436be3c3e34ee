package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 rehearsal data builder (VERDICT r3 ask #10): replicates a
  * testdata directory `factor`× with FK-consistent key offsets so
  * Bench can run at 10× rows and BASELINE.md can record empirical
  * per-query scaling exponents — the cheapest off-toy check that the
  * "100× safe" plan claims hold.
  *
  * Key surgery per replica k (offset = k × 10^9, far above any sf0.1
  * key): every PK and the FKs that point at a replicated table shift
  * together, so join fan-outs stay exactly 1:1 with the original;
  * `region`/`nation` are fixed-size dims in TPC-H and are copied
  * unchanged (FKs to them keep their values). Replica documents get a
  * ` r<k>` text salt: near-dup (not byte-equal) copies, so dedup
  * workloads see realistic 10-clique clusters instead of degenerate
  * exact ones while exact-dedup load stays the original's.
  *
  * Usage: ScaleUp <srcDir> <dstDir> <factor> [tables]
  * `tables` (optional, comma-separated) restricts replication to a
  * subset — the ×100 sketch/LM rehearsal needs only `documents`, and
  * replicating 60M lineitem rows alongside would be pure waste.
  */
object ScaleUp {

  private val Offset = 1000000000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def replicate(df: DataFrame, keys: Seq[String], factor: Int,
                saltTextCol: Option[String] = None): DataFrame = {
    if (keys.isEmpty) return df
    val spark = df.sparkSession
    val reps = spark.range(factor.toLong).toDF("__k")
    val fanned = df.crossJoin(reps)
    val keyed = keys.foldLeft(fanned) { (acc, k) =>
      acc.withColumn(k, (col(k) + col("__k") * Offset).cast("long"))
    }
    val salted = saltTextCol.fold(keyed) { t =>
      keyed.withColumn(t,
        when(col("__k") > 0, concat(col(t), lit(" r"), col("__k")))
          .otherwise(col(t)))
    }
    salted.drop("__k")
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    val only = args.lift(3).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts is TIMESTAMP(NANOS); read it as raw long (the replica
    // then carries a bigint ts column, which graft.Tables.events
    // handles identically to the original nanos — see Tables.scala)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for ((table, keys) <- keyCols if only.forall(_.contains(table))) {
      val in = spark.read.parquet(s"$src/$table.parquet")
      val salt = if (table == "documents") Some("text") else None
      replicate(in, keys, factor, salt)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"scaled $table x$factor")
    }
    spark.stop()
  }
}
