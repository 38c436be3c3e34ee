package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Relational

/** Ad-hoc q01 latency profile (diagnostics only). */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("read count") {
      graft.Tables(spark, sfDir, "lineitem").count()
    }
    time("q01 cold") {
      Relational.pricingSummary(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time("q01 warm") {
      Relational.pricingSummary(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time("q01 warm2") {
      Relational.pricingSummary(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    Relational.pricingSummary(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
