package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared lazy session for all suites (one JVM, Test/fork).
  *
  * SPARK_GRAFT_TEST_MASTER overrides the master — the multi-executor
  * smoke runs the store/stream suites under `local-cluster[2,8,4096]`
  * (2 separate executor JVMs) to catch single-JVM assumptions; pass
  * the compiled class dirs + test deps via SPARK_GRAFT_TEST_EXEC_CP so
  * the worker-launched executors can load graft classes and test
  * closures. */
object TestSpark {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_TEST_MASTER", "local[4]"))
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // listener events render the physical plan to a string on EVERY
      // action; deep composed lineages (the curate chain re-referenced
      // by BPE encoding) can reach GB-scale strings and OOM the driver
      // unless rendering is capped. 1M chars is plenty to debug with.
      .config("spark.sql.maxPlanStringLength", "1000000")
    sys.env.get("SPARK_GRAFT_TEST_EXEC_CP")
      .foreach(cp => b.config("spark.executor.extraClassPath", cp))
    val s = b.withExtensions(new GraftExtensions()(_)).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
}
