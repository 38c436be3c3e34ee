package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * training-data-pipeline extensions) to a DataFrame job over the
  * testdata at `sfDir`; `oracleSql` carries the DuckDB-equivalent SQL
  * the driver uses as correctness oracle. Column names/aliases match
  * pairwise by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RetrievalPack.queries ++ TextPack.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ RetrievalPack.oracle ++ TextPack.oracle
}
