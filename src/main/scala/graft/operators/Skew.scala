package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's runtime skew-join split (`spark.sql.adaptive.skewJoin`, on in
  * the driver mains) is the first line of defense — it splits oversized
  * SORT-MERGE partitions after the map stage. Salting is the explicit
  * fallback for the cases AQE does not cover: hash joins it declines to
  * split, skew appearing only after a filter AQE cannot see through,
  * or engines/configs where AQE is off. A 90%-one-key fact table sends
  * 90% of rows through one reducer without it — the straggler that
  * turns a 10-minute cluster job into a 9-hour one.
  */
object Skew {

  /** Salted inner equi-join: each left row gets a salt in [0, salts),
    * the right side is replicated `salts` times, and the join key
    * becomes (keys…, salt) — a hot key's rows spread over `salts`
    * reducers instead of one. Result is row-identical to
    * `left.join(right, keys)` for any salt assignment. The salt must
    * be DETERMINISTIC (a function of the row, not
    * monotonically_increasing_id/rand): the salt is part of the
    * shuffle key, and a nondeterministic one re-deals rows differently
    * when a lost map stage is recomputed, mixing attempt outputs into
    * duplicated/missing join rows (the SPARK-23207 corruption class) —
    * so it hashes the left row's hashable columns (maps are excluded —
    * Spark's hash() rejects MapType). Identical left rows share a
    * salt, so a hot key made of byte-identical copies still lands on
    * one reducer — exact-dedup such rows first, or include a unique id
    * column. Right-side replication costs |right|·salts — use for
    * non-broadcastable right sides only (a broadcastable dim never
    * needs salting). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // recursive: hash() also rejects maps NESTED in structs/arrays
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case _: MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: ArrayType => hasMap(a.elementType)
        case _ => false
      }
    }
    val hashable = left.schema.fields
      .filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    require(hashable.nonEmpty, "saltedJoin needs at least one map-free column")
    val l = left.withColumn("__salt", pmod(hash(hashable: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted distinct-count: groupBy (keys, salt-of-value)
    * counts distinct per shard, then sums — count_distinct's exact
    * per-key shuffle spreads over `salts` reducers per hot key.
    * Identical result to groupBy(keys).agg(count_distinct(valueCol)):
    * the salt partitions VALUES, so per-shard distinct sets are
    * disjoint and their sizes add. */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
                          salts: Int, out: String): DataFrame = {
    require(salts > 0, "salts must be positive")
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ pmod(hash(col(valueCol)), lit(salts)).as("__salt"): _*)
      .agg(count_distinct(col(valueCol)).as("__part"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__part")).as(out))
  }
}
