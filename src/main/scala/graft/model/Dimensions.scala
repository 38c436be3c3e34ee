package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tenant dimension tables (SURVEY §1.1: organizations / workspaces /
  * collections, reference `src/storage/metadata_store.py:131-173`,
  * `init.sql:110-149`) and the listing CRUD over them
  * (`metadata_store.py:779-796`).
  *
  * The reference "ensures" a dimension row exists before every write
  * (`ensure_organization`, `metadata_store.py:640-653`) — a
  * SELECT-then-INSERT per call. The batch-native equivalent: derive
  * the needed keys from the incoming data and upsert them in one
  * anti-join union per batch, so dimension maintenance is O(batch),
  * not O(rows) round-trips. Dims are tiny (thousands of orgs at most)
  * and broadcast wherever they join facts.
  */
object Dimensions {

  /** Empty organizations dim with the reference schema
    * (`init.sql:110-117`). */
  def emptyOrganizations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Boolean)]
      .toDF("id", "name", "is_active")
  }

  /** Get-or-create for a batch of organization ids (the distributed
    * `ensure_organization`): existing rows win, new ids get default
    * name = id, is_active = true. */
  def ensureOrganizations(existing: DataFrame, neededIds: DataFrame): DataFrame = {
    val fresh = neededIds.select(col("id").cast("string").as("id"))
      .filter(col("id").isNotNull) // null ids never match the anti-join
      .distinct()                  // and would append a dup row per call
      .join(existing.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("name"), lit(true).as("is_active"))
    existing.unionByName(fresh)
  }

  /** Get-or-create workspaces within organizations
    * (`metadata_store.py:655-668`): needed = (id, organization_id). */
  def ensureWorkspaces(existing: DataFrame, needed: DataFrame): DataFrame = {
    val fresh = needed
      .select(col("id").cast("string").as("id"),
        col("organization_id").cast("string").as("organization_id"))
      .filter(col("id").isNotNull)
      .distinct()
      .join(existing.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("organization_id"), col("id").as("name"),
        lit(true).as("is_active"))
    existing.unionByName(fresh)
  }

  /** Same shape for collections (id, organization_id, workspace_id). */
  def ensureCollections(existing: DataFrame, needed: DataFrame): DataFrame = {
    val fresh = needed
      .select(col("id").cast("string").as("id"),
        col("organization_id").cast("string").as("organization_id"),
        col("workspace_id").cast("string").as("workspace_id"))
      .filter(col("id").isNotNull)
      .distinct()
      .join(existing.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("organization_id"), col("workspace_id"),
        col("id").as("name"))
    existing.unionByName(fresh)
  }

  /** Derive + ensure the org dim straight from a chunk/document fact
    * table — the ingest-time hook ([[graft.ingest.Pipeline.ingest]]
    * callers pass bundle.chunks here). */
  def ensureFromFacts(existing: DataFrame, facts: DataFrame): DataFrame =
    ensureOrganizations(existing,
      facts.select(col("organization_id").as("id")))

  /** Soft delete (`is_active = false`) — the reference never hard-
    * deletes a tenant; facts cascade separately (I13). */
  def deactivate(dim: DataFrame, ids: Seq[String]): DataFrame =
    dim.withColumn("is_active",
      when(col("id").isin(ids: _*), lit(false)).otherwise(col("is_active")))

  /** Listing CRUD (F4, `metadata_store.py:779-796`): optional type /
    * status equality filters, newest-first, offset+limit — distributed
    * top-(offset+limit) then a window over that tiny slice, never a
    * global single-partition window (T7 stance). `docs` needs
    * (created_at, id) plus the filter columns. */
  def listDocuments(docs: DataFrame,
                    documentType: Option[String] = None,
                    status: Option[String] = None,
                    limit: Int = 100, offset: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filtered = Seq(
      documentType.map(t => col("document_type") === t),
      status.map(s => col("status") === s)).flatten
      .foldLeft(docs)(_ filter _)
    val w = Window.orderBy(col("created_at").desc, col("id"))
    filtered
      .orderBy(col("created_at").desc, col("id"))
      .limit(offset + limit)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > offset)
      .drop("__rn")
  }
}
