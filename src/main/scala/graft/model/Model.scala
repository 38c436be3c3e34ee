package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core data model (SURVEY §1.1): the unified in-flight chunk record and
  * tenant scoping. Mirrors the reference's `UnifiedChunk`
  * (`src/chunking/unified_chunk.py:76-143`) — identity, position,
  * hierarchy, tenant fields (organization_id required), document
  * context, quality/strategy, open metadata — as one case class /
  * `Dataset[UnifiedChunk]`; the per-store projections become selects.
  */
case class UnifiedChunk(
    id: String,
    document_id: String,
    text: String,
    chunk_index: Int,
    page_number: Option[Int] = None,
    char_start: Option[Int] = None,
    char_end: Option[Int] = None,
    token_count: Option[Int] = None,
    level: String = "paragraph", // document|section|paragraph|sentence|table|figure
    parent_id: Option[String] = None,
    section_title: Option[String] = None,
    section_number: Option[String] = None,
    organization_id: String = "default",
    workspace_id: Option[String] = None,
    collection_id: Option[String] = None,
    access_level: String = "internal",
    document_type: Option[String] = None,
    filename: Option[String] = None,
    element_type: Option[String] = None,
    quality_level: Option[String] = None,
    chunk_strategy: Option[String] = None,
    metadata: Map[String, String] = Map.empty)

object ChunkLevel {
  val Document = "document"
  val Section = "section"
  val Paragraph = "paragraph"
  val Sentence = "sentence"
  val Table = "table"
  val Figure = "figure"
}

object AccessLevel {
  val Public = "public"
  val Internal = "internal"
  val Restricted = "restricted"
  val Confidential = "confidential"
  val order: Seq[String] = Seq(Public, Internal, Restricted, Confidential)
}

/** Tenant context (reference `src/metadata/tenant_schema.py:35-74`):
  * organization_id is mandatory and injected into every query; optional
  * workspace/collection narrowing; access ceiling. */
case class TenantContext(
    organizationId: String,
    workspaceId: Option[String] = None,
    collectionId: Option[String] = None,
    maxAccessLevel: String = AccessLevel.Confidential) {
  require(organizationId != null && organizationId.length >= 3,
    "organization_id must be at least 3 chars (tenant_schema.py:48)")

  /** The allowed access levels up to the ceiling. */
  def allowedAccess: Seq[String] =
    AccessLevel.order.takeWhile(_ != maxAccessLevel) :+ maxAccessLevel
}

/** Filter compiler (F2/F3, reference `vector_store.py:275-305` +
  * `tenant_schema.py:61-74`): dict-style filters → one AND-ed Column.
  * Values: exact match, Seq ⇒ membership, (lo,hi) range ⇒ gte/lte.
  */
object Filters {
  sealed trait Pred
  case class Eq(v: Any) extends Pred
  case class In(vs: Seq[Any]) extends Pred
  case class Range(gte: Option[Any] = None, lte: Option[Any] = None,
                   gt: Option[Any] = None, lt: Option[Any] = None) extends Pred

  def compile(filters: Map[String, Pred]): Column =
    filters.foldLeft(lit(true)) { case (acc, (k, pred)) =>
      val c = pred match {
        case Eq(v) => col(k) === lit(v)
        case In(vs) => col(k).isin(vs: _*)
        case Range(gte, lte, gt, lt) =>
          Seq(
            gte.map(v => col(k) >= lit(v)),
            lte.map(v => col(k) <= lit(v)),
            gt.map(v => col(k) > lit(v)),
            lt.map(v => col(k) < lit(v))).flatten
            .foldLeft(lit(true))(_ && _)
      }
      acc && c
    }

  /** Mandatory tenant scoping prepended to any user filter (F3):
    * applied BEFORE any index lookup so tenant isolation cannot be
    * bypassed by downstream operators. */
  def tenantScope(df: DataFrame, ctx: TenantContext): DataFrame = {
    val base = df.filter(col("organization_id") === ctx.organizationId)
    val ws = ctx.workspaceId.fold(base)(w => base.filter(col("workspace_id") === w))
    val cl = ctx.collectionId.fold(ws)(c => ws.filter(col("collection_id") === c))
    cl.filter(col("access_level").isin(ctx.allowedAccess: _*))
  }
}
