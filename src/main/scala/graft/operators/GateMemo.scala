package graft.operators

import org.apache.spark.sql.SparkSession

/** Key derivation for per-corpus trained-artifact memos (the BPE
  * vocabulary, the classifier weights): the trainer gate re-derives on
  * every call, the consumer gates reuse the artifact — but only for
  * the SAME corpus bytes. Keying on the path alone would serve a stale
  * artifact after an in-place regeneration of `documents.parquet`
  * within one JVM; folding in the file's (mtime, length) — for a
  * directory, its own mtime, which changes on any child add/remove —
  * invalidates across regens.
  *
  * A stamp failure (missing table, FS error) returns None — NO memo:
  * the caller retrains and must not store the result. Degrading to the
  * bare path instead would let two consecutive stamp failures around
  * an in-place regeneration reuse the pre-regen artifact; a recompute
  * is the safe worst case, a wrong reuse is not. */
private[operators] object GateMemo {
  def corpusKey(spark: SparkSession, dir: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
      val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p)
      Some(s"$dir@${st.getModificationTime}:${st.getLen}")
    } catch { case scala.util.control.NonFatal(_) => None }
}
