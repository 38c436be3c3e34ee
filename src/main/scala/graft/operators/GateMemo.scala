package graft.operators

import org.apache.spark.sql.SparkSession

/** Key derivation for per-corpus trained-artifact memos (the BPE
  * vocabulary, the classifier weights): the trainer gate re-derives on
  * every call, the consumer gates reuse the artifact — but only for
  * the SAME corpus bytes. Keying on the path alone would serve a stale
  * artifact after an in-place regeneration of `documents.parquet`
  * within one JVM; folding in the file's (mtime, length) — for a
  * directory, its own mtime, which changes on any child add/remove —
  * invalidates across regens. A stamp failure (missing table, FS
  * error) degrades to the bare path: worst case a recompute, never a
  * wrong reuse for a stamped corpus. */
private[operators] object GateMemo {
  def corpusKey(spark: SparkSession, dir: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
      val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p)
      s"$dir@${st.getModificationTime}:${st.getLen}"
    } catch { case scala.util.control.NonFatal(_) => dir }
}
