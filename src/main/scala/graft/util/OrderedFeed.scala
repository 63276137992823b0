package graft.util

import org.apache.spark.sql.DataFrame

/** The arrival-determinism contract every chunked-backlog fixture
  * relies on, in ONE place: `FileStreamSource` admits files in
  * mod-time order, so writing chunk k as a single file stamped
  * `base + k` minutes pins stream arrival order to chunk order. Used
  * by the crash/restart splits (events by ts percentile, documents by
  * doc_id), the versioned-view chains (one shard per commit), the CDF
  * feeds (one delta per version), and the streamed index growth (one
  * residue class per batch).
  */
object OrderedFeed {

  /** Write `df` as one parquet file at `dir`, mod-time pinned to
    * `base + k` minutes. Chunks of one feed may share a `base` or use
    * the per-call default — the 60 s spacing dominates loop latency
    * either way, so ordering stays strict.
    */
  def writeChunk(dir: String, k: Int, df: DataFrame,
      base: Long = System.currentTimeMillis() - 3600000L): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(_.setLastModified(base + k * 60000L))
  }
}
