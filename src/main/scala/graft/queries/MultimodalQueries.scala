package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.MultimodalOps

/** Driver-contract queries for the multimodal surface. Binary assets
  * are synthesized from the documents table (text → UTF-8 payload
  * bytes); the decode step is a deterministic stub
  * (MultimodalOps.decodeStub scaladoc) but byte length and content
  * digest are real and oracle-checkable.
  */
object MultimodalQueries {

  val defs: Map[String, QueryDef] = Map(

    // Binary payload plumbing: byte length + sha-256 digest per asset.
    "multimodal_meta" -> QueryDef(
      (s, d) => MultimodalOps.extractFeatures(
          MultimodalOps.assetsFromText(Tables.documents(s, d),
            "doc_id", "text"))
        .select("asset_id", "media_type", "n_bytes", "content_digest")
        .orderBy("asset_id"),
      Some("""SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  sha256(text) AS content_digest
        |FROM documents ORDER BY asset_id""".stripMargin)),

    // Frame sampling: rows generated plan-side from metadata (payload
    // never moves). Metadata is hash-derived → no SQL oracle;
    // frame-count arithmetic asserted in MultimodalSpec.
    "multimodal_frame_sample" -> QueryDef(
      (s, d) => {
        val assets = MultimodalOps.assetsFromText(
          Tables.documents(s, d), "doc_id", "text")
        MultimodalOps.sampleFrames(assets, fps = 1.0)
          .groupBy("asset_id")
          .agg(count(lit(1)).as("n_frames"),
            max(col("frame_ts_ms")).as("last_frame_ts_ms"))
          .orderBy("asset_id")
      },
      None)
  )
}
