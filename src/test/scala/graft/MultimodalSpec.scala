package graft

import org.apache.spark.sql.functions._
import graft.ext.MultimodalOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "tiny image payload"),
    (1L, "an audio asset with more bytes in it"),
    (2L, "video content bytes")
  ).toDF("doc_id", "text")

  test("assetsFromText produces binary payloads with typed metadata") {
    val assets = MultimodalOps.assetsFromText(docs, "doc_id", "text")
    assert(assets.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val row = assets.filter($"asset_id" === 0).head()
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[String]("media_type") == "image")
    assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 1920)
    // payload round-trips to the original text
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8")
      == "tiny image payload")
  }

  test("extractFeatures: digest matches payload bytes, features bounded") {
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.assetsFromText(docs, "doc_id", "text"))
    val r = feats.filter($"asset_id" === 0).head()
    assert(r.getAs[Int]("n_bytes") == "tiny image payload".length)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("tiny image payload".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("content_digest") == expected)
    val fs = r.getSeq[Double](r.fieldIndex("features"))
    assert(fs.size == 8 && fs.forall(f => f >= 0.0 && f < 1.0))
  }

  test("resize caps dimensions preserving aspect ratio") {
    val assets = MultimodalOps.assetsFromText(docs, "doc_id", "text")
    val resized = MultimodalOps.resize(assets, 100, 100)
    resized.select($"meta.width", $"meta.height").as[(Int, Int)]
      .collect().foreach { case (w, h) =>
        assert(w <= 100 && h <= 100 && w >= 0 && h >= 0)
      }
    // never upscales
    val orig = assets.select($"asset_id", $"meta.width").as[(Long, Int)]
      .collect().toMap
    resized.select($"asset_id", $"meta.width").as[(Long, Int)]
      .collect().foreach { case (id, w) => assert(w <= orig(id)) }
  }

  test("sampleFrames emits ceil(duration/step) frames for av assets") {
    val assets = MultimodalOps.assetsFromText(docs, "doc_id", "text")
    val frames = MultimodalOps.sampleFrames(assets, fps = 1.0)
    val counts = frames.groupBy("asset_id").count()
      .as[(Long, Long)].collect().toMap
    val durations = assets
      .filter($"meta.media_type".isin("audio", "video"))
      .select($"asset_id", $"meta.duration_ms").as[(Long, Long)]
      .collect().toMap
    assert(counts.keySet == durations.keySet) // image assets excluded
    durations.foreach { case (id, dur) =>
      assert(counts(id) == (dur + 999) / 1000)
    }
  }
}
