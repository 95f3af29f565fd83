package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.RollupMaintain
import graft.io.Staging

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, Double)*) =
    rows.toSeq.toDF("grp", "amount")

  test("incrementally maintained rollup equals the direct aggregate " +
    "after every batch") {
    val store = Files.createTempDirectory("graft-rollup").toString
    val b1 = batch(("a", 1.5), ("a", 2.5), ("b", 10.0))
    val b2 = batch(("a", 4.0), ("c", 7.25))
    val b3 = batch(("b", -10.0), ("c", 0.75))
    var all = b1
    for ((b, i) <- Seq(b1, b2, b3).zipWithIndex) {
      if (i > 0) all = all.unionByName(b)
      RollupMaintain.updateRollup(spark, store, "sales", b,
        Seq("grp"), "amount")
      val got = RollupMaintain.readFinal(spark, store, "sales")
        .select("grp", "total", "n_rows")
        .as[(String, Double, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val direct = all.groupBy("grp")
        .agg(sum($"amount".cast("decimal(25,6)")).cast("double")
          .as("t"), count($"amount").as("n"))
        .as[(String, Double, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == direct, s"after batch ${i + 1}")
    }
    // mean derived from partials
    val m = RollupMaintain.readFinal(spark, store, "sales")
      .filter($"grp" === "a").head().getAs[Double]("mean")
    assert(math.abs(m - (1.5 + 2.5 + 4.0) / 3) < 1e-9)
  }

  test("crashed update leaves a refusal marker instead of losing history") {
    val store = Files.createTempDirectory("graft-rollup-crash").toString
    RollupMaintain.updateRollup(spark, store, "t",
      batch(("a", 1.0)), Seq("grp"), "amount")
    // simulate a crash between store delete and rename
    new java.io.File(s"$store/__rollup_tmp_t").mkdirs()
    val e = intercept[IllegalArgumentException] {
      RollupMaintain.updateRollup(spark, store, "t",
        batch(("a", 2.0)), Seq("grp"), "amount")
    }
    assert(e.getMessage.contains("crashed mid-swap"))
    // recovery path: clear the marker, updates resume
    assert(new java.io.File(s"$store/__rollup_tmp_t").delete())
    RollupMaintain.updateRollup(spark, store, "t",
      batch(("a", 2.0)), Seq("grp"), "amount")
    val total = RollupMaintain.readFinal(spark, store, "t")
      .head().getAs[Double]("total")
    assert(total == 3.0)
  }
}
