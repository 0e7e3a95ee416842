package graft

import org.apache.spark.sql.functions._

import graft.meos.Assembly
import graft.ext.Text

/** Scale-path equivalences: salted two-phase assembly must equal
  * single-phase; fast (xxhash) LSH banding must produce the same candidate
  * pairs as the md5 variant on identical inputs (same min-shingle → same
  * bucketing behavior statistically; here we check exact-dup detection). */
class SkewSpec extends SparkTestBase {

  test("salted two-phase assembly == single-phase assembly") {
    val ev = Tables.events(spark, sfDir)
    val asm = Assembly.tfloatAssemble()
    val single = ev.groupBy("user_id")
      .agg(asm(unix_micros(col("ts")), col("event_id"), col("value")).as("s"))
      .select(col("user_id"), col("s.t").as("t"), col("s.v").as("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[scala.collection.Seq[Long]]("t"),
          r.getAs[scala.collection.Seq[Double]]("v"))).toMap
    val salted = Assembly.tfloatAssembleSalted(ev,
      col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"),
      salts = 8)
      .select(col("k"), col("s.t").as("t"), col("s.v").as("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[scala.collection.Seq[Long]]("t"),
          r.getAs[scala.collection.Seq[Double]]("v"))).toMap
    assert(salted.keySet == single.keySet)
    single.foreach { case (k, (t, v)) =>
      assert(salted(k)._1 == t, s"user $k timestamps differ")
      assert(salted(k)._2 == v, s"user $k values differ")
    }
  }

  test("bucketed interval join == nested-loop box-overlap join") {
    import graft.meos.Boxes
    val boxes = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(Boxes.tboxAgg(col("value"), col("ts")).as("box"))
      .select(col("user_id").as("id"), col("box"))
    val a = boxes.select(col("id").as("u1"), col("box").as("b1"))
    val c = boxes.select(col("id").as("u2"), col("box").as("b2"))
    val nested = a.join(c,
      col("u1") < col("u2") && Boxes.tboxOverlaps(col("b1"), col("b2")))
      .select(col("u1"), col("u2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Boxes.tboxOverlapJoinBucketed(boxes, boxes,
      java.time.Duration.ofDays(2))
      .where(col("idA") < col("idB"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == nested)
    assert(nested.nonEmpty)
  }

  test("fast xxhash LSH banding finds exact duplicates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "totally different content with other words here"))
      .toDF("doc_id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("sh", Text.shingles(col("toks")))
      .select(col("doc_id"),
        explode(Text.lshBandsFast(col("sh"), bands = 4)).as("band"))
    val pairs = docs.as("a").join(docs.as("b"),
      col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }
}
