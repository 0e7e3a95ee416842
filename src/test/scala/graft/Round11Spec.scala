package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: the ADVICE r10 contract fixes plus the AD
  * operator batch. */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin rejects dim-preserving join types (right/full outer " +
       "would emit each unmatched dim row `salts` times)") {
    val fact = Seq((1, 10L), (1, 11L), (2, 12L)).toDF("k", "row_id")
    val dim  = Seq((1, "a"), (3, "c")).toDF("k", "v")
    // fact-preserving types pass through
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val out = ext.Skew.saltedJoin(fact, dim, "k", "row_id", 4, jt)
      assert(out.columns.contains("k"))
    }
    // left_outer really is row-for-row equal to the unsalted join
    val salted = ext.Skew.saltedJoin(fact, dim, "k", "row_id", 4, "left_outer")
      .orderBy("row_id").collect().map(_.toSeq).toSeq
    val plain = fact.join(dim, Seq("k"), "left_outer")
      .orderBy("row_id").collect().map(_.toSeq).toSeq
    assert(salted == plain)
    // dim-preserving types are rejected up front
    for (jt <- Seq("right_outer", "full_outer", "outer", "cross")) {
      val e = intercept[IllegalArgumentException] {
        ext.Skew.saltedJoin(fact, dim, "k", "row_id", 4, jt)
      }
      assert(e.getMessage.contains("fact-preserving"))
    }
  }
}
