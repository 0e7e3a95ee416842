package graft

import org.apache.spark.sql.SparkSession

/** `GraftExtensions` installs the native functions on a fresh session
  * (the `spark.sql.extensions` deployment path). */
class ExtensionsSpec extends SparkTestBase {

  test("withExtensions session resolves the native SQL functions") {
    spark // force the shared session/context up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT tgeompoint_parse('POINT(1 2)@2000-01-01').subtype AS st,
          |       float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
          |         AS d""".stripMargin).collect()(0)
      assert(r.getAs[Int]("st") == 1)
      assert(r.getAs[Double]("d") == 11.0)
      val l2 = s2.sql(
        """SELECT float_l2sq(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
          |         AS d2""".stripMargin).collect()(0)
      assert(l2.getAs[Double]("d2") == 8.0)
      // native WKB codec functions resolve and roundtrip in pure SQL
      val w = s2.sql(
        """SELECT tgeompoint_as_hexwkb(
          |         tgeompoint_parse('POINT(1 1)@2000-01-01')) AS hex,
          |       tgeompoint_from_hexwkb(tgeompoint_as_hexwkb(
          |         tgeompoint_parse('POINT(1 1)@2000-01-01'))).subtype
          |         AS st,
          |       tgeompoint_from_wkb(tgeompoint_as_wkb(
          |         tgeompoint_parse('POINT(1 1)@2000-01-01'))).subtype
          |         AS st2""".stripMargin).collect()(0)
      assert(w.getAs[String]("hex").startsWith("01280001"))
      assert(w.getAs[Int]("st") == 1 && w.getAs[Int]("st2") == 1)
      // text-dedup kernels resolve in pure SQL; values match the Column
      // API forms (which are parity-pinned in NativeExprSpec)
      val t = s2.sql(
        """SELECT size(minhash_bands(array('a b c', 'b c d'), 4)) AS nb,
          |       shingle_hashes(array('a', 'b', 'c', 'd'), 3) AS sh,
          |       simhash32(array(md5('x'), md5('y'))) AS sim,
          |       minhash_shingle_bands(array('a', 'b', 'c', 'd'), 3, 2)
          |         AS msb,
          |       token_entropy(array('a', 'a', 'b', 'b')) AS ent
          |""".stripMargin).collect()(0)
      assert(math.abs(t.getAs[Double]("ent") - math.log(2.0)) < 1e-12)
      assert(t.getAs[Int]("nb") == 4)
      assert(t.getAs[scala.collection.Seq[Long]]("sh").length == 2)
      assert(t.getAs[String]("sim").length == 32)
      assert(t.getAs[scala.collection.Seq[String]]("msb").length == 2)
      // kernel-config parameters must be literals: a column reference or
      // a non-integer literal fails with a readable message, not an NPE
      val colErr = intercept[Exception] {
        s2.sql(
          """SELECT shingle_hashes(array('a'), k)
            |FROM VALUES (3) AS t(k)""".stripMargin).collect()
      }
      assert(colErr.getMessage.contains("literal integer"),
        s"got: ${colErr.getMessage}")
      val strErr = intercept[Exception] {
        s2.sql("SELECT minhash_bands(array('a'), 'four')").collect()
      }
      assert(strErr.getMessage.contains("literal integer"),
        s"got: ${strErr.getMessage}")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
