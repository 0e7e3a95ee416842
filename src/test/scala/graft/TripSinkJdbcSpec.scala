package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.meos.{Assembly, NativeExpressions}
import graft.sources.TripSink

/** Derby-hosted WKB trajectory merge — the embedded stand-in for
  * MobilityDB's `update(trips.trip, EXCLUDED.trip, true)`
  * (`meos-polars/examples/ais_to_db.rs:159-161`): decode both trips,
  * merge instants time-sorted with the STORED side winning duplicate
  * timestamps (the engine-side [[TripSink.mergeTripArrays]] rule), and
  * re-encode. Registered as a Derby SQL function via the class's static
  * forwarder, so the merge-on-conflict runs INSIDE the database engine,
  * exactly like the reference's upsert. Top-level object: Derby resolves
  * `EXTERNAL NAME` against a static method. */
object DerbyWkbMerge {
  def merge(stored: Array[Byte], incoming: Array[Byte]): Array[Byte] = {
    import graft.meos.MobilityWkb
    val s = MobilityWkb.fromWkb(stored)
    val n = MobilityWkb.fromWkb(incoming)
    val si = s.sequences.flatMap(_.instants)
    val seen = si.map(_.t).toSet
    val merged = (si ++ n.sequences.flatMap(_.instants)
      .filterNot(i => seen.contains(i.t))).sortBy(_.t)
    MobilityWkb.toWkb(s.copy(sequences =
      Seq(s.sequences.head.copy(instants = merged))))
  }
}

/** S4's live-DB leg, end-to-end against embedded Derby: the SAME
  * connection-per-partition batched writer as the production
  * [[TripSink.jdbcUpsert]], driving a real MERGE-on-key statement whose
  * matched branch merges trajectories server-side. Asserts the stored
  * WKB equals the whole-input assembly byte-for-byte — the q19 merge
  * oracle, now through an actual JDBC round trip
  * (`ais_to_db.rs:90-98,155-162,203-205`). */
class TripSinkJdbcSpec extends SparkTestBase {

  test("chunked JDBC upsert into Derby: insert leg + server-side " +
    "trajectory merge leg == whole-input assembly, byte-for-byte") {
    // local vals only: the foreachPartition closures must not capture the
    // spec instance (scalatest's Engine is not serializable)
    val url = "jdbc:derby:memory:tripsS4"
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val conn = DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE trips (mmsi BIGINT PRIMARY KEY, " +
        "trip VARCHAR (32672) FOR BIT DATA)")
      st.execute(
        """CREATE FUNCTION TRIP_MERGE(
          |  A VARCHAR (32672) FOR BIT DATA,
          |  B VARCHAR (32672) FOR BIT DATA)
          |RETURNS VARCHAR (32672) FOR BIT DATA
          |PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA
          |EXTERNAL NAME 'graft.DerbyWkbMerge.merge'""".stripMargin)

      // tgeompoint trips (qc1's construction) WKB-encoded in-plan; two
      // event-time slices reproduce the reference's chunked ingest
      def trips(pred: org.apache.spark.sql.Column) = {
        val asm = Assembly.tpointAssemble()
        Tables.events(spark, sfDir)
          .withColumn("y", length(col("props")).cast("double"))
          .where(pred)
          .groupBy("user_id")
          .agg(asm(unix_micros(col("ts")), col("event_id"), col("value"),
            col("y")).as("s"))
          .select(col("user_id"), unhex(NativeExpressions
            .tgeompointAsHexWkb(Assembly.tpointVal(col("s")))).as("wkb"))
      }
      val bounds = Tables.events(spark, sfDir)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .collect()(0)
      val cutUs = (bounds.getLong(0) + bounds.getLong(1)) / 2
      val cut = timestamp_micros(lit(cutUs))

      // Derby's dialect of the reference upsert: MERGE on key; matched →
      // server-side trajectory merge, not matched → plain insert
      val mergeSql =
        """MERGE INTO trips USING SYSIBM.SYSDUMMY1
          |ON trips.mmsi = CAST(? AS BIGINT)
          |WHEN MATCHED THEN UPDATE SET trip =
          |  TRIP_MERGE(trips.trip, CAST(? AS VARCHAR (32672) FOR BIT DATA))
          |WHEN NOT MATCHED THEN INSERT (mmsi, trip)
          |  VALUES (?, ?)""".stripMargin
      def upsert(df: org.apache.spark.sql.DataFrame): Unit =
        TripSink.jdbcBatchWrite(df, mergeSql, batchSize = 50,
          () => DriverManager.getConnection(url)) { (ps, r) =>
          ps.setLong(1, r.getLong(0))
          ps.setBytes(2, r.getAs[Array[Byte]](1))
          ps.setLong(3, r.getLong(0))
          ps.setBytes(4, r.getAs[Array[Byte]](1))
        }
      upsert(trips(col("ts") < cut))  // chunk 1: all keys fresh
      upsert(trips(col("ts") >= cut)) // chunk 2: every key conflicts

      // ground truth: whole-input assembly, same in-plan WKB encoding
      val want = trips(lit(true)).collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      val got = scala.collection.mutable.Map.empty[Long, Array[Byte]]
      val rs = conn.createStatement()
        .executeQuery("SELECT mmsi, trip FROM trips")
      while (rs.next()) got(rs.getLong(1)) = rs.getBytes(2)
      assert(got.keySet == want.keySet,
        s"key sets differ: ${got.keySet.size} vs ${want.keySet.size}")
      want.foreach { case (k, bytes) =>
        assert(java.util.Arrays.equals(got(k), bytes),
          s"stored trajectory for $k differs from whole-input assembly")
      }
      // and the merge leg actually fired: at least one user has posits on
      // both sides of the cut (otherwise this test proves nothing)
      val straddlers = trips(col("ts") < cut).select("user_id")
        .intersect(trips(col("ts") >= cut).select("user_id")).count()
      assert(straddlers > 0, "no user straddles the cut — pick another")
    } finally {
      conn.close()
      try DriverManager.getConnection(s"$url;drop=true")
      catch { case _: java.sql.SQLException => () } // 08006 == dropped ok
    }
  }
}
