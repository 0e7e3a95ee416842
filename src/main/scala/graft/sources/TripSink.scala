package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sinks for assembled trips (SURVEY.md S3/S4/S5).
  *
  * [[envelope]]/[[writeJsonLines]] reproduce the reference's JSON-lines
  * file sink — one object per trip, `{"id":…,"vt":…,"json":<hexwkb |
  * mf-json>}` (`meos/examples/04_to_file.rs:131-144`, format line 142) —
  * as a distributed `text` write (each task writes its partition; no
  * driver funnel).
  *
  * [[mergeTripArrays]] is the engine-side re-expression of the DB upsert's
  * merge-append (`INSERT … ON CONFLICT … DO UPDATE SET trip =
  * update(trips.trip, EXCLUDED.trip, true)`,
  * `meos-polars/examples/ais_to_db.rs:159-161`): two assembled (t, v)
  * array pairs merge into one time-sorted, duplicate-free trajectory.
  * Pure array expressions (sort + index-aware filter) — codegen-friendly,
  * no UDF, no shuffle beyond the join that pairs the rows.
  */
object TripSink {

  /** `{"id":…,"vt":…,"json":…}` — field order pinned by struct order. */
  def envelope(id: Column, vt: Column, payload: Column): Column =
    to_json(struct(id.as("id"), vt.as("vt"), payload.as("json")))

  def writeJsonLines(df: DataFrame, id: Column, vt: Column, payload: Column,
                     path: String): Unit =
    df.select(envelope(id, vt, payload).as("value")).write.mode("overwrite")
      .text(path)

  /** The upsert statement the reference prepares against MobilityDB
    * (`meos-polars/examples/ais_to_db.rs:155-162`): insert the WKB-encoded
    * trip, merging into the stored trajectory on key conflict. */
  def upsertStatement(table: String, keyCol: String, tripCol: String)
      : String =
    s"INSERT INTO $table ($keyCol, $tripCol) " +
      s"VALUES ($$1, tgeompointFromBinary($$2)) " +
      s"ON CONFLICT ($keyCol) DO UPDATE SET " +
      s"$tripCol = update($table.$tripCol, EXCLUDED.$tripCol, true)"

  /** Distributed JDBC upsert (S4): each partition opens one connection and
    * batches prepared-statement executions — the Spark-native shape of the
    * reference's pooled per-chunk writes (`ais_to_db.rs:90-98,202-205`).
    * `connect` is pluggable (driver-specific); rows must be
    * (key: Long, wkb: Array[Byte]). The MobilityDB statement itself can't
    * execute in-container; the same machinery runs end-to-end against
    * embedded Derby in TripSinkJdbcSpec (dialect statement + WKB merge
    * function, identical ON-CONFLICT-merge semantics). */
  def jdbcUpsert(df: DataFrame, table: String, keyCol: String,
                 tripCol: String, batchSize: Int,
                 connect: () => java.sql.Connection): Unit =
    jdbcBatchWrite(df,
      upsertStatement(table, keyCol, tripCol)
        .replace("$1", "?").replace("$2", "?"),
      batchSize, connect) { (st, r) =>
      st.setLong(1, r.getLong(0))
      st.setBytes(2, r.getAs[Array[Byte]](1))
    }

  /** The engine of [[jdbcUpsert]] with the statement and the row binder
    * pluggable — lets other SQL dialects (Derby MERGE, ANSI MERGE INTO)
    * reuse the connection-per-partition batched writer. */
  def jdbcBatchWrite(df: DataFrame, sql: String, batchSize: Int,
                     connect: () => java.sql.Connection)(
      bind: (java.sql.PreparedStatement,
             org.apache.spark.sql.Row) => Unit): Unit =
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn = connect()
      try {
        val st = conn.prepareStatement(sql)
        rows.grouped(batchSize).foreach { chunk =>
          chunk.foreach { r => bind(st, r); st.addBatch() }
          st.executeBatch()
        }
      } finally conn.close()
    }

  /** Merge two sorted trip arrays (epoch-micros + values). On duplicate
    * timestamps the STORED side wins — the upsert merges new instants into
    * the stored trajectory, it does not overwrite it. Returns a struct
    * (t, v, n). */
  def mergeTripArrays(storedT: Column, storedV: Column,
                      newT: Column, newV: Column): Column = {
    def tag(t: Column, v: Column, src: Int) =
      zip_with(t, v, (tt, vv) =>
        struct(tt.as("t"), lit(src).as("src"), vv.as("v")))
    // struct field order (t, src, v): array_sort's lexicographic compare
    // puts stored (src=0) before incoming at equal timestamps
    val emptyTagged =
      array().cast("array<struct<t:bigint,src:int,v:double>>")
    val all = array_sort(concat(
      coalesce(tag(storedT, storedV, 0), emptyTagged),
      coalesce(tag(newT, newV, 1), emptyTagged)))
    val deduped = expr_filterConsecutive(all)
    struct(
      transform(deduped, x => x.getField("t")).as("t"),
      transform(deduped, x => x.getField("v")).as("v"),
      size(deduped).cast("long").as("n"))
  }

  /** Keep the first element of each run of equal timestamps. Implemented
    * as zip-with-shifted-self: referencing `all` from inside a lambda
    * (`element_at(all, i)`) would re-evaluate the whole sort expression
    * per ELEMENT — O(n² log n) per row. Here `all` is evaluated a constant
    * number of times regardless of length. */
  private def expr_filterConsecutive(all: Column): Column = {
    val prevs = concat(
      array(lit(null).cast("struct<t:bigint,src:int,v:double>")),
      slice(all, lit(1), greatest(size(all) - 1, lit(0))))
    filter(
      zip_with(all, prevs, (cur, prev) =>
        when(prev.isNull || prev.getField("t") =!= cur.getField("t"), cur)),
      x => x.isNotNull)
  }
}
