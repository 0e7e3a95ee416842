package graft

/** Smoke + invariant tests for the declared query set on sf0.001. The full
  * hash-vs-DuckDB check runs through Verify + tools/selfcheck.py (and the
  * driver's own gate); these specs catch regressions at `sbt test` speed.
  */
class CoreQueriesSpec extends SparkTestBase {

  test("entry (flagship) returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    // trips are assembled per user: n_posits positive, start <= end
    rows.foreach { r =>
      assert(r.getAs[Long]("n_posits") > 0)
      assert(!r.getAs[java.sql.Timestamp]("start_ts")
        .after(r.getAs[java.sql.Timestamp]("end_ts")))
    }
  }

  // set difference may legitimately be empty at the 15-user smoke scale;
  // the spelling-variant miner is empty on the driver's clean 31-word
  // vocabulary AT ANY SF, and the bot-regularity detector is empty on
  // the driver's bursty human-like event times (planted Round10Spec
  // tests prove both miners fire on synthetic positives)
  private val mayBeEmptyAtSmoke =
    Set("q27_set_ops", "qx73_spell_variants", "qz41_bot_regularity")

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (!mayBeEmptyAtSmoke(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query key has an oracle — zero Spark-only rows") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Round 10 closed the last gap: qc1's roundtrip identity became the
    // row-survival condition over DuckDB-recomputable facts, so every
    // declared query now has a hash-comparable twin. qe4-family oracles
    // are valid whenever their query has run in-process — the twins
    // embed the fitted centroids, and the first test above just ran
    // every query.
    assert(missing == Set.empty[String],
      s"queries without oracle SQL: $missing")
  }

  test("q18 two assembly derivations agree on every user") {
    val rows = SparkEntry.queries("q18_temporal_eq")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("eq")))
  }

  test("q07 top-k equals prefix of q06 full sort") {
    val full = SparkEntry.queries("q06_sort_by_len")(spark, sfDir)
      .collect().take(10).map(_.toSeq)
    val topk = SparkEntry.queries("q07_limit_topk")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(full.toSeq == topk.toSeq)
  }
}
