package graft

/** Every declared query must run end-to-end on sf0.001 and, where it has
  * an oracle, produce a stable column set (driver hashes by column name).
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle keys subset of queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.run(spark, sfDir)
      // Materialize fully (same action Verify performs, minus the write).
      val n = df.count()
      assert(n >= 0)
      // Column names must be lowercase + distinct for oracle hash parity.
      val cols = df.columns.toSeq
      assert(cols.distinct.size === cols.size, s"duplicate columns in ${q.name}: $cols")
      // Cache hygiene: no query may leak persisted frames into a
      // long-lived session (round 1 leaked d3/v2/v3's buckets; the bench
      // only survived by calling clearCache after every query).
      assert(spark.sharedState.cacheManager.isEmpty,
        s"${q.name} left frames in the session cache")
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"${q.name} left persistent RDDs behind")
    }
  }
}
