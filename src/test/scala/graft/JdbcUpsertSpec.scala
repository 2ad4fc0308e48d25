package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.JdbcUpsert

/** JDBC upsert sink against embedded Derby (in /opt/spark/jars — Spark
  * ships it for the Hive metastore): real MERGE round-trips, idempotence,
  * update-vs-insert split, nulls, and the Postgres ON CONFLICT text shape
  * matching the reference loader.
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby").resolve("db").toString
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private def tableRows(table: String): Set[(Long, String, Option[Double])] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT id, name, amount FROM $table")
      val buf = scala.collection.mutable.Set.empty[(Long, String, Option[Double])]
      while (rs.next()) {
        val amt = rs.getDouble(3)
        val amtOpt = if (rs.wasNull()) None else Some(amt) // wasNull = LAST read
        buf += ((rs.getLong(1), rs.getString(2), amtOpt))
      }
      buf.toSet
    } finally conn.close()
  }

  test("upsert round-trip: insert, idempotent repeat, keyed update") {
    JdbcUpsert.createTableIfMissing(url, "t_pay", schema, Seq("id"))
    val d1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amount")

    JdbcUpsert.upsertJdbc(d1, url, "t_pay", Seq("id"))
    val afterFirst = tableRows("t_pay")
    assert(afterFirst === Set((1L, "a", Some(10.0)), (2L, "b", Some(20.0)), (3L, "c", Some(30.0))))

    // idempotence: same delta again changes nothing
    JdbcUpsert.upsertJdbc(d1, url, "t_pay", Seq("id"))
    assert(tableRows("t_pay") === afterFirst)

    // overlapping delta: key 2 updated, key 4 inserted, others untouched
    val d2 = Seq((2L, "b2", 21.0), (4L, "d", 40.0)).toDF("id", "name", "amount")
    JdbcUpsert.upsertJdbc(d2, url, "t_pay", Seq("id"))
    assert(tableRows("t_pay") === Set(
      (1L, "a", Some(10.0)), (2L, "b2", Some(21.0)),
      (3L, "c", Some(30.0)), (4L, "d", Some(40.0))))
  }

  test("NULL fields bind and update correctly") {
    JdbcUpsert.createTableIfMissing(url, "t_null", schema, Seq("id"))
    val d = Seq((1L, Option("x"), Option(1.5)), (2L, Option.empty[String], Option.empty[Double]))
      .toDF("id", "name", "amount")
    JdbcUpsert.upsertJdbc(d, url, "t_null", Seq("id"))
    assert(tableRows("t_null") === Set((1L, "x", Some(1.5)), (2L, null, None)))
    // updating a present value to NULL sticks (no last-value leak)
    val d2 = Seq((1L, Option.empty[String], Option(2.5))).toDF("id", "name", "amount")
    JdbcUpsert.upsertJdbc(d2, url, "t_null", Seq("id"))
    assert(tableRows("t_null") === Set((1L, null, Some(2.5)), (2L, null, None)))
  }

  test("many partitions, composite keys, small batches") {
    val schema2 = StructType(Seq(
      StructField("tenant", StringType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("v", LongType)))
    JdbcUpsert.createTableIfMissing(url, "t_comp", schema2, Seq("tenant", "id"))
    val big = (1 to 500).map(i => (s"t${i % 3}", i.toLong, i.toLong))
      .toDF("tenant", "id", "v").repartition(8)
    JdbcUpsert.upsertJdbc(big, url, "t_comp", Seq("tenant", "id"), batchSize = 32)
    // second pass with doubled values: pure update, row count stable
    val again = (1 to 500).map(i => (s"t${i % 3}", i.toLong, i * 2L))
      .toDF("tenant", "id", "v").repartition(8)
    JdbcUpsert.upsertJdbc(again, url, "t_comp", Seq("tenant", "id"), batchSize = 32)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT count(*), sum(v) FROM t_comp")
      rs.next()
      assert(rs.getLong(1) === 500L)
      assert(rs.getLong(2) === (1 to 500).map(_ * 2L).sum)
    } finally conn.close()
  }

  test("atomic upsert: same converged state as the per-batch sink, staging dropped") {
    JdbcUpsert.createTableIfMissing(url, "t_atomic", schema, Seq("id"))
    val d1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "amount")
    JdbcUpsert.upsertJdbcAtomic(d1, url, "t_atomic", Seq("id"))
    assert(tableRows("t_atomic") === Set((1L, "a", Some(10.0)), (2L, "b", Some(20.0))))
    // idempotent repeat + keyed update/insert mix
    JdbcUpsert.upsertJdbcAtomic(d1, url, "t_atomic", Seq("id"))
    val d2 = Seq((2L, "b2", 21.0), (3L, "c", 30.0)).toDF("id", "name", "amount")
    JdbcUpsert.upsertJdbcAtomic(d2, url, "t_atomic", Seq("id"))
    assert(tableRows("t_atomic") === Set(
      (1L, "a", Some(10.0)), (2L, "b2", Some(21.0)), (3L, "c", Some(30.0))))
    // the staging table does not survive a successful run
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "T_ATOMIC__STAGE", null)
      try assert(!rs.next(), "staging table must be dropped after publish") finally rs.close()
    } finally conn.close()
  }

  test("atomic upsert: failed publish leaves the target byte-for-byte unchanged") {
    JdbcUpsert.createTableIfMissing(url, "t_allornothing", schema, Seq("id"))
    val d1 = Seq((1L, "a", 10.0)).toDF("id", "name", "amount")
    JdbcUpsert.upsertJdbcAtomic(d1, url, "t_allornothing", Seq("id"))
    val before = tableRows("t_allornothing")

    // dialect whose publish statement is broken: the LOAD phase fully
    // succeeds (staging populated), the single-transaction PUBLISH dies
    object BrokenPublish extends JdbcUpsert.Dialect {
      def upsertSql(t: String, s: StructType, k: Seq[String]): String =
        JdbcUpsert.AnsiMerge.upsertSql(t, s, k)
      override def publishSql(t: String, stg: String, s: StructType, k: Seq[String]): String =
        s"MERGE INTO no_such_table t USING $stg s ON t.id = s.id " +
          "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)"
    }
    val d2 = Seq((1L, "CHANGED", 99.0), (2L, "new", 2.0)).toDF("id", "name", "amount")
    intercept[java.sql.SQLException] {
      JdbcUpsert.upsertJdbcAtomic(d2, url, "t_allornothing", Seq("id"), BrokenPublish)
    }
    assert(tableRows("t_allornothing") === before,
      "no partial visibility: a failed publish must change nothing")

    // retry with a working dialect converges (leftover staging rebuilt)
    JdbcUpsert.upsertJdbcAtomic(d2, url, "t_allornothing", Seq("id"))
    assert(tableRows("t_allornothing") === Set(
      (1L, "CHANGED", Some(99.0)), (2L, "new", Some(2.0))))
  }

  test("non-plain identifiers are quoted end-to-end (mixed-case column with a space)") {
    val weird = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("Weird Col", StringType)))
    JdbcUpsert.createTableIfMissing(url, "t_weird", weird, Seq("id"))
    // the probe must also find it on the second, folded-name call
    JdbcUpsert.createTableIfMissing(url, "t_weird", weird, Seq("id"))
    val d = Seq((1L, "x"), (2L, "y")).toDF("id", "Weird Col")
    JdbcUpsert.upsertJdbc(d, url, "t_weird", Seq("id"))
    JdbcUpsert.upsertJdbc(Seq((2L, "y2")).toDF("id", "Weird Col"), url, "t_weird", Seq("id"))
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT id, \"Weird Col\" FROM t_weird")
      val buf = scala.collection.mutable.Set.empty[(Long, String)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2)))
      assert(buf.toSet === Set((1L, "x"), (2L, "y2")))
    } finally conn.close()
  }

  test("connect retry: transient connection failures back off, non-transient fail fast") {
    // bogus subprotocol → SQLException without SQLState 08 prefix from
    // DriverManager ("No suitable driver") — must fail immediately
    val t0 = System.nanoTime()
    intercept[java.sql.SQLException] {
      JdbcUpsert.createTableIfMissing("jdbc:nosuchdb:mem", "t", schema, Seq("id"))
    }
    assert((System.nanoTime() - t0) / 1e6 < 2000, "non-transient must not retry-sleep")
  }

  test("Postgres dialect emits the reference's ON CONFLICT statement shape") {
    val sql = JdbcUpsert.PostgresOnConflict.upsertSql("pos.pos_payments", schema, Seq("id"))
    // reference: src/etl-square-payments.ts:63-94
    assert(sql.contains("INSERT INTO pos.pos_payments (id, name, amount)"))
    assert(sql.contains("ON CONFLICT (id)"))
    assert(sql.contains("DO UPDATE SET name = EXCLUDED.name, amount = EXCLUDED.amount"))
    assert(sql.count(_ == '?') === 3)
    // key-only schema degrades to DO NOTHING
    val keyOnly = StructType(Seq(StructField("id", LongType, nullable = false)))
    assert(JdbcUpsert.PostgresOnConflict.upsertSql("t", keyOnly, Seq("id")).contains("DO NOTHING"))
  }
}
