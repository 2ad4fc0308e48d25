package graft.operators

import java.sql.{Connection, DriverManager, PreparedStatement, Types}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Keyed JDBC upsert sink — the direct re-expression of the reference's
  * row-at-a-time `INSERT … ON CONFLICT (keys) DO UPDATE` loader
  * (src/etl-square-payments.ts:59-117, pooled connection src/db.ts:7-17),
  * restructured for Spark's execution model:
  *
  *   - the reference loops every row through one client in one
  *     transaction; here each PARTITION opens its own connection and
  *     writes batched statements — N executors load in parallel, the
  *     classic `foreachPartition` sink shape;
  *   - the delta is hash-repartitioned on the upsert keys first, so any
  *     one key is written by exactly one task — no cross-task write
  *     conflicts, and per-key last-write-wins stays deterministic when
  *     combined with [[Upsert.latestPerKey]];
  *   - per-partition transactions commit per batch: at-least-once
  *     delivery overall, which the keyed upsert makes effectively-once
  *     (same contract as [[Upsert.upsertParquet]], SURVEY.md §2.7).
  *
  * The SQL text is a [[JdbcUpsert.Dialect]] seam: Postgres emits the
  * reference's ON CONFLICT form verbatim; the ANSI MERGE dialect serves
  * Derby (tested embedded), H2, Oracle, SQL Server.
  */
object JdbcUpsert {

  /** Identifier hygiene: plain SQL names (`[A-Za-z][A-Za-z0-9_]*`) pass
    * through unquoted so they keep matching tables created unquoted
    * (engines case-fold those); anything else — mixed-case-sensitive,
    * spaces, symbols — is double-quoted with internal quotes escaped.
    * A name the caller already quoted passes through verbatim, which is
    * also the escape hatch for reserved words (`"order"`): correct
    * folding of an unquoted reserved word is engine-specific, so this
    * sink never guesses. Dotted qualification is quoted per part. */
  private[operators] def ident(name: String): String =
    if (name.startsWith("\"") && name.endsWith("\"")) name
    else if (name.contains("."))
      name.split('.').map(ident).mkString(".")
    else if (name.matches("[A-Za-z][A-Za-z0-9_]*")) name
    else "\"" + name.replace("\"", "\"\"") + "\""

  /** Connect with bounded exponential backoff on transient/connection
    * failures (SQLState class 08, or SQLTransientException) — the pool
    * -less analog of the reference's pooled client's reconnects
    * (src/db.ts:7-17). Non-transient failures (auth, bad URL) surface
    * immediately. */
  private[operators] def connectWithRetry(
      url: String,
      properties: Properties,
      maxAttempts: Int = 3,
      baseBackoffMs: Long = 200): Connection = {
    var attempt = 0
    while (true) {
      try return DriverManager.getConnection(url, properties)
      catch {
        case e: java.sql.SQLException
            if attempt < maxAttempts - 1 &&
              (e.isInstanceOf[java.sql.SQLTransientException] ||
                Option(e.getSQLState).exists(_.startsWith("08"))) =>
          attempt += 1
          Thread.sleep(baseBackoffMs * (1L << (attempt - 1)))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Generates the one-row upsert statement for a (table, schema, keys). */
  trait Dialect extends Serializable {
    def upsertSql(table: String, schema: StructType, keys: Seq[String]): String

    /** One set-based statement merging every row of `staging` into
      * `target` — the single-transaction publish used by
      * [[upsertJdbcAtomic]]. Default: ANSI `MERGE ... USING <staging>`
      * (staging is a real base table, so even Derby accepts it). */
    def publishSql(
        target: String, staging: String, schema: StructType, keys: Seq[String]): String = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val on = keys.map(k => s"t.${ident(k)} = s.${ident(k)}").mkString(" AND ")
      (Seq(s"MERGE INTO ${ident(target)} t USING ${ident(staging)} s ON $on") ++
        (if (nonKeys.isEmpty) Nil
         else Seq("WHEN MATCHED THEN UPDATE SET " +
           nonKeys.map(c => s"${ident(c)} = s.${ident(c)}").mkString(", "))) ++
        Seq(s"WHEN NOT MATCHED THEN INSERT (${cols.map(ident).mkString(", ")}) " +
          s"VALUES (${cols.map(c => s"s.${ident(c)}").mkString(", ")})"))
        .mkString("\n")
    }

    /** Field indices in `?`-parameter order for one execution of
      * [[upsertSql]]'s statement. Default: every column once, in schema
      * order; MERGE-style dialects repeat fields across clauses. */
    def paramFieldOrder(schema: StructType, keys: Seq[String]): Seq[Int] =
      schema.indices

    /** SQL column type used where the dialect needs explicit parameter
      * typing (Derby requires typed `?` in MERGE source rows). */
    def sqlType(dt: DataType): String = dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case StringType => "VARCHAR(4000)"
      case other => throw new IllegalArgumentException(s"unsupported JDBC type: $other")
    }
  }

  /** Postgres `INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`
    * — the statement the reference builds by hand
    * (src/etl-square-payments.ts:63-94). */
  object PostgresOnConflict extends Dialect {
    def upsertSql(table: String, schema: StructType, keys: Seq[String]): String = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val updates =
        if (nonKeys.isEmpty) "NOTHING"
        else "UPDATE SET " + nonKeys.map(c => s"${ident(c)} = EXCLUDED.${ident(c)}").mkString(", ")
      s"""INSERT INTO ${ident(table)} (${cols.map(ident).mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON CONFLICT (${keys.map(ident).mkString(", ")})
         |DO $updates""".stripMargin
    }

    /** Set-based publish without MERGE (works on every Postgres that has
      * ON CONFLICT): one INSERT ... SELECT from the staging table. */
    override def publishSql(
        target: String, staging: String, schema: StructType, keys: Seq[String]): String = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val updates =
        if (nonKeys.isEmpty) "NOTHING"
        else "UPDATE SET " + nonKeys.map(c => s"${ident(c)} = EXCLUDED.${ident(c)}").mkString(", ")
      s"""INSERT INTO ${ident(target)} (${cols.map(ident).mkString(", ")})
         |SELECT ${cols.map(ident).mkString(", ")} FROM ${ident(staging)}
         |ON CONFLICT (${keys.map(ident).mkString(", ")})
         |DO $updates""".stripMargin
    }
  }

  /** `MERGE INTO … USING <one-row dummy table>` — the portable upsert
    * for engines without ON CONFLICT. Derby's MERGE only accepts a base
    * table or table function as source, so the parameters live as typed
    * casts directly in the ON / UPDATE SET / INSERT VALUES clauses (the
    * documented Derby idiom; DB2 shares SYSIBM.SYSDUMMY1, Oracle's
    * analog is DUAL). Parameter order: keys (ON), non-keys (UPDATE),
    * then every column (INSERT). */
  final case class MergeViaDummy(dummyTable: String = "SYSIBM.SYSDUMMY1")
      extends Dialect {
    def upsertSql(table: String, schema: StructType, keys: Seq[String]): String = {
      val byName = schema.fields.map(f => f.name -> f).toMap
      def param(c: String) = s"CAST(? AS ${sqlType(byName(c).dataType)})"
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val parts = Seq(
        s"MERGE INTO ${ident(table)} t",
        s"USING $dummyTable",
        s"ON ${keys.map(k => s"t.${ident(k)} = ${param(k)}").mkString(" AND ")}") ++
        (if (nonKeys.isEmpty) Nil
         else Seq("WHEN MATCHED THEN UPDATE SET " +
           nonKeys.map(c => s"${ident(c)} = ${param(c)}").mkString(", "))) ++
        Seq(s"WHEN NOT MATCHED THEN INSERT (${cols.map(ident).mkString(", ")}) " +
          s"VALUES (${cols.map(param).mkString(", ")})")
      parts.mkString("\n")
    }

    override def paramFieldOrder(schema: StructType, keys: Seq[String]): Seq[Int] = {
      val idx = schema.fieldNames.zipWithIndex.toMap
      val nonKeys = schema.fieldNames.toSeq.filterNot(keys.contains)
      (keys ++ nonKeys ++ schema.fieldNames.toSeq).map(idx)
    }
  }

  /** Default portable MERGE dialect (Derby-compatible; tested embedded). */
  val AnsiMerge: Dialect = MergeViaDummy()

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case DateType => Types.DATE
    case TimestampType => Types.TIMESTAMP
    case _: DecimalType => Types.DECIMAL
    case StringType => Types.VARCHAR
    case other => throw new IllegalArgumentException(s"unsupported JDBC type: $other")
  }

  private def bind(
      ps: PreparedStatement, schema: StructType, order: Seq[Int], row: Row): Unit = {
    var p = 0
    while (p < order.length) {
      val i = order(p)
      val idx = p + 1
      if (row.isNullAt(i)) ps.setNull(idx, jdbcType(schema(i).dataType))
      else schema(i).dataType match {
        case LongType => ps.setLong(idx, row.getLong(i))
        case IntegerType => ps.setInt(idx, row.getInt(i))
        case ShortType => ps.setShort(idx, row.getShort(i))
        case DoubleType => ps.setDouble(idx, row.getDouble(i))
        case FloatType => ps.setFloat(idx, row.getFloat(i))
        case BooleanType => ps.setBoolean(idx, row.getBoolean(i))
        case DateType => ps.setDate(idx, row.getDate(i))
        case TimestampType => ps.setTimestamp(idx, row.getTimestamp(i))
        case _: DecimalType => ps.setBigDecimal(idx, row.getDecimal(i))
        case StringType => ps.setString(idx, row.getString(i))
        case other => throw new IllegalArgumentException(s"unsupported JDBC type: $other")
      }
      p += 1
    }
  }

  /** Upsert `delta` into `table` over JDBC. Idempotent for key-unique
    * deltas: `upsertJdbc(d); upsertJdbc(d)` ≡ `upsertJdbc(d)`. */
  def upsertJdbc(
      delta: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      dialect: Dialect = AnsiMerge,
      batchSize: Int = 500,
      properties: Properties = new Properties()): Unit = {
    require(keys.nonEmpty, "upsert keys must be non-empty")
    val schema = delta.schema
    keys.foreach(k => require(schema.fieldNames.contains(k), s"key $k not in delta"))
    val sql = dialect.upsertSql(table, schema, keys)
    val order = dialect.paramFieldOrder(schema, keys)
    // one writer per key: repartition by the upsert keys so concurrent
    // partition-level transactions never contend on the same row
    delta.repartition(keys.map(col): _*).foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = connectWithRetry(url, properties)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { row =>
              bind(ps, schema, order, row)
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) { ps.executeBatch(); conn.commit() }
            }
            ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }

  /** All-or-nothing JDBC upsert — the reference's one-transaction-per-run
    * visibility contract (src/etl-square-payments.ts:57,120,123), which
    * per-batch commits cannot give: readers either see the whole run or
    * none of it.
    *
    * Two phases:
    *   1. LOAD (parallel, at-least-once): executors batch-insert the
    *      delta into a keyless staging table `<table>__stage`. A crash
    *      here leaves only staging garbage — the target is untouched —
    *      and the staging table is dropped and rebuilt on retry.
    *   2. PUBLISH (driver, one transaction): a single set-based
    *      [[Dialect.publishSql]] statement merges staging into the
    *      target and commits once. The target changes visibility at
    *      exactly that commit.
    *
    * Requires a key-unique delta (apply [[Upsert.latestPerKey]] first):
    * both MERGE and ON CONFLICT reject a source that hits the same
    * target row twice. Trade-off vs [[upsertJdbc]]: double write volume
    * (staging + merge) and a server-side merge — the price of atomic
    * visibility; per-run cost stays O(delta).
    */
  def upsertJdbcAtomic(
      delta: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      dialect: Dialect = AnsiMerge,
      batchSize: Int = 500,
      properties: Properties = new Properties()): Unit = {
    require(keys.nonEmpty, "upsert keys must be non-empty")
    val schema = delta.schema
    keys.foreach(k => require(schema.fieldNames.contains(k), s"key $k not in delta"))
    val staging = table + "__stage"

    // fresh keyless staging table (leftovers from a crashed run dropped)
    val setup = connectWithRetry(url, properties)
    try {
      dropTableIfExists(setup, staging)
      val cols = schema.fields
        .map(f => s"${ident(f.name)} ${dialect.sqlType(f.dataType)}").mkString(", ")
      val st = setup.createStatement()
      try st.executeUpdate(s"CREATE TABLE ${ident(staging)} ($cols)") finally st.close()
    } finally setup.close()

    // phase 1: parallel batched inserts into staging
    val insertSql = s"INSERT INTO ${ident(staging)} " +
      s"(${schema.fieldNames.map(ident).mkString(", ")}) " +
      s"VALUES (${schema.fieldNames.map(_ => "?").mkString(", ")})"
    val order = schema.indices
    delta.repartition(keys.map(col): _*).foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = connectWithRetry(url, properties)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(insertSql)
          try {
            var n = 0
            rows.foreach { row =>
              bind(ps, schema, order, row)
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) { ps.executeBatch(); conn.commit() }
            }
            ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }

    // phase 2: one-statement, one-commit publish
    val conn = connectWithRetry(url, properties)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(dialect.publishSql(table, staging, schema, keys))
        conn.commit() // the run becomes visible here, atomically
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
      dropTableIfExists(conn, staging)
    } finally conn.close()
  }

  private def dropTableIfExists(conn: Connection, table: String): Unit = {
    val st = conn.createStatement()
    try {
      st.executeUpdate(s"DROP TABLE ${ident(table)}")
      if (!conn.getAutoCommit) conn.commit()
    } catch { // didn't exist; clear any aborted-txn state
      case _: java.sql.SQLException => if (!conn.getAutoCommit) conn.rollback()
    } finally st.close()
  }

  /** Create `table` matching `schema` if it doesn't exist (dev/test
    * convenience; production tables are usually migrations-managed).
    * The existence probe folds the name per the driver's
    * stores{Upper,Lower}CaseIdentifiers metadata (quoted names probe
    * verbatim) and understands one level of `schema.table`
    * qualification. Reserved-word identifiers: pass them pre-quoted
    * (`"order"`) — see [[ident]]. */
  def createTableIfMissing(
      url: String,
      table: String,
      schema: StructType,
      keys: Seq[String],
      dialect: Dialect = AnsiMerge,
      properties: Properties = new Properties()): Unit = {
    val cols = schema.fields
      .map(f => s"${ident(f.name)} ${dialect.sqlType(f.dataType)}" +
        (if (keys.contains(f.name)) " NOT NULL" else ""))
      .mkString(", ")
    val ddl = s"CREATE TABLE ${ident(table)} ($cols, " +
      s"PRIMARY KEY (${keys.map(ident).mkString(", ")}))"
    val conn = connectWithRetry(url, properties)
    try {
      val md = conn.getMetaData
      def fold(name: String): String =
        if (name.startsWith("\"") && name.endsWith("\"")) // quoted: exact
          name.substring(1, name.length - 1).replace("\"\"", "\"")
        else if (md.storesUpperCaseIdentifiers) name.toUpperCase
        else if (md.storesLowerCaseIdentifiers) name.toLowerCase
        else name
      val (schemaPat, tablePat) = table.split('.') match {
        case Array(s, t) => (fold(s), fold(t))
        case _ => (null, fold(table))
      }
      val exists = {
        val rs = md.getTables(null, schemaPat, tablePat, null)
        try rs.next() finally rs.close()
      }
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(ddl) finally st.close()
      }
    } finally conn.close()
  }
}
