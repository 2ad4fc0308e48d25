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

  /** Generates the one-row upsert statement for a (table, schema, keys). */
  trait Dialect extends Serializable {
    def upsertSql(table: String, schema: StructType, keys: Seq[String]): String

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
        else "UPDATE SET " + nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON CONFLICT (${keys.mkString(", ")})
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
        s"MERGE INTO $table t",
        s"USING $dummyTable",
        s"ON ${keys.map(k => s"t.$k = ${param(k)}").mkString(" AND ")}") ++
        (if (nonKeys.isEmpty) Nil
         else Seq("WHEN MATCHED THEN UPDATE SET " +
           nonKeys.map(c => s"$c = ${param(c)}").mkString(", "))) ++
        Seq(s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
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
        val conn = DriverManager.getConnection(url, properties)
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

  /** Create `table` matching `schema` if it doesn't exist (dev/test
    * convenience; production tables are usually migrations-managed). */
  def createTableIfMissing(
      url: String,
      table: String,
      schema: StructType,
      keys: Seq[String],
      dialect: Dialect = AnsiMerge,
      properties: Properties = new Properties()): Unit = {
    val cols = schema.fields
      .map(f => s"${f.name} ${dialect.sqlType(f.dataType)}" +
        (if (keys.contains(f.name)) " NOT NULL" else ""))
      .mkString(", ")
    val ddl = s"CREATE TABLE $table ($cols, PRIMARY KEY (${keys.mkString(", ")}))"
    val conn = DriverManager.getConnection(url, properties)
    try {
      val exists =
        conn.getMetaData.getTables(null, null, table.toUpperCase, null).next() ||
          conn.getMetaData.getTables(null, null, table, null).next()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(ddl) finally st.close()
      }
    } finally conn.close()
  }
}
