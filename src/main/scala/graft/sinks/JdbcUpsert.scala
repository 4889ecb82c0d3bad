package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.{Connection, DriverManager, PreparedStatement}

/** JDBC upsert sink ≙ reference `internal/target/pgsql.go` /
  * `internal/target/mysql.go`: auto-create the table with the key as
  * PRIMARY KEY (`pgsql.go:89-98`), auto-ALTER new columns as they appear
  * in the data (`pgsql.go:162-238`), then write the batch with key-
  * idempotent semantics — either insert-if-absent / first-write-wins
  * (pgsql `ON CONFLICT (key) DO NOTHING`, `pgsql.go:22-33`) or
  * last-write-wins (mysql `REPLACE INTO`, `mysql.go:22-35`).
  *
  * Spark-native shape: the single mutex-serialized writer of the
  * reference (`pgsql.go:108,121,128`) becomes a distributed write —
  * the batch is hash-repartitioned on the key columns so each key lands
  * on exactly one task, then every partition opens its own connection and
  * writes its disjoint key range in parallel (the same executor-side
  * pattern as Spark's own JDBC writer). No cross-task conflict is
  * possible, so UPDATE-then-INSERT needs no retry loop. Delivery is the
  * reference's model exactly: at-least-once transport + key-idempotent
  * writes = converged final state (plus an optional applied-batch ledger
  * for exactly-once skip of whole replayed batches).
  *
  * Type ladder (≙ the value-sniffing ladder `pgsql.go:170-229`, but
  * driven by the DataFrame schema — we have one, the reference doesn't):
  * integral→BIGINT, fractional→DOUBLE PRECISION, decimal→NUMERIC(p,s),
  * bool→BOOLEAN, date→DATE, timestamp→TIMESTAMP, string→VARCHAR(255) or
  * CLOB when any batch value exceeds 255 chars (≙ the TEXT predicate
  * `pgsql.go:326-330`), struct/array/map→JSON text in CLOB (≙ JSONB,
  * `pgsql.go:203-210`). The reference's float64→INT template bug
  * (`pgsql.go:195-198`) and the string-assertion coercion bug that
  * zeroes every JSON number (`pgsql.go:242-274`) are deliberately NOT
  * copied (SURVEY.md §1.2).
  */
object JdbcUpsert {

  /** Write modes, named for their reference semantics. */
  val InsertIfAbsent = "insertIfAbsent" // pgsql ON CONFLICT DO NOTHING
  val Replace = "replace"               // mysql REPLACE INTO
  val Modes: Set[String] = Set(InsertIfAbsent, Replace)

  final case class Config(
      url: String,
      table: String,
      keyColumns: Seq[String] = Seq("key"),
      mode: String = Replace,
      batchSize: Int = 500,
      // string columns whose longest batch value exceeds this become CLOB
      textThreshold: Int = 255) {
    require(Modes(mode), s"jdbc mode $mode not implemented (${Modes.mkString("|")})")
    require(keyColumns.nonEmpty, "jdbc sink requires at least one key column")
  }

  /** Upsert `df` into the target table: normalize complex columns to JSON
    * text, create/evolve the table DDL, repartition on the key, write all
    * partitions in parallel. Returns the number of rows written.
    */
  def write(df: DataFrame, cfg: Config): Long = {
    require(cfg.keyColumns.forall(df.columns.contains),
      s"key columns ${cfg.keyColumns.mkString(",")} missing from " +
        s"batch columns ${df.columns.mkString(",")}")
    val flat = normalize(df)
    val longText = longStringCols(flat, cfg.textThreshold)
    val schema = flat.schema

    // driver-side DDL, once per batch ≙ the interleaved DDL of a
    // reference flush (`pgsql.go:139-144`) hoisted out of the data loop
    withConnection(cfg.url) { conn =>
      ensureTable(conn, cfg, schema)
      ensureColumns(conn, cfg, schema, longText)
    }

    val written = df.sparkSession.sparkContext.longAccumulator("jdbc_rows")
    val cols = schema.fields.map(_.name).toSeq
    val url = cfg.url; val table = cfg.table; val keyCols = cfg.keyColumns
    val mode = cfg.mode; val commitEvery = cfg.batchSize
    flat
      .repartition(keyCols.map(col): _*)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val conn = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val w = new PartitionWriter(conn, table, cols, keyCols, mode)
            var n = 0
            it.foreach { row =>
              w.upsert(row)
              n += 1
              if (n % commitEvery == 0) conn.commit()
            }
            conn.commit()
            w.close()
            written.add(n)
          } finally conn.close()
        }
      }
    written.value
  }

  /** CDC apply ≙ the flagship merge, against a JDBC table: per-batch
    * winner per key (same delete-wins-on-equal-lsn tie-break as
    * LakeTable), deletes issue DELETE, everything else upserts
    * last-write-wins. Key-idempotent, so at-least-once replay converges.
    * The winner reduction means each key is written once per batch — the
    * REPLACE path needs no cross-batch LSN check because the streaming
    * dedup state upstream already enforces monotone LSNs per key.
    */
  def applyCdcBatch(batch: DataFrame, cfg: Config): (Long, Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(cfg.keyColumns.map(col): _*)
      .orderBy(col("lsn").desc, (col("op") === "delete").desc, col("op").desc)
    // checkpoint the winner set: upserts and deletes below are two
    // separate actions, and without materialization each would re-execute
    // the window (a key-shuffle + sort) over the batch
    val winners = graft.util.Materialize.barrier(
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
    val deletes = winners.filter(col("op") === "delete")
      .select(cfg.keyColumns.map(col): _*)
    val upserts = winners.filter(col("op") =!= "delete").drop("op")
    // winners are one-per-key, so upsert/delete key sets are disjoint and
    // order within the batch is free; upserts go first because their DDL
    // pass creates the table on the very first batch
    val nUp = write(upserts, cfg.copy(mode = Replace))
    val nDel = delete(deletes, cfg)
    (nUp, nDel)
  }

  /** Delete by key, distributed like `write`. A key absent from the table
    * (or a table not yet created — delete-only first batch) deletes 0
    * rows, matching MERGE WHEN MATCHED DELETE semantics.
    */
  def delete(keys: DataFrame, cfg: Config): Long = {
    val exists = withConnection(cfg.url)(c => tableExists(c, cfg.table))
    if (!exists) return 0L
    val deleted = keys.sparkSession.sparkContext.longAccumulator("jdbc_deletes")
    val url = cfg.url; val table = cfg.table; val keyCols = cfg.keyColumns
    val commitEvery = cfg.batchSize
    keys.repartition(keyCols.map(col): _*)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val conn = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val sql = s"DELETE FROM ${q(table)} WHERE " +
              keyCols.map(k => s"${q(k)} = ?").mkString(" AND ")
            val st = conn.prepareStatement(sql)
            var n = 0
            var issued = 0
            it.foreach { row =>
              keyCols.zipWithIndex.foreach { case (k, i) =>
                // typed bind like PartitionWriter — a string bind against
                // e.g. a BIGINT key would lean on driver-specific coercion
                st.setObject(i + 1, jdbcValue(row.getAs[Any](k)))
              }
              n += st.executeUpdate()
              issued += 1
              // cadence counts statements, not matched rows: a run of
              // absent keys must not commit per miss (0 % k == 0)
              if (issued % commitEvery == 0) conn.commit()
            }
            conn.commit(); st.close()
            deleted.add(n)
          } finally conn.close()
        }
      }
    deleted.value
  }

  /** Exactly-once batch ledger in the target DB itself (analog of the
    * LakeTable `appliedUpTo` ledger): whole replayed batches are skipped.
    * The window between data commit and ledger insert is at-least-once —
    * absorbed by key idempotence, same as the reference's offsets-after-
    * flush order (`source/kafka.go:103-109`).
    */
  def isApplied(url: String, pipeline: String, batchId: Long): Boolean =
    withConnection(url) { conn =>
      ensureLedger(conn)
      val st = conn.prepareStatement(
        s"SELECT 1 FROM ${q(LedgerTable)} WHERE ${q("pipeline")} = ? AND ${q("batch_id")} = ?")
      st.setString(1, pipeline); st.setLong(2, batchId)
      val rs = st.executeQuery()
      try rs.next() finally { rs.close(); st.close() }
    }

  def recordApplied(url: String, pipeline: String, batchId: Long): Unit =
    withConnection(url) { conn =>
      ensureLedger(conn)
      val st = conn.prepareStatement(
        s"INSERT INTO ${q(LedgerTable)} (${q("pipeline")}, ${q("batch_id")}) VALUES (?, ?)")
      st.setString(1, pipeline); st.setLong(2, batchId)
      try st.executeUpdate()
      catch { case e: java.sql.SQLException if isDuplicateKey(e) => () }
      finally st.close()
    }

  private val LedgerTable = "graft_applied_batches"

  // -- DDL -------------------------------------------------------------------

  /** Complex columns (struct/array/map) → compact JSON text; everything
    * else passes through typed (Catalyst casts ≙ the coercion ladder).
    */
  private[sinks] def normalize(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }

  /** String columns whose longest value in this batch exceeds the
    * threshold — they get CLOB DDL (≙ the len>255 TEXT predicate,
    * `pgsql.go:326-330`, decided per batch like the reference decides per
    * value). One cheap aggregate job over the batch.
    */
  private[sinks] def longStringCols(df: DataFrame, threshold: Int): Set[String] = {
    val strCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    if (strCols.isEmpty) Set.empty
    else {
      val row = df.select(strCols.map(c =>
        coalesce(max(length(col(c))), lit(0)).as(c)).toIndexedSeq: _*).head()
      strCols.zipWithIndex.collect {
        case (c, i) if row.getInt(i) > threshold => c
      }.toSet
    }
  }

  private[sinks] def ddlType(dt: DataType, name: String,
      keyCols: Seq[String], longText: Set[String]): String = dt match {
    // key column is always short varchar NOT NULL ≙ `pgsql.go:23`
    case StringType if keyCols.contains(name) => "VARCHAR(255) NOT NULL"
    case StringType if longText.contains(name) => "CLOB"
    case StringType => "VARCHAR(255)"
    case ByteType | ShortType | IntegerType | LongType => "BIGINT"
    case FloatType | DoubleType => "DOUBLE PRECISION"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(
      s"jdbc sink: unsupported column type $other for $name")
  }

  /** CREATE TABLE IF NOT EXISTS analog (`pgsql.go:89-98`): key columns +
    * PRIMARY KEY up front; data columns arrive via ensureColumns.
    */
  private def ensureTable(conn: Connection, cfg: Config, schema: StructType): Unit =
    if (!tableExists(conn, cfg.table)) {
      val keyDefs = cfg.keyColumns.map { k =>
        val dt = schema.fields.find(_.name == k)
          .map(_.dataType).getOrElse(StringType)
        s"${q(k)} ${ddlType(dt, k, cfg.keyColumns, Set.empty)}"
      }
      val ddl = s"CREATE TABLE ${q(cfg.table)} (${keyDefs.mkString(", ")}, " +
        s"PRIMARY KEY (${cfg.keyColumns.map(q).mkString(", ")}))"
      execute(conn, ddl)
    }

  /** ALTER TABLE ADD COLUMN for fields the table lacks (`pgsql.go:162-238`;
    * like mysql we probe metadata first, `mysql.go:179-193`, because
    * standard SQL has no ADD COLUMN IF NOT EXISTS). Also WIDENS existing
    * VARCHAR data columns when this batch carries values longer than the
    * column: a column created VARCHAR(255) by a short-string first batch
    * must not fail the stream when a later batch exceeds 255 (truncation
    * SQLException with no recovery path short of manual DDL). Widening
    * tries CLOB first (Postgres-style ALTER TYPE) and falls back to the
    * widest VARCHAR for engines like Derby that can only grow VARCHARs.
    */
  private def ensureColumns(conn: Connection, cfg: Config,
      schema: StructType, longText: Set[String]): Unit = {
    val existing = columnMeta(conn, cfg.table)
    val dataFields = schema.fields.filterNot(f => cfg.keyColumns.contains(f.name))
    dataFields.filterNot(f => existing.contains(f.name.toLowerCase)).foreach { f =>
      execute(conn, s"ALTER TABLE ${q(cfg.table)} ADD COLUMN " +
        s"${q(f.name)} ${ddlType(f.dataType, f.name, cfg.keyColumns, longText)}")
    }
    dataFields.filter(f => longText.contains(f.name)).foreach { f =>
      existing.get(f.name.toLowerCase).foreach { case (typeName, size) =>
        if (typeName.toUpperCase.startsWith("VARCHAR") && size < WideVarchar) {
          val alter = s"ALTER TABLE ${q(cfg.table)} ALTER COLUMN ${q(f.name)} " +
            "SET DATA TYPE "
          try execute(conn, alter + "CLOB")
          catch { case _: java.sql.SQLException =>
            execute(conn, alter + s"VARCHAR($WideVarchar)") }
        }
      }
    }
  }

  /** Derby's VARCHAR ceiling — the fallback width when a dialect cannot
    * ALTER a VARCHAR into CLOB.
    */
  private val WideVarchar = 32672

  private def ensureLedger(conn: Connection): Unit =
    if (!tableExists(conn, LedgerTable))
      execute(conn, s"CREATE TABLE ${q(LedgerTable)} (" +
        s"${q("pipeline")} VARCHAR(128) NOT NULL, ${q("batch_id")} BIGINT NOT NULL, " +
        s"PRIMARY KEY (${q("pipeline")}, ${q("batch_id")}))")

  private def tableExists(conn: Connection, table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, table, null)
    try rs.next() finally rs.close()
  }

  /** lowercase column name -> (type name, size) from JDBC metadata. */
  private def columnMeta(conn: Connection, table: String): Map[String, (String, Int)] = {
    val rs = conn.getMetaData.getColumns(null, null, table, null)
    val out = scala.collection.mutable.Map.empty[String, (String, Int)]
    try {
      while (rs.next())
        out += rs.getString("COLUMN_NAME").toLowerCase ->
          ((rs.getString("TYPE_NAME"), rs.getInt("COLUMN_SIZE")))
    } finally rs.close()
    out.toMap
  }

  private def execute(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Delimited identifier — we never interpolate data into SQL (the
    * reference's `'`→`''` escaping, `pgsql.go:284-286`, is unnecessary
    * with prepared statements), but column/table names still need
    * quoting against reserved words (e.g. `key`).
    */
  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** Only genuine duplicate-key errors: SQLState 23505 (standard/Derby/
    * Postgres) always; SQLState 23000 only when the vendor code says
    * ER_DUP_ENTRY (1062) — MySQL-style drivers report EVERY integrity
    * violation under the generic 23000 state, so matching the state alone
    * would silently swallow e.g. a NOT NULL (vendor 1048) or FK violation
    * and drop the row while still counting it as written. Anything else
    * in class 23 propagates.
    */
  private[graft] def isDuplicateKey(e: java.sql.SQLException): Boolean =
    Option(e.getSQLState).exists {
      case "23505" => true
      case "23000" => e.getErrorCode == 1062 // MySQL ER_DUP_ENTRY
      case _ => false
    }

  // Spark Row values are already java.sql-friendly for our ladder
  private def jdbcValue(v: Any): AnyRef = v match {
    case null => null
    case b: Byte => java.lang.Long.valueOf(b.toLong)
    case s: Short => java.lang.Long.valueOf(s.toLong)
    case i: Int => java.lang.Long.valueOf(i.toLong)
    case f: Float => java.lang.Double.valueOf(f.toDouble)
    case other => other.asInstanceOf[AnyRef]
  }

  /** Per-partition writer: UPDATE-then-INSERT for last-write-wins,
    * INSERT-swallow-duplicate for insert-if-absent. Keys are disjoint
    * across partitions (hash repartition on key), so no retry loop.
    */
  private final class PartitionWriter(conn: Connection, table: String,
      cols: Seq[String], keyCols: Seq[String], mode: String) {

    private val dataCols = cols.filterNot(keyCols.contains)
    private val insertSql = s"INSERT INTO ${q(table)} (" +
      cols.map(q).mkString(", ") + ") VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    private val updateSql =
      if (dataCols.isEmpty) "" // key-only table: nothing to update
      else s"UPDATE ${q(table)} SET " +
        dataCols.map(c => s"${q(c)} = ?").mkString(", ") +
        " WHERE " + keyCols.map(k => s"${q(k)} = ?").mkString(" AND ")
    private val insert = conn.prepareStatement(insertSql)
    private val update =
      if (updateSql.isEmpty) null else conn.prepareStatement(updateSql)

    def upsert(row: Row): Unit = mode match {
      case Replace if update == null =>
        // key-only table: a present key IS the converged state, so
        // replace degenerates to insert-if-absent
        try doInsert(row)
        catch { case e: java.sql.SQLException if isDuplicateKey(e) => () }
      case Replace =>
        dataCols.zipWithIndex.foreach { case (c, i) =>
          update.setObject(i + 1, jdbcValue(row.getAs[Any](c)))
        }
        keyCols.zipWithIndex.foreach { case (k, i) =>
          update.setObject(dataCols.size + i + 1, jdbcValue(row.getAs[Any](k)))
        }
        if (update.executeUpdate() == 0) doInsert(row)
      case _ => // InsertIfAbsent: first write wins ≙ ON CONFLICT DO NOTHING
        try doInsert(row)
        catch { case e: java.sql.SQLException if isDuplicateKey(e) => () }
    }

    private def doInsert(row: Row): Unit = {
      cols.zipWithIndex.foreach { case (c, i) =>
        insert.setObject(i + 1, jdbcValue(row.getAs[Any](c)))
      }
      insert.executeUpdate()
    }

    def close(): Unit = {
      insert.close()
      if (update != null) update.close()
    }
  }
}
