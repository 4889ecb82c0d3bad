package graft

import graft.envelope.ChangeEvent
import graft.sinks.JdbcUpsert
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** JDBC upsert sink against embedded Derby (ships in /opt/spark/jars) —
  * the real-database check of the reference's pgsql/mysql sink semantics:
  * auto-create with key PK, auto-ALTER on drift, insert-if-absent
  * (first-write-wins ≙ ON CONFLICT DO NOTHING) vs replace
  * (last-write-wins ≙ REPLACE INTO), CLOB promotion for long text, the
  * applied-batch ledger, and the streaming CDC apply.
  */
class JdbcUpsertSpec extends SparkSpec {

  private def freshUrl(name: String) = s"jdbc:derby:memory:$name;create=true"

  private def queryAll(url: String, sql: String): Seq[Seq[Any]] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) out += (1 to n).map(rs.getObject)
      out.toSeq
    } finally conn.close()
  }

  test("replace mode: last write wins, table auto-created with key PK") {
    import spark.implicits._
    val url = freshUrl("repl")
    val cfg = JdbcUpsert.Config(url, "t_repl", keyColumns = Seq("k"))
    val b1 = Seq(("a", "v1", 1L), ("b", "v1", 2L)).toDF("k", "v", "n")
    assert(JdbcUpsert.write(b1, cfg) === 2)
    val b2 = Seq(("a", "v2", 10L), ("c", "v1", 3L)).toDF("k", "v", "n")
    assert(JdbcUpsert.write(b2, cfg) === 2)
    val rows = queryAll(url, "SELECT \"k\", \"v\", \"n\" FROM \"t_repl\" ORDER BY \"k\"")
    assert(rows === Seq(Seq("a", "v2", 10L), Seq("b", "v1", 2L), Seq("c", "v1", 3L)))
  }

  test("insertIfAbsent mode: first write wins (ON CONFLICT DO NOTHING)") {
    import spark.implicits._
    val url = freshUrl("ifabs")
    val cfg = JdbcUpsert.Config(url, "t_ifabs", keyColumns = Seq("k"),
      mode = JdbcUpsert.InsertIfAbsent)
    JdbcUpsert.write(Seq(("a", "first")).toDF("k", "v"), cfg)
    JdbcUpsert.write(Seq(("a", "second"), ("b", "first")).toDF("k", "v"), cfg)
    val rows = queryAll(url, "SELECT \"k\", \"v\" FROM \"t_ifabs\" ORDER BY \"k\"")
    assert(rows === Seq(Seq("a", "first"), Seq("b", "first")))
  }

  test("schema drift: new column auto-ALTERed, old rows read NULL") {
    import spark.implicits._
    val url = freshUrl("drift")
    val cfg = JdbcUpsert.Config(url, "t_drift", keyColumns = Seq("k"))
    JdbcUpsert.write(Seq(("a", "v1")).toDF("k", "v"), cfg)
    JdbcUpsert.write(Seq(("b", "v2", true)).toDF("k", "v", "flag"), cfg)
    val rows = queryAll(url,
      "SELECT \"k\", \"v\", \"flag\" FROM \"t_drift\" ORDER BY \"k\"")
    assert(rows === Seq(Seq("a", "v1", null), Seq("b", "v2", true)))
  }

  test("long strings promote to CLOB; short stay VARCHAR(255)") {
    import spark.implicits._
    val url = freshUrl("clob")
    val cfg = JdbcUpsert.Config(url, "t_clob", keyColumns = Seq("k"))
    val long = "x" * 5000
    JdbcUpsert.write(Seq(("a", long, "short")).toDF("k", "body", "note"), cfg)
    val conn = DriverManager.getConnection(url)
    val types = try {
      val rs = conn.getMetaData.getColumns(null, null, "t_clob", null)
      val m = scala.collection.mutable.Map.empty[String, String]
      while (rs.next()) m += rs.getString("COLUMN_NAME") -> rs.getString("TYPE_NAME")
      m.toMap
    } finally conn.close()
    assert(types("body") === "CLOB")
    assert(types("note") === "VARCHAR")
    // CAST materializes the CLOB before the connection closes
    val got = queryAll(url,
      "SELECT CAST(\"body\" AS VARCHAR(10000)) FROM \"t_clob\"")
    assert(got.head.head === long)
  }

  test("a VARCHAR column widens when a later batch brings longer strings") {
    import spark.implicits._
    val url = freshUrl("widen")
    val cfg = JdbcUpsert.Config(url, "t_widen", keyColumns = Seq("k"))
    // batch 1: short strings -> column created VARCHAR(255)
    JdbcUpsert.write(Seq(("a", "short")).toDF("k", "body"), cfg)
    // batch 2: >255 chars. Without widening this threw a truncation
    // SQLException in the partition writer and killed the stream.
    val long = "y" * 4000
    JdbcUpsert.write(Seq(("a", long), ("b", long)).toDF("k", "body"), cfg)
    val got = queryAll(url,
      "SELECT \"k\", CAST(\"body\" AS VARCHAR(10000)) FROM \"t_widen\" ORDER BY \"k\"")
    assert(got === Seq(Seq("a", long), Seq("b", long)))
  }

  test("complex columns serialize as JSON text (JSONB analog)") {
    import spark.implicits._
    val url = freshUrl("json")
    val cfg = JdbcUpsert.Config(url, "t_json", keyColumns = Seq("k"))
    val df = Seq(("a", Map("x" -> "1", "y" -> "2"))).toDF("k", "m")
    JdbcUpsert.write(df, cfg)
    val got = queryAll(url, "SELECT \"m\" FROM \"t_json\"").head.head.toString
    assert(got.contains("\"x\":\"1\"") && got.contains("\"y\":\"2\""))
  }

  test("applied-batch ledger: record once, re-apply detected") {
    val url = freshUrl("ledger")
    assert(!JdbcUpsert.isApplied(url, "p1", 7L))
    JdbcUpsert.recordApplied(url, "p1", 7L)
    assert(JdbcUpsert.isApplied(url, "p1", 7L))
    JdbcUpsert.recordApplied(url, "p1", 7L) // idempotent, no throw
    assert(!JdbcUpsert.isApplied(url, "p2", 7L))
    assert(!JdbcUpsert.isApplied(url, "p1", 8L))
  }

  test("applyCdcBatch: winner per key, deletes delete, delete-wins tie-break") {
    import spark.implicits._
    val url = freshUrl("cdc")
    val cfg = JdbcUpsert.Config(url, "t_cdc", keyColumns = Seq("repo", "path"))
    // seed key (r,a) so the delete has something to remove
    val seed = Seq((1L, "insert", "r", "a", "old"), (1L, "insert", "r", "b", "keep"))
      .toDF("lsn", "op", "repo", "path", "content")
    JdbcUpsert.applyCdcBatch(seed, cfg)
    val batch = Seq(
      (5L, "update", "r", "b", "b-v5"),
      (3L, "update", "r", "b", "b-v3"),     // loses to lsn 5
      (9L, "delete", "r", "a", ""),
      (9L, "insert", "r", "a", "ghost"),    // equal-lsn: delete wins
      (2L, "insert", "r", "c", "c-v2"))
      .toDF("lsn", "op", "repo", "path", "content")
    val (up, del) = JdbcUpsert.applyCdcBatch(batch, cfg)
    assert(up === 2 && del === 1)
    val rows = queryAll(url,
      "SELECT \"repo\", \"path\", \"content\" FROM \"t_cdc\" ORDER BY \"path\"")
    assert(rows === Seq(Seq("r", "b", "b-v5"), Seq("r", "c", "c-v2")))
  }

  test("streaming CdcJob with jdbc sink converges to the oracle") {
    import spark.implicits._
    val root = tmpDir("jdbc-stream")
    val url = freshUrl("stream")
    val events = Seq(
      ChangeEvent(1, "insert", ts(1), "r1", "a", "c1", "scala", "v1", Map.empty),
      ChangeEvent(2, "update", ts(2), "r1", "a", "c2", "scala", "v2", Map.empty),
      ChangeEvent(3, "insert", ts(3), "r2", "b", "c3", "go", "w1",
        Map("stars" -> "42")), // drift field -> ALTERed column
      ChangeEvent(4, "delete", ts(4), "r1", "a", "c4", "scala", "", Map.empty),
      ChangeEvent(5, "insert", ts(5), "r3", "c", "c5", "rust", "z1", Map.empty))
    events.toDS().withColumn("seg", lit(0))
      .write.partitionBy("seg").parquet(s"$root/log")
    val cfg = graft.job.CdcJobConfig(
      logDir = s"$root/log", tablePath = "", checkpointDir = s"$root/ckpt",
      checkpointId = "jdbc-e2e",
      jdbcSink = Some(JdbcUpsert.Config(url, "repos",
        keyColumns = Seq("repo", "path"))))
    val job = graft.job.CdcJob(spark, cfg)
    val stats = job.runToCompletion()
    assert(stats.nonEmpty && stats.forall(!_.skippedAsApplied))
    val rows = queryAll(url,
      "SELECT \"repo\", \"path\", \"content\", \"stars\" FROM \"repos\" ORDER BY \"repo\"")
    assert(rows === Seq(
      Seq("r2", "b", "w1", "42"),
      Seq("r3", "c", "z1", null)))
    // crash-replay analog: a fresh checkpoint re-applies every event;
    // key-idempotent upserts converge to the same state
    val job2 = graft.job.CdcJob(spark, cfg.copy(checkpointDir = s"$root/ckpt2",
      checkpointId = "jdbc-e2e-replay"))
    job2.runToCompletion()
    val rows2 = queryAll(url,
      "SELECT \"repo\", \"path\", \"content\" FROM \"repos\" ORDER BY \"repo\"")
    assert(rows2 === Seq(Seq("r2", "b", "w1"), Seq("r3", "c", "z1")))
  }

  private def ts(l: Long) = new java.sql.Timestamp(1735689600000L + l * 1000)

  test("duplicate-key detection is dialect-aware: 23505 always; 23000 only " +
      "with MySQL vendor code 1062; other integrity violations propagate") {
    def ex(state: String, vendor: Int) =
      new java.sql.SQLException("boom", state, vendor)
    // (sqlState, vendorCode) -> swallow-as-duplicate?
    val matrix = Seq(
      ("23505", 0)    -> true,  // standard/Derby/Postgres unique violation
      ("23505", 1062) -> true,
      ("23000", 1062) -> true,  // MySQL ER_DUP_ENTRY under generic state
      ("23000", 1048) -> false, // MySQL ER_BAD_NULL_ERROR — must propagate
      ("23000", 1452) -> false, // MySQL FK violation — must propagate
      ("23000", 0)    -> false, // generic integrity violation — propagate
      ("23502", 0)    -> false, // standard NOT NULL — propagate
      ("23503", 0)    -> false, // standard FK — propagate
      ("42000", 1062) -> false) // non-23 state never swallowed
    matrix.foreach { case ((state, vendor), expected) =>
      assert(JdbcUpsert.isDuplicateKey(ex(state, vendor)) === expected,
        s"state=$state vendor=$vendor")
    }
    assert(!JdbcUpsert.isDuplicateKey(new java.sql.SQLException("no state")))
  }
}
