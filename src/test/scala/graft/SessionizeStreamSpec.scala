package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Relational
import graft.streaming.SessionizeStream

/** Streaming gap-sessionization must converge to the batch operator's
  * exact output, across micro-batches, out-of-order arrival, the
  * event-time-timeout flush path, and checkpoint resume.
  */
class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1800L // seconds
  private def ts(s: String, us: Long = 0): Timestamp = {
    val t = Timestamp.valueOf(s)
    t.setNanos((us * 1000L).toInt)
    t
  }

  // user 1 and 2: two sessions each; user 3: one session, flushed ONLY
  // by the event-time timeout (it gets no later event of its own — the
  // watermark that closes it comes from user 1/2's sentinel progress).
  // A ±1 µs pair around user 2's gap boundary pins microsecond
  // exactness end-to-end through the stream.
  private val real = Seq(
    (1L, ts("2024-03-01 10:00:00")),
    (1L, ts("2024-03-01 10:20:00")),          // same session (gap 20m)
    (1L, ts("2024-03-01 11:30:00")),          // new session (gap 70m)
    (2L, ts("2024-03-01 09:00:00")),
    (2L, ts("2024-03-01 09:30:00")),          // exactly 1800s: same session
    (2L, ts("2024-03-01 10:00:00", 1)),       // 1800.000001s: NEW session
    (3L, ts("2024-03-01 12:00:00")),
    (3L, ts("2024-03-01 12:10:00"))
  )
  // sentinels park one open session per key far in the future; they are
  // never emitted (nothing ever closes them) but drive the watermark
  private val sentinels = Seq(
    (1L, ts("2024-03-11 00:00:00")),
    (2L, ts("2024-03-11 00:00:00")))

  private def writeSegment(dir: String, idx: Int,
      rows: Seq[(Long, Timestamp)]): Unit = {
    val seg = s"$dir/seg=$idx"
    rows.toDF("user_id", "ts").coalesce(1).write.parquet(seg)
    // file source orders by modification time: force strictly ascending
    val f = new java.io.File(seg)
    (f +: Option(f.listFiles()).getOrElse(Array.empty).toSeq)
      .foreach(_.setLastModified(1700000000000L + idx * 60000L))
  }

  private def runStream(logDir: String, outDir: String,
      ckpt: String): Unit = {
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$logDir/seg=*")
    val q = SessionizeStream
      .sessions(src, "user_id", "ts", Gap, "1 second")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  private def readOut(outDir: String): Set[(Long, Long, Long, Timestamp, Timestamp)] =
    spark.read.parquet(outDir)
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet

  test("streaming sessions equal the batch operator exactly, incl. the timeout-flushed key") {
    val root = tmpDir("sess-stream")
    val log = s"$root/log"; val out = s"$root/out"; val ck = s"$root/ck"
    // time-ordered segments so the watermark advances between batches;
    // user 3's session sits entirely in segment 2 and only ever sees
    // other keys' progress afterwards
    writeSegment(log, 0, real.filter(_._2.getTime < ts("2024-03-01 10:00:00").getTime))
    writeSegment(log, 1, real.filter(_._2.getTime >= ts("2024-03-01 10:00:00").getTime))
    writeSegment(log, 2, sentinels)
    runStream(log, out, ck)

    val expected = Relational.sessionize(real.toDF("user_id", "ts"),
        "user_id", "ts", Gap)
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(expected.size === 5) // 2 + 2 + 1 sessions
    assert(readOut(out) === expected,
      "append-mode stream output must equal batch sessionize on the real events")
  }

  test("random log property: streaming equals batch across arbitrary micro-batch boundaries") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-05-01 00:00:00").getTime
    // 5 keys × ~40 events over ~6 h at second+microsecond granularity:
    // plenty of sub-gap runs and some super-gap splits at gap=1800 s
    val events = (0 until 200).map { _ =>
      val t = new Timestamp(base + rnd.nextInt(21600) * 1000L)
      t.setNanos(rnd.nextInt(1000000) * 1000)
      (rnd.nextInt(5).toLong + 10L, t)
    }
    val root = tmpDir("sess-prop")
    val log = s"$root/log"; val out = s"$root/out"; val ck = s"$root/ck"
    // time-ordered segmentation at arbitrary cut points (micro-batch
    // boundaries are an accident of delivery, not of semantics); the
    // single far-future sentinel drives the watermark past everything —
    // keys 11-14 must flush purely via EventTimeTimeout
    val sorted = events.sortBy(e => (e._2.getTime, e._2.getNanos))
    val cuts = Seq(0, 47, 103, 160, 200)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      writeSegment(log, i, sorted.slice(a, b))
    }
    writeSegment(log, cuts.size - 1, Seq((10L, ts("2024-06-01 00:00:00"))))
    runStream(log, out, ck)
    val expected = Relational.sessionize(events.toDF("user_id", "ts"),
        "user_id", "ts", Gap)
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(expected.nonEmpty)
    assert(readOut(out) === expected)
  }

  test("checkpoint resume continues session_seq from state, exactly once") {
    val root = tmpDir("sess-resume")
    val log = s"$root/log"; val out = s"$root/out"; val ck = s"$root/ck"
    writeSegment(log, 0, real)
    writeSegment(log, 1, sentinels)
    runStream(log, out, ck)
    val firstRun = readOut(out)
    assert(firstRun.map(r => (r._1, r._2)) ===
      Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L)))

    // user 3 comes back after the sentinels (admissible: ≥ watermark),
    // and a later sentinel pushes the watermark past its new session
    writeSegment(log, 2, Seq((3L, ts("2024-03-12 08:00:00")),
      (3L, ts("2024-03-12 08:05:00"))))
    writeSegment(log, 3, Seq((1L, ts("2024-03-20 00:00:00"))))
    runStream(log, out, ck)
    val delta = readOut(out) -- firstRun
    // the +20d sentinel also pushes the watermark past the ORIGINAL
    // +10d sentinels' flush points, so their single-event sessions
    // finalize too — each with the NEXT seq for its key, proving the
    // per-key counter survived the checkpoint
    assert(delta === Set(
      (3L, 2L, 2L, ts("2024-03-12 08:00:00"), ts("2024-03-12 08:05:00")),
      (1L, 3L, 1L, ts("2024-03-11 00:00:00"), ts("2024-03-11 00:00:00")),
      (2L, 3L, 1L, ts("2024-03-11 00:00:00"), ts("2024-03-11 00:00:00"))),
      "resumed stream must emit exactly the newly-closed sessions with continued seqs")
  }
}
