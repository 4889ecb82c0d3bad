package graft

import graft.envelope.ChangeEvent
import graft.lake.LakeTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** North-star property: repeated / duplicated / shuffled delivery of the
  * same logical op sequence must converge the lake to the identical final
  * state (order-independent, exactly-once convergence). ScalaCheck
  * generators sampled at fixed seeds (no scalatestplus bridge in the
  * offline cache).
  */
class ConvergencePropertySpec extends SparkSpec {

  private def ev(lsn: Long, op: String, key: Int): ChangeEvent =
    ChangeEvent(lsn, op, new java.sql.Timestamp(0), s"r${key % 5}",
      s"p${key % 13}", f"c$lsn%040d", "scala", s"content-$lsn-k$key",
      Map.empty)

  private val opGen: Gen[String] =
    Gen.frequency(4 -> "insert", 4 -> "update", 2 -> "delete")

  private val seqGen: Gen[List[ChangeEvent]] = for {
    n <- Gen.choose(5, 40)
    ops <- Gen.listOfN(n, opGen)
    keys <- Gen.listOfN(n, Gen.choose(0, 12))
  } yield ops.zip(keys).zipWithIndex.map { case ((op, k), i) =>
    ev(i.toLong, op, k)
  }

  private def applyInBatches(events: Seq[ChangeEvent], splits: Int,
      dir: String): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val lake = LakeTable(spark, dir, Seq("repo", "path"), 4)
    lake.createIfAbsent(StructType.fromDDL(
      "repo STRING, path STRING, commit STRING, lang STRING, content STRING"))
    val chunks =
      if (splits <= 1) Seq(events)
      else events.grouped(math.max(1, events.size / splits)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      if (chunk.nonEmpty) lake.merge(chunk.toDS().toDF(), "prop", i.toLong)
    }
    lake.read().select("repo", "path", "commit", "content")
      .collect().map(r => r).sortBy(_.toString).toSeq
  }

  test("shuffled + duplicated delivery converges to the same final state") {
    val params = Gen.Parameters.default
    (1 to 8).foreach { i =>
      val events = seqGen.pureApply(params, Seed(42L + i))
      assert(events.nonEmpty)
      val rnd = new scala.util.Random(1000L * i)
      // duplicated (redelivered) and shuffled variant of the same log
      val dup = events ++ rnd.shuffle(events).take(events.size / 2)
      val shuffled = rnd.shuffle(dup)

      val base = applyInBatches(events, 1, tmpDir("prop-a"))
      val alt = applyInBatches(shuffled, 3, tmpDir("prop-b"))
      assert(base.map(_.toString) === alt.map(_.toString),
        s"divergence at sample $i")
    }
  }
}
