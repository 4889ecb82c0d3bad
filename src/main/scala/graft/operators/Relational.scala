package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins, composed from existing
  * ops so Catalyst keeps optimizing around them (preference (a) of the
  * custom-operator ladder — no custom plan nodes needed).
  *
  * Both operators here are single-shuffle by construction: they
  * repartition once on the join/group key and do all per-key work inside
  * the resulting sort (window functions over `partitionBy(key)`), so at
  * cluster scale the cost is one exchange + an external sort — no
  * broadcast of the big side, no O(n·m) expansion, no driver state.
  */
object Relational {

  /** Distributed AS-OF join: for each left row, the single right row with
    * the greatest `rightTime <= leftTime` for the same key. Inner
    * semantics by default (left rows with no eligible right row are
    * dropped); `leftOuter = true` keeps them with NULL `asof_*` columns —
    * the usual enrichment shape ("attach the latest reading, if any").
    *
    * Implementation is the canonical union-and-sweep shape, not a range
    * join: tag both sides, union them, and per key sweep time-ascending
    * carrying the last-seen right payload (`last(_, ignoreNulls) over
    * rowsBetween(unboundedPreceding, currentRow)`). ONE hash exchange on
    * the key + ONE sort — wall-clock is O((|L|+|R|) log) per partition
    * regardless of how many right rows precede each left row, where the
    * naive `JOIN ... ON t_r <= t_l` + row_number explodes as O(|L|·|R|)
    * per key first. Right rows at exactly `leftTime` sort before left
    * rows (side 0 < 1), giving inclusive `<=`.
    *
    * Ties among right rows with identical (key, time) are broken
    * deterministically by the LARGEST right payload struct (lexicographic
    * by `rightCols` order) — callers wanting a specific tie-break put the
    * tiebreak column first in `rightCols`.
    *
    * Output: every left column, then `rightCols` renamed `asof_<col>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               leftOuter: Boolean = false): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must be non-empty")
    // reserved internal + output names: a caller column named like one
    // would be silently shadowed or ambiguous (ADVICE r5)
    val reserved = Set("__k", "__t", "__side", "__r", "__lv", "__m")
    val outNames = rightCols.map(c => s"asof_$c").toSet
    (left.columns ++ right.columns).foreach { c =>
      require(!reserved.contains(c),
        s"asofJoin: column name '$c' collides with a reserved internal name")
    }
    left.columns.foreach { c =>
      require(!outNames.contains(c),
        s"asofJoin: left column '$c' collides with output column '$c'")
    }
    val leftCols = left.columns.toSeq
    val rStruct = struct(rightCols.map(right(_)): _*)
    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(left(_)): _*).as("__l"))
    val rSide = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      rStruct.as("__r"))
    val rType = rSide.schema("__r").dataType
    val lType = lSide.schema("__l").dataType
    val u =
      lSide.select(col("__k"), col("__t"), col("__side"),
          lit(null).cast(rType).as("__r"), col("__l").as("__lv"))
        .unionAll(rSide.select(col("__k"), col("__t"), col("__side"),
          col("__r"), lit(null).cast(lType).as("__lv")))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = u
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val matched =
      if (leftOuter) swept.filter(col("__side") === 1)
      else swept.filter(col("__side") === 1 && col("__m").isNotNull)
    val out: Seq[Column] =
      leftCols.map(c => col(s"__lv.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }

  /** Distributed RANGE (interval) join: all (left, right) pairs with the
    * same key and `rightTime ∈ [leftTime + lowerSeconds, leftTime +
    * upperSeconds]` (both ends inclusive).
    *
    * A naive `l.k = r.k AND r.t BETWEEN …` plans as an equi-join on the
    * key with the range as a residual filter — per hot key that is an
    * O(|L|·|R|) comparison loop. This implementation bins time into
    * buckets of the window width W = upper − lower: the right side lands
    * in bucket ⌊t/W⌋, the left side explodes to the ≤ 2 buckets its
    * window overlaps, and the join is a plain equi-join on
    * (key, bucket) — group sizes are bounded by events-per-key-per-W,
    * not events-per-key, so a key that is hot over a long time span no
    * longer concentrates a partition. One explode (≤ 2× left), one
    * shuffle, exact interval post-filter.
    *
    * Time columns must be TIMESTAMP, or TIMESTAMP_NTZ under a
    * fixed-offset session timezone: bucketing needs not just a consistent
    * monotone mapping but one under which every window spans ≤ W. For
    * TIMESTAMP the mapping is the identity; for NTZ the bucketing cast
    * runs in the SESSION zone, which under a fixed offset (UTC, GMT+k) is
    * a pure translation — monotone and width-preserving, so the
    * ≤2-bucket explode stays exact and agrees with the NTZ-domain
    * interval filter. Under a zone with DST rules the mapping is not
    * affine (a wall-clock window crossing a fall-back transition covers
    * W+3600 s of instants, overflowing the explode and silently dropping
    * pairs), so NTZ + DST-rules zone is rejected up front. The final
    * range filter compares the raw timestamps with interval arithmetic.
    *
    * Output: every left column, then `rightCols` renamed `r_<col>`.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTime: String, rightTime: String,
                lowerSeconds: Long, upperSeconds: Long,
                rightCols: Seq[String]): DataFrame = {
    require(upperSeconds > lowerSeconds, "window must have positive width")
    require(rightCols.nonEmpty, "rightCols must be non-empty")
    // Bucketing and the exact interval filter must live in the same time
    // domain (ADVICE r5). TIMESTAMP is instant-based on both sides.
    // TIMESTAMP_NTZ buckets through a session-zone cast: sound iff the
    // zone is a fixed offset (the cast is then a translation — monotone,
    // window widths preserved); under DST rules a fall-back-crossing
    // window covers W+3600 s of instants, exceeding the ≤2-bucket left
    // explode and silently dropping valid pairs — rejected loudly.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    lazy val sessionZoneFixed = java.time.ZoneId
      .of(left.sparkSession.conf.get("spark.sql.session.timeZone"))
      .getRules.isFixedOffset
    def checkTime(df: DataFrame, c: String): Unit =
      df.schema(c).dataType match {
        case TimestampType => ()
        case TimestampNTZType if sessionZoneFixed => ()
        case TimestampNTZType => throw new IllegalArgumentException(
          s"rangeJoin: $c must be TIMESTAMP (instant) when the session " +
            "timezone has DST rules — timestamp_ntz bucketing is only " +
            "width-exact under a fixed-offset zone")
        case other => throw new IllegalArgumentException(
          s"rangeJoin: $c must be TIMESTAMP, got ${other.simpleString}")
      }
    checkTime(left, leftTime)
    checkTime(right, rightTime)
    val reserved = Set("__bucket", "__rk", "__rt", "__rbucket")
    val outNames = rightCols.map(c => s"r_$c").toSet
    (left.columns ++ right.columns).foreach { c =>
      require(!reserved.contains(c),
        s"rangeJoin: column name '$c' collides with a reserved internal name")
    }
    left.columns.foreach { c =>
      require(!outNames.contains(c),
        s"rangeJoin: left column '$c' collides with output column '$c'")
    }
    val widthUs = (upperSeconds - lowerSeconds) * 1000000L
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    // exact long floor-division (a may be negative; pmod is non-negative,
    // so the numerator is an exact multiple of the width and the double
    // division below is exact for any realistic bucket index)
    def floorDiv(a: Column): Column =
      ((a - pmod(a, lit(widthUs))) / lit(widthUs)).cast("long")
    val lower = make_dt_interval(lit(0), lit(0), lit(0), lit(lowerSeconds))
    val upper = make_dt_interval(lit(0), lit(0), lit(0), lit(upperSeconds))
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__bucket", explode(sequence(
      floorDiv(micros(col(leftTime)) + lit(lowerSeconds * 1000000L)),
      floorDiv(micros(col(leftTime)) + lit(upperSeconds * 1000000L)))))
    val r = right.select(
      (col(rightKey).as("__rk") +: col(rightTime).as("__rt") +:
        floorDiv(micros(col(rightTime))).as("__rbucket") +:
        rightCols.map(c => right(c).as(s"r_$c"))): _*)
    l.join(r,
        col(leftKey) === col("__rk") && col("__bucket") === col("__rbucket") &&
          col("__rt") >= col(leftTime) + lower &&
          col("__rt") <= col(leftTime) + upper)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"r_$c"))): _*)
  }

  /** Gap-based sessionization: per key, time-ordered events split into
    * sessions wherever the gap to the previous event exceeds
    * `gapSeconds`. Returns one row per session: key, 1-based
    * `session_seq`, `n_events`, `session_start`, `session_end`.
    *
    * Two window passes + one aggregate, all `partitionBy(key)` — Catalyst
    * plans ONE exchange and reuses the sort across both windows and the
    * final hash aggregate's partial side.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    // exact microsecond arithmetic via interval comparison — timezone-free,
    // works for TIMESTAMP and TIMESTAMP_NTZ alike (unix_timestamp would
    // truncate to seconds; unix_micros rejects NTZ)
    val gap = make_dt_interval(lit(0), lit(0), lit(0), lit(gapSeconds))
    val newSession =
      when(col("__prev").isNull, 1)
        .otherwise((col(tsCol) - col("__prev") > gap).cast("int"))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byTime))
      .withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }
}
