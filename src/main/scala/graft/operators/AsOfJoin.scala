package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every probe row, the latest build row with the
  * same key and time ≤ the probe time. The canonical time-series
  * lookup (quotes-for-trades; here: latest sensor calibration for
  * each inference, the reference's sense→infer pairing,
  * /root/reference/simulator/codegen_cim.py:524-548 loop semantics).
  *
  * Spark has no ASOF JOIN operator; a naive spelling is a range
  * self-join whose per-key cost is O(|probe|·|build|). This is the
  * scalable union trick instead:
  *   1. tag probe (side=1) and build (side=0) rows, union them;
  *   2. ONE shuffle on the key, partition-local sort by (time, side)
  *      — build sorts before probe at equal times, giving ≥
  *      semantics;
  *   3. `last_value(..., ignoreNulls)` running window attaches the
  *      most recent build payload to every row;
  *   4. keep probe rows (inner: drop rows with no preceding build).
  * Cost is O(n log n) per key partition, state is one row — the
  * same shape DuckDB's native ASOF executes. Build must be unique
  * per (key, time); pre-aggregate it (the query contract spelling
  * does `max(value)` per timestamp).
  */
object AsOfJoin {

  /** Inner as-of join. Probe keeps all its columns; every non-key,
    * non-time build column arrives as `asof_<name>`, plus
    * `asof_<timeCol>` — the matched build timestamp.
    *
    * The whole build payload rides in ONE struct column through a
    * single `last(_, ignoreNulls)` window, so every attached field
    * comes from the same (most recent) build row even when some
    * payload values are legitimately NULL — per-column windows would
    * skip back to an older row for just the NULL column.
    *
    * `maxGap`: optional match tolerance (pandas merge_asof
    * `tolerance` semantics) — a probe row whose matched build time is
    * more than `maxGap` behind it is dropped (inner). The gap is
    * `probeTime - buildTime` in the column's own arithmetic, so pass
    * micros for the integer-time spelling or an INTERVAL literal for
    * raw timestamps. */
  def asOf(probe: DataFrame, build: DataFrame,
           keyCol: String, timeCol: String,
           maxGap: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val probeExtra = probe.columns.filterNot(c => c == keyCol || c == timeCol)
    val buildPay = build.columns.filterNot(c => c == keyCol || c == timeCol)
    val outPay = s"asof_$timeCol" +: buildPay.map(c => s"asof_$c")

    val reserved = Set("_t", "_side", "_b", "_r") ++ outPay
    val collide = probe.columns.toSet.intersect(reserved)
    require(collide.isEmpty,
      s"asOf: probe columns collide with internal/output names: ${collide.mkString(", ")}")

    val bStruct = struct(
      col(timeCol).as(s"asof_$timeCol") +:
        buildPay.map(c => col(c).as(s"asof_$c")): _*)
    val bStructType = build.select(bStruct.as("_b")).schema("_b").dataType

    val pSide = probe.select(
      Seq(col(keyCol), col(timeCol).as("_t"), lit(1).as("_side")) ++
        probeExtra.map(col) :+
        lit(null).cast(bStructType).as("_b"): _*)
    val bSide = build.select(
      Seq(col(keyCol), col(timeCol).as("_t"), lit(0).as("_side")) ++
        probeExtra.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
        bStruct.as("_b"): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = pSide.unionByName(bSide)
      .withColumn("_r", last(col("_b"), ignoreNulls = true).over(w))

    val matched = attached.filter(col("_side") === 1 && col("_r").isNotNull)
    val tolerated = maxGap.fold(matched)(g =>
      matched.filter(col("_t") - col("_r").getField(s"asof_$timeCol") <= g))
    tolerated
      .select(
        Seq(col(keyCol), col("_t").as(timeCol)) ++
          probeExtra.map(col) ++
          outPay.map(n => col("_r").getField(n).as(n)): _*)
  }
}
