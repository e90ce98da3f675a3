package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Per-operator execution profiler — the engine analog of the
  * reference's per-layer PerformanceProfiler
  * (/root/reference/simulator/profiler.py:71-166: snapshot stats
  * around each layer, derive cycles/time/utilization, CSV export).
  *
  * Here the "layers" are physical operators: after an action we walk
  * the executed plan (through AQE's final plan) and harvest each
  * operator's SQLMetrics (rows, time, spill, shuffle bytes). */
object Profiler {

  final case class OperatorStat(query: String, depth: Int, operator: String,
                                metric: String, value: Long)

  final case class ProfileResult(query: String, wallSec: Double, rows: Long,
                                 stats: Seq[OperatorStat])

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def walk(query: String, p: SparkPlan, depth: Int): Seq[OperatorStat] = {
    val here = p.metrics.toSeq.map { case (name, m) =>
      OperatorStat(query, depth, p.nodeName, name, m.value)
    }
    here ++ p.children.flatMap(c => walk(query, finalPlan(c), depth + 1))
  }

  /** Executes the frame (count action) and harvests operator metrics. */
  def profile(name: String, df: DataFrame): ProfileResult = {
    val t0 = System.nanoTime()
    val rows = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val plan = finalPlan(df.queryExecution.executedPlan)
    ProfileResult(name, wall, rows, walk(name, plan, 0))
  }

  /** CSV export, reference-style (profiling_report.csv analog). */
  def toCsv(results: Seq[ProfileResult]): String = {
    val header = "query,wall_sec,rows,depth,operator,metric,value"
    val lines = results.flatMap { r =>
      r.stats.map(s =>
        s"${r.query},${r.wallSec},${r.rows},${s.depth},${s.operator.replace(",", ";")},${s.metric.replace(",", ";")},${s.value}")
    }
    (header +: lines).mkString("\n")
  }
}
