package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all specs. */
object TestSpark {
  /** Hive-catalog-backed session (same facade the engine ships). */
  lazy val spark: SparkSession = GraftSession.create("4")
}
