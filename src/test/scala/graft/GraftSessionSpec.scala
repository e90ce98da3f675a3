package graft

import org.scalatest.funsuite.AnyFunSuite

/** The local-only AQE tunings must travel with the LOCAL master, not
  * with the engine: a cluster session inheriting the 1 MB advisory
  * reducer size would explode task counts at 100 TB, so builder()
  * applies those configs only when the resolved master is local. */
class GraftSessionSpec extends AnyFunSuite {

  test("local masters get the measured AQE tunings; cluster masters keep Spark defaults") {
    val local = GraftSession.localTunings("local[32]").toMap
    assert(local("spark.sql.adaptive.advisoryPartitionSizeInBytes") == "1m")
    assert(local("spark.sql.adaptive.coalescePartitions.parallelismFirst") == "false")
    assert(local("spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == "1000000")
    assert(GraftSession.localTunings("local").nonEmpty)
    assert(GraftSession.localTunings("local[4,2]").nonEmpty)
    assert(GraftSession.localTunings("yarn").isEmpty)
    assert(GraftSession.localTunings("spark://host:7077").isEmpty)
    assert(GraftSession.localTunings("k8s://https://host:443").isEmpty)
    // local-cluster[…] is Spark's multi-JVM pseudo-cluster — it
    // exists to SIMULATE distributed behavior, so it must get the
    // production defaults, not the single-node tunings
    assert(GraftSession.localTunings("local-cluster[2,1,1024]").isEmpty)
  }

  test("the live (local) test session carries the local tunings") {
    val s = TestSpark.spark
    assert(s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") == "1m")
    assert(s.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst") == "false")
  }
}
