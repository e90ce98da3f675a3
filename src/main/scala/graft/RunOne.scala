package graft

/** Dev tool: run named inventory/engine queries once and print
  * per-query wall time + row count. Usage:
  *   runMain graft.RunOne <sfDir> <name> [<name> ...]
  * Times a noop-sink write (same fidelity as Bench). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Tables.register(spark, sfDir)
    spark.sql(QueryInventory.qa1.sparkSql).count() // warm-up
    val fns = SparkEntry.queries
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = fns(name)(spark, sfDir)
      val n = df.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = (System.nanoTime() - t2) / 1e9
      println(f"[runone] $name%-28s count=$n%-8d first=$t1%8.3fs noop=$t3%8.3fs")
    }
    spark.stop()
  }
}
