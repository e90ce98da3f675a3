package graft

/** Dev tool (RunOne/PlanDump family): per-entry Spark job/stage/task
  * census — the duplicate-action detector the optimization rounds
  * sweep with. One warm uncounted pass, then one counted pass; call
  * from a spark-shell session with the library on the classpath:
  *   graft.JobCount.run(Seq("eng_pagerank", ...), sfDir)
  * High job counts are not automatically waste: AQE materializes one
  * job per query stage, so protocol entries legitimately run many —
  * compare against the entry's known step structure. */
object JobCount {
  def run(names: Seq[String], dir: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val fns = SparkEntry.queries
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try names.foreach { n =>
      // warm pass not counted
      fns(n)(spark, dir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fns(n)(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobcount] $n%-28s ${dt}%7.3f s  jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d")
    } finally spark.sparkContext.removeSparkListener(listener)
    println("JOBCOUNT DONE")
  }
}
