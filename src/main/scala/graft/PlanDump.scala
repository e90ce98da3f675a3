package graft

/** Dev tool: write `.explain("formatted")` output for named inventory
  * entries to `<outDir>/<name>_<tag>.txt` — the per-round plan
  * evidence the optimization rounds commit under plans/rNN/. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <tag> <name> [<name> ...]
  * Entries whose builder runs driver-side actions (multi-stage
  * scenario entries) dump the RETURNED frame's plan — the per-stage
  * evidence for those lives in the optimization notes instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, rest @ _*) = args: @unchecked
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    Tables.register(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val fns = SparkEntry.queries
    rest.foreach { name =>
      val plan =
        try fns(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"<failed: ${e.getMessage}>" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), plan)
      System.err.println(s"[plandump] wrote $name")
    }
    spark.stop()
  }
}
