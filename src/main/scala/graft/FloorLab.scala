package graft

/** Dev tool: A/B per-query-floor experiments. Runs the full headline
  * inventory under named SQLConf variants (runtime-settable AQE
  * knobs), interleaved (variantA pass, variantB pass, repeat) so host
  * noise can't bias one variant, and prints per-variant min-of-N
  * totals plus the biggest per-query deltas. Usage:
  *   runMain graft.FloorLab [sfDir] [passes]
  */
object FloorLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Tables.register(spark, sfDir)
    spark.sql(QueryInventory.qa1.sparkSql).count() // warm-up
    sources.BucketedTables.ensureFacts(spark, sfDir)
    val fns = SparkEntry.queries
    val names = QueryInventory.all.map(_.name)

    // variant sets are an experiment log — swap in the pair under
    // study. Historical: advisory size ladder (64m/4m/1m — 1m won,
    // now the gated GraftSession local default). Current: the
    // ObjectHashAggregate sort-based fallback threshold — Spark's
    // default of 128 in-memory keys demotes EVERY collect_list/
    // collect_set aggregate to sort-based aggregation almost
    // immediately.
    val variants: Seq[(String, Map[String, String])] = Seq(
      "oha_fallback_128" -> Map(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "128"),
      "oha_fallback_1m" -> Map(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1000000"))

    val best = scala.collection.mutable.Map[(String, String), Double]()
    // codegen warm both variants before timing
    for ((_, conf) <- variants) {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      names.take(5).foreach(n =>
        fns(n)(spark, sfDir).write.format("noop").mode("overwrite").save())
    }
    for (p <- 1 to passes; (vname, conf) <- variants) {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      names.foreach { n =>
        val t0 = System.nanoTime()
        // one throwing entry must not abort the whole interleaved run
        // and discard every timing already collected
        try {
          fns(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          val k = (vname, n)
          best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
        } catch { case e: Throwable =>
          System.err.println(s"[floorlab] $n failed under $vname: ${e.getMessage}")
        }
      }
      System.err.println(s"[floorlab] pass $p variant $vname done")
    }
    val measured = names.filter(n => variants.forall(v => best.contains((v._1, n))))
    if (measured.size < names.size)
      System.err.println(s"[floorlab] ${names.size - measured.size} entries failed and are excluded from totals")
    for ((vname, _) <- variants) {
      val total = measured.map(n => best((vname, n))).sum
      println(f"[floorlab] variant=$vname%-22s total=$total%8.2fs (${measured.size} entries)")
    }
    val deltas = measured.map { n =>
      n -> (best((variants.last._1, n)) - best((variants.head._1, n)))
    }.sortBy(_._2)
    (deltas.take(8) ++ deltas.takeRight(8)).foreach { case (n, d) =>
      println(f"[floorlab]   $n%-28s delta=$d%+7.3fs " +
        f"(base=${best((variants.head._1, n))}%6.3f)")
    }
    spark.stop()
  }
}
