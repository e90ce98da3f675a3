package graft

import org.apache.spark.sql.SparkSession

/** Session facade — the engine's public entry point (API analog of
  * the reference's `CIM(config)` SDK object,
  * /root/reference/imc22_sdk/python/imc22.py:133-187).
  *
  * Centralizes the scale-tuned configuration so Verify, Bench, tests
  * and library users build identical sessions:
  *  - AQE on (runtime re-plan, skew-join splitting — the engine's
  *    answer to the reference's cost-based partitioner §4);
  *  - shuffle partitions sized to cores for local mode (a cluster
  *    deployment overrides via --conf; AQE coalesces down anyway);
  *  - UTC session time zone (oracle comparability);
  *  - broadcast threshold left at default 10 MB — all dimension
  *    tables (region/nation/customer/supplier/part) broadcast at
  *    every tested SF.
  */
object GraftSession {

  def builder(cores: String = "4"): SparkSession.Builder = {
    // Hive-compatible catalog (the north-star "Spark SQL + Hive
    // metastore" layer): managed/external tables, databases, and
    // DDL resolve through a real HMS client. The embedded derby
    // metastore gets a per-JVM path so concurrent driver runs never
    // contend on derby's single-instance lock; a cluster deployment
    // points ConnectionURL at the shared metastore instead.
    val metastoreDir = s"${System.getProperty("java.io.tmpdir")}/graft_metastore_${ProcessHandle.current().pid()}"
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      // engine optimizer passes (e.g. HOF dot-product fold →
      // codegen'd VecDotExpr); cluster deployments can equivalently
      // set spark.sql.extensions=graft.plans.GraftExtensions
      .withExtensions(new graft.plans.GraftExtensions)
      .enableHiveSupport()
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDir;create=true")
      // warehouse lives beside the metastore: a fresh metastore must
      // not see a previous JVM's managed-table directories
      .config("spark.sql.warehouse.dir", s"$metastoreDir-warehouse")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      // write timestamps as INT64 TIMESTAMP_MICROS, not the legacy
      // INT96 default: INT96 carries no usable parquet min/max stats,
      // which silently disables ALL row-group skipping on time
      // predicates — the single biggest scan-pruning lever for
      // event-time data at scale (asserted by LayoutSpec's
      // eng_zorder_scan pruning test)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Coalesce to the advisory partition SIZE instead of padding
      // out to default parallelism (the Spark-docs-recommended
      // production setting): small post-shuffle stages collapse to
      // few tasks instead of fanning 32 near-empty ones. Measured
      // (FloorLab, interleaved A/B over the full headline set,
      // sf0.1): −15% vs parallelism-first at the same advisory size.
      // At cluster scale this is what keeps reducer counts
      // proportional to data, not to spark.sql.shuffle.partitions.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // LOCAL-MODE advisory size: on a single 32-thread node the
      // sub-GB bench stages need small reducers to keep the cores
      // busy — 1 MB beats the 64 MB default by another −13% headline
      // (FloorLab: 61.1 s vs 72.1 s) and un-serializes few-group
      // aggregates like qa16's 3-group exact percentile (3.6 MB of
      // buffers → 1 task at 64 MB). A CLUSTER deployment must keep
      // the 64-256 MB default via --conf: 1 MB reducers at 100 TB
      // would explode the task count — this value is sized to the
      // local[32] test rig the builder hard-codes two lines up, and
      // travels with that master setting, not with the engine.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
  }

  def create(cores: String = "4"): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }

  /** Session + tables registered: ready to run any inventory query. */
  def createWithTables(dir: String, cores: String = "4"): SparkSession = {
    val s = create(cores)
    Tables.register(s, dir)
    s
  }
}
