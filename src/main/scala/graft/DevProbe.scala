package graft

/** Throwaway dev probe — not part of the library; deleted before commit. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    Tables.register(spark, "/root/testdata/sf0.001")
    def t(label: String, sql: String): Unit =
      try {
        val r = spark.sql(sql)
        val n = r.count()
        println(s"PROBE-OK $label rows=$n schema=${r.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", ")}")
        r.show(3, false)
      } catch { case e: Throwable => println(s"PROBE-ERR $label: ${e.getMessage.take(250).replace('\n',' ')}") }
    t("listagg", "SELECT r_regionkey, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_regionkey ORDER BY r_regionkey LIMIT 2")
    t("ignore_nulls", "SELECT event_id, last_value(CASE WHEN event_type='error' THEN NULL ELSE value END) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnn FROM events LIMIT 3")
    t("nth_value", "SELECT event_id, nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n3 FROM events LIMIT 3")
    t("pivot", "SELECT * FROM (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem) PIVOT (CAST(ROUND(sum(l_quantity), 4) AS DECIMAL(38,4)) AS q FOR l_linestatus IN ('O' AS o, 'F' AS f)) ORDER BY l_returnflag")
    t("pivot_plain", "SELECT * FROM (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem) PIVOT (sum(l_quantity) FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f)) ORDER BY l_returnflag")
    t("width_bucket", "SELECT width_bucket(o_totalprice, 0, 500000, 10) AS b, count(*) AS c FROM orders GROUP BY 1 ORDER BY 1 LIMIT 3")
    t("median_mode", "SELECT o_orderstatus, median(o_totalprice) AS med FROM orders GROUP BY 1 ORDER BY 1 LIMIT 3")
    t("regr", "SELECT ROUND(regr_slope(l_extendedprice, l_quantity),4) s, ROUND(regr_intercept(l_extendedprice, l_quantity),4) i, ROUND(regr_r2(l_extendedprice, l_quantity),4) r2, ROUND(covar_samp(l_quantity, l_extendedprice),4) cs FROM lineitem")
    t("bitagg", "SELECT o_orderstatus, bit_and(o_orderkey) ba, bit_or(o_orderkey) bo, bit_xor(o_orderkey) bx FROM orders GROUP BY 1 ORDER BY 1 LIMIT 2")
    t("array_ops", "SELECT p_partkey, array_join(array_sort(array_intersect(split(p_name,' '), array('olive','green','red'))), ',') AS inter, array_join(array_sort(array_except(split(p_name,' '), array('olive'))), ',') AS exc, array_contains(split(p_name,' '),'green') AS hg FROM part ORDER BY p_partkey LIMIT 5")
    t("regexp_all", "SELECT p_partkey, array_join(regexp_extract_all(p_name, '([a-z]+)', 1), '|') AS toks FROM part LIMIT 3")
    t("session_window", "SELECT user_id, unix_micros(session_window.start) AS ss, unix_micros(session_window.end) AS se, count(*) AS cnt FROM events GROUP BY user_id, session_window(ts, '30 minutes') ORDER BY user_id, ss LIMIT 3")
    t("cume_dist", "SELECT c_custkey, ROUND(cume_dist() OVER (ORDER BY c_acctbal, c_custkey),4) cd FROM customer LIMIT 3")
    spark.stop()
  }
}
