package graft

import org.apache.spark.sql.types.StructType

/** Startup schema-contract check for the driver tables — the
  * generalization of the `ts` drift guard (Tables.normalizeTs) to
  * every table/column/dtype. The round-5 outage was a testdata
  * regeneration silently changing `events.ts` from TIMESTAMP(NANOS)
  * to TIMESTAMP(MICROS): view registration died in an
  * AnalysisException cascade pages away from the cause. This check
  * turns any such drift into ONE actionable line at registration
  * time: which table, which column, what was read, what the contract
  * (FIXTURES.md §A) expects, and where to extend the normalizer.
  *
  * Types are matched by FAMILY (any integral width, float|double,
  * timestamp with or without zone) — width drift is harmless to query
  * semantics under the DuckDB oracle (both engines read the same
  * file), so only genuine kind changes (e.g. timestamp → string) and
  * missing columns fail. Extra columns are allowed (additive
  * generator changes must not block a round). */
object SchemaContract {

  /** column → acceptable Spark simpleString type families. */
  private val integral = Set("tinyint", "smallint", "int", "bigint")
  private val fractional = Set("float", "double")
  private val ts = Set("timestamp", "timestamp_ntz")
  private val str = Set("string")
  private val vec = Set("array<float>", "array<double>")

  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> integral, "r_name" -> str),
    "nation" -> Seq("n_nationkey" -> integral, "n_name" -> str,
      "n_regionkey" -> integral),
    "customer" -> Seq("c_custkey" -> integral, "c_name" -> str,
      "c_nationkey" -> integral, "c_acctbal" -> fractional,
      "c_mktsegment" -> str),
    "supplier" -> Seq("s_suppkey" -> integral, "s_name" -> str,
      "s_nationkey" -> integral, "s_acctbal" -> fractional),
    "part" -> Seq("p_partkey" -> integral, "p_name" -> str,
      "p_brand" -> str, "p_type" -> str, "p_size" -> integral,
      "p_retailprice" -> fractional),
    "orders" -> Seq("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> str, "o_totalprice" -> fractional,
      "o_orderdate" -> ts, "o_orderpriority" -> str),
    "lineitem" -> Seq("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> fractional, "l_extendedprice" -> fractional,
      "l_discount" -> fractional, "l_tax" -> fractional,
      "l_returnflag" -> str, "l_linestatus" -> str, "l_shipdate" -> ts),
    // events is checked POST-normalizeTs: ts must come out LTZ
    // timestamp whatever the file held (long-ns / NTZ / LTZ)
    "events" -> Seq("event_id" -> integral, "ts" -> Set("timestamp"),
      "user_id" -> integral, "event_type" -> str, "value" -> fractional,
      "props" -> str),
    "documents" -> Seq("doc_id" -> integral, "text" -> str,
      "lang" -> str, "source" -> str, "n_chars" -> integral),
    "embeddings" -> Seq("vec_id" -> integral, "embedding" -> vec,
      "label" -> integral))

  /** All contract violations for one table ("" = clean). */
  def violations(table: String, schema: StructType): Seq[String] = {
    val byName = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    expected.getOrElse(table, Seq.empty).flatMap { case (colName, ok) =>
      byName.get(colName) match {
        case None =>
          Some(s"$table.$colName missing (read columns: ${schema.fieldNames.mkString(", ")})")
        case Some(actual) if !ok.contains(actual) =>
          Some(s"$table.$colName read as $actual, contract allows ${ok.mkString("|")}")
        case _ => None
      }
    }
  }

  /** Throw ONE actionable error if any table drifted. */
  def check(table: String, schema: StructType): Unit = {
    val v = violations(table, schema)
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"testdata schema drift: ${v.mkString("; ")} — a testdata " +
          "regeneration changed dtypes; extend Tables.normalizeTs (or a " +
          "sibling normalizer) for the new encoding, or update " +
          "SchemaContract/FIXTURES.md §A if the contract itself moved")
  }
}
