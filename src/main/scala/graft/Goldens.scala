package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Deterministic content checksums for the engine-side (`eng_*`)
  * entries — the driver-diffable goldens that close the `no_oracle`
  * blind spot: CORRECTNESS can only say "no oracle" for entries whose
  * semantics DuckDB can't express, so their round-over-round
  * verification otherwise lives solely in `sbt test`. Verify emits
  * `eng_goldens.tsv` per run and diffs it against the committed
  * `GOLDENS_eng.tsv`, so any drift in an eng entry's output is loud
  * in the driver log without a DuckDB oracle.
  *
  * The checksum is partition- and row-order-independent (columns
  * sorted by name, rendered rows sorted lexicographically before
  * hashing — asserted in GoldensSpec), so only a genuine value/schema
  * change can move it. */
object Goldens {

  /** Canonical rendering of one value — total, deterministic, and
    * type-stable across a parquet round-trip. */
  private def render(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double =>
      val x = d.doubleValue
      if (x == 0.0) "0.0" else x.toString // fold -0.0 into 0.0
    case f: java.lang.Float => render(java.lang.Double.valueOf(f.doubleValue))
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case s: scala.collection.Seq[_] => s.map(render).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => render(k) + "→" + render(mv) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: Row => (0 until r.length).map(i => render(r.get(i))).mkString("(", "|", ")")
    case t: java.sql.Timestamp => t.toInstant.toString
    case t: java.time.Instant => t.toString
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.toPlainString
    case bd: BigDecimal => bd.bigDecimal.stripTrailingZeros.toPlainString
    case x => x.toString
  }

  /** (rows, sha256-hex) of a result frame, independent of partitioning
    * and row order. The collect is bounded: eng entries are summary
    * frames (≤ ~16k rows by contract). */
  def checksum(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted.toSeq
    val header = cols.mkString("|") // schema drift (renames) moves the hash
    val rendered = df
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(render)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(header.getBytes("UTF-8"))
    rendered.sorted.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    (rendered.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  /** One TSV line per entry: sf, name, rows, sha256. */
  def toTsv(sf: String, entries: Seq[(String, (Long, String))]): String =
    entries.sortBy(_._1).map { case (name, (rows, sha)) =>
      s"$sf\t$name\t$rows\t$sha"
    }.mkString("", "\n", "\n")

  /** Parse a goldens TSV → (sf, name) → (rows, sha256). */
  def parseTsv(text: String): Map[(String, String), (Long, String)] =
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(sf, name, rows, sha) = line.split("\t", 4)
      (sf, name) -> (rows.toLong, sha)
    }.toMap

  /** Diff freshly computed entries against the committed goldens for
    * one SF; returns human-readable drift lines (empty = all match). */
  def diff(committed: Map[(String, String), (Long, String)], sf: String,
           fresh: Seq[(String, (Long, String))]): Seq[String] = {
    val relevant = committed.collect { case ((s, n), v) if s == sf => n -> v }
    val freshMap = fresh.toMap
    val drifted = fresh.collect {
      case (name, (rows, sha)) if relevant.get(name).exists(_ != ((rows, sha))) =>
        val (eRows, eSha) = relevant(name)
        s"DRIFT $name: rows $eRows->$rows sha ${eSha.take(12)}->${sha.take(12)}"
    }
    val newer = fresh.collect {
      case (name, _) if !relevant.contains(name) => s"NEW $name (no committed golden)"
    }
    val missing = relevant.keys.filterNot(freshMap.contains)
      .map(n => s"MISSING $n (committed but not produced)").toSeq
    drifted ++ newer ++ missing
  }
}
