package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev-only third arg: comma-separated query names to restrict the
    // dump (fast iteration on new queries); the driver passes 2 args.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def keep(name: String) = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // Goldens for the eng_* (no-oracle) entries: checksum the parquet
    // just written (no second execution), emit eng_goldens.tsv beside
    // the dumps, and diff against the committed GOLDENS_eng.tsv so any
    // eng-entry drift is loud in the driver log despite having no
    // DuckDB oracle.
    val sfName = Paths.get(sfDir).getFileName.toString
    val engEntries = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.startsWith("eng_") && keep(n))
      .flatMap { name =>
        try Some(name -> Goldens.checksum(spark.read.parquet(s"$outDir/$name")))
        catch { case e: Throwable =>
          System.err.println(s"[goldens] $name unreadable: ${e.getMessage}"); None
        }
      }
    if (engEntries.nonEmpty) {
      Files.writeString(Paths.get(s"$outDir/eng_goldens.tsv"),
        Goldens.toTsv(sfName, engEntries))
      val committedPath = Paths.get("GOLDENS_eng.tsv")
      if (Files.exists(committedPath)) {
        val committed = Goldens.parseTsv(Files.readString(committedPath))
        val drift0 = Goldens.diff(committed, sfName, engEntries)
        // a restricted dev run (third arg) legitimately produces a
        // subset — only DRIFT/NEW are meaningful there
        val drift =
          if (only.isDefined) drift0.filterNot(_.startsWith("MISSING")) else drift0
        if (drift.isEmpty)
          System.err.println(
            s"[goldens] ${engEntries.size} eng entries match GOLDENS_eng.tsv ($sfName)")
        else drift.foreach(d => System.err.println(s"[goldens] $d"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // machine-readable oracle split: every query name -> true (DuckDB
    // oracle-checked) | false (golden+spec only), so the driver reads
    // the population directly instead of inferring it from err strings
    val manifest = SparkEntry.queries.keys.toSeq.sorted.filter(keep)
      .map(n => s"${q(n)}: ${SparkEntry.oracleSql.contains(n)}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_manifest.json"), manifest)
    spark.stop()
  }
}
