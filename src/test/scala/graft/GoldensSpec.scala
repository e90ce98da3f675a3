package graft

import org.scalatest.funsuite.AnyFunSuite

/** The eng_* goldens machinery: checksum stability across
  * partitionings (the property that makes the committed goldens
  * meaningful), drift detection, and agreement between the committed
  * GOLDENS_eng.tsv and freshly executed entries. */
class GoldensSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("checksum is invariant to partitioning and row order") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"s$i", i * 0.25)).toDF("id", "s", "v")
    val base = Goldens.checksum(df)
    assert(Goldens.checksum(df.repartition(13)) == base)
    assert(Goldens.checksum(df.orderBy(org.apache.spark.sql.functions.col("v").desc)) == base)
    assert(base._1 == 500L)
  }

  test("checksum moves on value, schema-name, and row-count changes") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, i * 0.5)).toDF("id", "v")
    val base = Goldens.checksum(df)._2
    assert(Goldens.checksum(df.withColumn("v",
      org.apache.spark.sql.functions.col("v") + 1))._2 != base)
    assert(Goldens.checksum(df.withColumnRenamed("v", "w"))._2 != base)
    assert(Goldens.checksum(df.limit(49))._2 != base)
  }

  test("tsv round-trip and drift report") {
    val entries = Seq("eng_a" -> ((3L, "aa11")), "eng_b" -> ((5L, "bb22")))
    val parsed = Goldens.parseTsv(Goldens.toTsv("sf0.01", entries))
    assert(parsed == Map(("sf0.01", "eng_a") -> ((3L, "aa11")),
      ("sf0.01", "eng_b") -> ((5L, "bb22"))))
    val drift = Goldens.diff(parsed, "sf0.01",
      Seq("eng_a" -> ((3L, "aa11")), "eng_b" -> ((5L, "CHANGED")),
        "eng_c" -> ((1L, "cc33"))))
    assert(drift.exists(_.startsWith("DRIFT eng_b")))
    assert(drift.exists(_.startsWith("NEW eng_c")))
    assert(!drift.exists(_.contains("eng_a")))
    val missing = Goldens.diff(parsed, "sf0.01", Seq("eng_a" -> ((3L, "aa11"))))
    assert(missing.exists(_.startsWith("MISSING eng_b")))
  }

  test("committed goldens match freshly executed entries (sf0.001)") {
    val path = java.nio.file.Paths.get("GOLDENS_eng.tsv")
    assume(java.nio.file.Files.exists(path), "GOLDENS_eng.tsv not committed yet")
    val committed = Goldens.parseTsv(java.nio.file.Files.readString(path))
    // cheap representatives of distinct entry families (dedup, text,
    // sketch): full coverage is Verify's job each round
    for (name <- Seq("eng_exact_dedup", "eng_lang_id", "eng_heavy_hitters")) {
      val fresh = Goldens.checksum(
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      assert(committed.get(("sf0.001", name)).contains(fresh),
        s"$name drifted from committed golden: $fresh")
    }
  }
}
