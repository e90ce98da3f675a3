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

  test("property: checksum is permutation/partition invariant and value sensitive") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.functions.{col, when}
    import spark.implicits._
    val rowGen = for {
      id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      s <- Gen.oneOf("", "x", "a b", "∅", "tab\there", "nul")
      v <- Gen.oneOf(Gen.const(Double.NaN), Gen.const(-0.0),
        Gen.chooseNum(-1e6, 1e6))
      arr <- Gen.listOfN(3, Gen.chooseNum(-5, 5))
    } yield (id, s, v, arr)
    val rows = (0 until 40).flatMap(i =>
      rowGen.apply(Gen.Parameters.default, Seed(7L + i)))
    val df = rows.toDF("id", "s", "v", "arr")
    val base = Goldens.checksum(df)
    // permutation + partitioning invariance
    assert(Goldens.checksum(df.repartition(7)) == base)
    assert(Goldens.checksum(
      spark.createDataFrame(spark.sparkContext.parallelize(
        scala.util.Random.javaRandomToRandom(new java.util.Random(3))
          .shuffle(df.collect().toSeq), 3), df.schema)) == base)
    // -0.0 folds into 0.0 (the one value-level normalization)
    val negZero = Seq((1L, "a", -0.0, List(1))).toDF("id", "s", "v", "arr")
    val posZero = Seq((1L, "a", 0.0, List(1))).toDF("id", "s", "v", "arr")
    assert(Goldens.checksum(negZero) == Goldens.checksum(posZero))
    // any single-value mutation moves the hash
    val mutated = df.withColumn("id",
      when(col("id") === rows.head._1, col("id") + 1).otherwise(col("id")))
    assert(Goldens.checksum(mutated) != base)
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
