package graft.taxi

import java.nio.file.Files

import graft.SparkSpec

/** Smoke test for the SURVEY.md §7 runner: the full read → clean →
  * feature → partitioned-write → analytics wiring on the fixture.
  */
class RunPipelineSpec extends SparkSpec {

  test("runner produces the partitioned sink and shipped-mode row count") {
    spark // force the shared session so the runner won't stop it
    val out = Files.createTempDirectory("taxi-run").toString
    RunPipeline.main(Array(s"--out=$out"))
    val table = spark.read.parquet(s"$out/taxi")
    // shipped-mode fixture golden (TaxiPipelineSpec asserts the content)
    assert(table.count() === 11)
    // hive layout by date parts, partition columns recovered on read
    assert(new java.io.File(s"$out/taxi/pickup_year=2024").exists())
    assert(table.columns.contains("pickup_year"))
    // the session the spec shares must survive the runner
    assert(!spark.sparkContext.isStopped)
  }

  test("strict mode applies the dead branch (one fewer fixture row)") {
    spark
    val out = Files.createTempDirectory("taxi-run-strict").toString
    RunPipeline.main(Array(s"--out=$out", "--strict"))
    assert(spark.read.parquet(s"$out/taxi").count() === 10)
  }
}
