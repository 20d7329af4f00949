package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the portable hashes to constants INDEPENDENTLY verified in DuckDB
  * 1.0 (`CAST(('0x' || substr(md5('abc'), 1, 15)) AS BIGINT)` etc.) — the
  * whole point of these hashes is cross-engine agreement, so the spec
  * asserts the exact values a second engine produces, not just
  * self-consistency.
  */
class PortableHashSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Long = {
    import spark.implicits._
    Seq("abc").toDF("s").select(c).head().getLong(0)
  }

  test("portable60 matches DuckDB's parse of md5's top 15 hex digits") {
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72; 0x900150983cd24fb
    assert(one(PortableHash.portable60(col("s"))) === 648541476951500027L)
  }

  test("portable64 assembles the top 16 hex digits incl. the sign bit") {
    // 0x900150983cd24fb0 as two's complement
    assert(one(PortableHash.portable64(col("s"))) === 0x900150983cd24fb0L)
  }

  test("portable60 is non-negative and in the 60-bit range") {
    import spark.implicits._
    val vals = (1 to 200).map(_.toString).toDF("s")
      .select(PortableHash.portable60(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(vals.forall(h => h >= 0L && h < (1L << 60)))
    assert(vals.distinct.length === 200)
  }
}
