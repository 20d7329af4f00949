package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OHLC bars (order picks, bucket edges) and TWAP (step-function hold,
  * degenerate spans) on hand-computable fixtures.
  */
class DownsampleSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("ohlcBars: open/close by (sec, id) order, bucket edges exact") {
    import spark.implicits._
    // bucket 0 ([0, 10)): values 5(t=0), 9(t=3), 1(t=7) -> o=5 h=9 l=1 c=1
    // bucket 1 ([10, 20)): single value 4 -> all 4
    // same-second tie at t=3 broken by id: id 2 before id 3
    val ev = Seq(
      ("a", ts(0), 1L, 5L), ("a", ts(3), 2L, 9L), ("a", ts(3), 3L, 2L),
      ("a", ts(7), 4L, 1L), ("a", ts(10), 5L, 4L))
      .toDF("k", "t", "id", "v")
    val got = Downsample.ohlcBars(ev, col("k"), col("t"), col("id"),
        col("v"), bucketSec = 10L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got(0L) === ((4L, 5L, 9L, 1L, 1L, 17L)))
    assert(got(1L) === ((1L, 4L, 4L, 4L, 4L, 4L)))
  }

  test("twap weights values by hold time; single-instant key is NULL") {
    import spark.implicits._
    // key a: v=10 held [0,100), v=30 held [100,200) -> twap = 20
    // key b: two events same second -> span 0 -> NULL
    val ev = Seq(
      ("a", ts(0), 1L, 10L), ("a", ts(100), 2L, 30L), ("a", ts(200), 3L, 99L),
      ("b", ts(5), 4L, 7L), ("b", ts(5), 5L, 9L))
      .toDF("k", "t", "id", "v")
    val got = Downsample.twap(ev, col("k"), col("t"), col("id"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got("a") === ((3L, 200L, 20.0)))
    val (nb, spanB, twapB) = got("b")
    assert(nb === 2L && spanB === 0L && twapB.isNaN)
  }
}
