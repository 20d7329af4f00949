package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class AgreementSpec extends SparkSpec {

  test("cohenKappa matches the textbook 2x2 worked example") {
    import spark.implicits._
    // classic: 45 yes/yes, 15 yes/no, 25 no/yes, 15 no/no (n=100)
    // po = 0.60; pe = 0.60*0.70 + 0.40*0.30 = 0.54; kappa = 0.06/0.46
    val rows =
      Seq.fill(45)((1, 1)) ++ Seq.fill(15)((1, 0)) ++
        Seq.fill(25)((0, 1)) ++ Seq.fill(15)((0, 0))
    val got = Agreement.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(got.getLong(0) === 100L)
    assert(got.getDouble(1) === 0.6)
    assert(got.getDouble(2) === 0.54)
    assert(got.getDouble(3) === BigDecimal(0.06 / 0.46)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("cohenKappa: perfect agreement is 1, constant raters give NULL") {
    import spark.implicits._
    val perfect = Seq((1, 1), (2, 2), (3, 3), (1, 1))
    assert(Agreement.cohenKappa(perfect.toDF("a", "b"), col("a"), col("b"))
      .head().getDouble(3) === 1.0)
    // both raters constant -> pe = 1 -> kappa undefined (explicit NULL)
    val const = Seq((1, 1), (1, 1), (1, 1))
    assert(Agreement.cohenKappa(const.toDF("a", "b"), col("a"), col("b"))
      .head().isNullAt(3))
  }

  test("fleissKappa matches the Wikipedia 2-category worked fixture") {
    import spark.implicits._
    // 5 items x 3 raters; category counts per item:
    //   (3,0) (2,1) (1,2) (0,3) (2,1)
    // S2 = 9 + 5 + 5 + 9 + 5 = 33; Pbar = (33 - 15) / (5*3*2) = 0.6
    // totals: cat0 = 8, cat1 = 7 -> Pe = (64 + 49) / 225
    val ratings =
      Seq((1, 0), (1, 0), (1, 0), (2, 0), (2, 0), (2, 1), (3, 0), (3, 1),
        (3, 1), (4, 1), (4, 1), (4, 1), (5, 0), (5, 0), (5, 1))
    val got = Agreement.fleissKappa(
      ratings.toDF("item", "cat"), col("item"), col("cat")).head()
    assert(got.getLong(0) === 5L)
    assert(got.getLong(1) === 3L)
    assert(got.getDouble(2) === 0.6)
    val pe = (64.0 + 49.0) / 225.0
    assert(math.abs(got.getDouble(3) - BigDecimal(pe)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(got.getDouble(4) - (0.6 - pe) / (1 - pe)) < 1e-6)
  }

  test("fleissKappa rejects a ragged panel") {
    import spark.implicits._
    val ragged = Seq((1, 0), (1, 1), (2, 0)) // item 1 has 2 raters, item 2 has 1
    val e = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(ragged.toDF("item", "cat"), col("item"), col("cat"))
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("krippendorffAlpha: hand-computed nominal fixture with a ragged panel") {
    import spark.implicits._
    // unit A: ratings (0, 0)        m=2, agree
    // unit B: ratings (0, 1)        m=2, disagree
    // unit C: ratings (1, 1, 1)     m=3, agree
    // unit D: rating  (0)           m=1, NOT pairable
    val ratings = Seq(("A", 0), ("A", 0), ("B", 0), ("B", 1),
      ("C", 1), ("C", 1), ("C", 1), ("D", 0))
    val got = Agreement.krippendorffAlpha(
      ratings.toDF("unit", "cat"), col("unit"), col("cat")).head()
    // pairable n = 7; Do = (1/7)[ (4-4)/1 + (4-2)/1 + (9-9)/2 ] = 2/7
    // nc: cat0 = 3, cat1 = 4; De = (3*4 + 4*3) / (7*6) = 24/42
    // alpha = 1 - (2/7)/(24/42) = 1 - 0.5 = 0.5
    assert(got.getLong(0) === 3L)
    assert(got.getLong(1) === 7L)
    assert(math.abs(got.getDouble(2) - 2.0 / 7) < 1e-6)
    assert(math.abs(got.getDouble(3) - 24.0 / 42) < 1e-6)
    assert(got.getDouble(4) === 0.5)
  }

  test("krippendorffAlpha: single observed category yields NULL alpha") {
    import spark.implicits._
    val ratings = Seq(("A", 1), ("A", 1), ("B", 1), ("B", 1))
    val got = Agreement.krippendorffAlpha(
      ratings.toDF("unit", "cat"), col("unit"), col("cat")).head()
    assert(got.isNullAt(4))
    assert(got.getDouble(2) === 0.0)
  }
}
