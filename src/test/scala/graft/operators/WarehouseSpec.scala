package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("scd2Merge closes changed rows, opens new versions, ignores no-ops") {
    import spark.implicits._
    val snap = Seq((1L, "AUTO"), (2L, "HOUSE"), (3L, "SHIP")).toDF("k", "seg")
    val dim = Warehouse.scd2Init(snap, "2024-01-01")
    val updates = Seq(
      (1L, "RAIL"),  // changed
      (2L, "HOUSE"), // no-op resend
      (9L, "AIR")    // brand new
    ).toDF("k", "seg")
    val out = Warehouse.scd2Merge(dim, updates, "k", Seq("seg"), "2024-02-01")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, r.getDate(3).toString, r.getBoolean(4)))
      .sortBy(x => (x._1, x._3))
    assert(out.toSeq === Seq(
      (1L, "AUTO", "2024-01-01", "2024-02-01", false), // closed
      (1L, "RAIL", "2024-02-01", "9999-12-31", true),  // new version
      (2L, "HOUSE", "2024-01-01", "9999-12-31", true), // untouched no-op
      (3L, "SHIP", "2024-01-01", "9999-12-31", true),  // not in batch
      (9L, "AIR", "2024-02-01", "9999-12-31", true)))  // insert
    // idempotent: re-applying the same batch changes nothing
    val merged = Warehouse.scd2Merge(dim, updates, "k", Seq("seg"), "2024-02-01")
    val again = Warehouse.scd2Merge(merged, updates, "k", Seq("seg"), "2024-03-01")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, r.getDate(3).toString, r.getBoolean(4)))
      .sortBy(x => (x._1, x._3))
    assert(again.toSeq === out.toSeq)
  }

  test("scd2Merge passes history rows through untouched across two batches") {
    import spark.implicits._
    val dim = Warehouse.scd2Init(Seq((1L, "A")).toDF("k", "seg"), "2024-01-01")
    val v2 = Warehouse.scd2Merge(dim,
      Seq((1L, "B")).toDF("k", "seg"), "k", Seq("seg"), "2024-02-01")
    val v3 = Warehouse.scd2Merge(v2,
      Seq((1L, "C")).toDF("k", "seg"), "k", Seq("seg"), "2024-03-01")
    val rows = v3.orderBy("valid_from")
      .collect().map(r => (r.getString(1), r.getDate(2).toString,
        r.getDate(3).toString, r.getBoolean(4)))
    assert(rows.toSeq === Seq(
      ("A", "2024-01-01", "2024-02-01", false),
      ("B", "2024-02-01", "2024-03-01", false),
      ("C", "2024-03-01", "9999-12-31", true)))
  }
}
