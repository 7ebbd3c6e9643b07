package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.scd.SCD

class CdcScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CDC classifies INSERT/UPDATE/DELETE and drops unchanged rows") {
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amt")
    val cur = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "amt")
    val out = CDC.changes(cur, prev, Seq("id"), Seq("name", "amt"),
      changeTimestamp = None)
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getDouble(2), r.getString(3))).toMap
    assert(byId.keySet == Set(2L, 3L, 4L)) // 1 unchanged → dropped
    assert(byId(2L) == (("b", 99.0, "UPDATE")))
    assert(byId(3L) == (("c", 30.0, "DELETE"))) // carries PREVIOUS values
    assert(byId(4L) == (("d", 40.0, "INSERT")))
  }

  test("CDC skips rows with null key fields on both sides") {
    val prev = Seq((Some(1L), "a"), (None, "ghost")).toDF("id", "name")
    val cur = Seq((Some(1L), "a"), (None, "phantom")).toDF("id", "name")
    val out = CDC.changes(cur, prev, Seq("id"), Seq("name"), changeTimestamp = None)
    assert(out.count() == 0) // null-key rows never surface as I/U/D
  }

  test("CDC null-safe compare: null → value is an UPDATE") {
    val prev = Seq((1L, Option.empty[String])).toDF("id", "name")
    val cur = Seq((1L, Option("now-set"))).toDF("id", "name")
    val out = CDC.changes(cur, prev, Seq("id"), Seq("name"), changeTimestamp = None)
    assert(out.collect().map(_.getString(2)).toSeq == Seq("UPDATE"))
  }

  test("CDC changeTypes filter restricts emitted kinds (enforced, unlike the reference)") {
    val prev = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val cur = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val onlyUpserts = CDC.changes(cur, prev, Seq("id"), Seq("v"),
      changeTimestamp = None, changeTypes = Seq("INSERT", "UPDATE"))
      .collect().map(_.getString(2)).toSet
    assert(onlyUpserts == Set("INSERT", "UPDATE"))
    intercept[IllegalArgumentException] {
      CDC.changes(cur, prev, Seq("id"), Seq("v"), None, Seq("UPSERT"))
    }
  }

  test("SCD2: changed key closes old row + emits new; unchanged passes through; new key inserts") {
    val source = Seq((1L, "alice", "GOLD"), (2L, "bob", "SILVER"), (9L, "nina", "BRONZE"))
      .toDF("id", "name", "tier")
    val dim = Seq(
      (1L, "alice", "SILVER", "2020-01-01", "9999-12-31", true), // will change
      (2L, "bob", "SILVER", "2020-01-01", "9999-12-31", true),   // unchanged
      (1L, "alice", "OLD", "2015-01-01", "2019-12-31", false),   // historical: ignored
      (7L, "zoe", "GOLD", "2020-01-01", "9999-12-31", true))     // untouched: not emitted
      .toDF("id", "name", "tier", "effective_from", "effective_to", "is_current")
    val out = SCD.scd2(source, dim, Seq("id"), Seq("tier"), today = "2024-06-01")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3),
        r.getString(4), r.getBoolean(5))).toSet
    assert(out == Set(
      (1L, "SILVER", "2020-01-01", "2024-06-01", false), // closed old
      (1L, "GOLD", "2024-06-01", "9999-12-31", true),    // new current
      (2L, "SILVER", "2020-01-01", "9999-12-31", true),  // unchanged
      (9L, "BRONZE", "2024-06-01", "9999-12-31", true))) // brand new
  }

  test("SCD3: previous_ columns + version bump; new keys version 1") {
    val source = Seq((1L, "GOLD"), (5L, "IRON")).toDF("id", "tier")
    val dim = Seq((1L, "SILVER", 3)).toDF("id", "tier", "version")
    val out = SCD.scd3(source, dim, Seq("id"), Seq("tier"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), r.getInt(3))).toSet
    assert(out == Set(
      (1L, "GOLD", Some("SILVER"), 4),
      (5L, "IRON", None, 1)))
  }

  test("SCD1 is source verbatim") {
    val src = Seq((1L, "x")).toDF("id", "v")
    assert(SCD.scd1(src).collect().toSeq == src.collect().toSeq)
  }
  test("applyChanges: apply o changes is the identity; deletes drop, " +
    "upserts replace, untouched rows survive") {
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val curr = Seq((1L, "a", 11.0),          // update
      (3L, "c", 30.0),                       // unchanged
      (4L, "d", 40.0))                       // insert; 2 deleted
      .toDF("k", "name", "bal")
    val feed = CDC.changes(curr, prev, Seq("k"), Seq("name", "bal"),
      changeTimestamp = None)
    val applied = CDC.applyChanges(prev, feed, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(applied == Set((1L, "a", 11.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
    // empty feed: snapshot unchanged
    assert(CDC.applyChanges(prev, feed.limit(0), Seq("k")).count() == 3)
  }
}
