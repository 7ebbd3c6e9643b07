package graft.mining

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AssociationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rules: hand-derived support/confidence/lift, both directions") {
    // baskets: {a,b,c}, {a,b}, {a,c}, {b} → 4 baskets
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
      (3, "a"), (3, "c"), (4, "b")).toDF("g", "i")
    val out = Associations.rules(df, "g", "i", minPairSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap
    // pairs with support >= 2: (a,b)=2, (a,c)=2; (b,c)=1 drops
    assert(out.keySet == Set("a" -> "b", "b" -> "a", "a" -> "c", "c" -> "a"))
    val (np, na, nc, nb, sup, conf, lift) = out("a" -> "b")
    assert((np, na, nc, nb) == ((2L, 3L, 3L, 4L)))
    assert(sup == 0.5 && conf == 2.0 / 3.0)
    assert(lift == (2.0 / 3.0) / (3.0 / 4.0))
    // b -> a: confidence = 2/3 (b in 3 baskets), lift symmetric
    assert(out("b" -> "a")._7 == out("a" -> "b")._7)
  }

  test("rules: duplicate (basket, item) rows count once; cap drops mega-baskets") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"),
      // basket 9 exceeds maxPerGroup=2 and must vanish entirely
      (9, "a"), (9, "b"), (9, "c")).toDF("g", "i")
    val out = Associations.rules(df, "g", "i", minPairSupport = 2L,
      maxPerGroup = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(5))
      .toMap
    assert(out.keySet == Set("a" -> "b", "b" -> "a"))
    assert(out("a" -> "b") == 2L) // n_baskets excludes the dropped basket
  }
}
