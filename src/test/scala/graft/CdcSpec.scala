package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Cdc

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // base dimension: key, name, balance
  private def base = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0),
  ).toDF("k", "name", "bal")

  // changelog: key, ts, seq, op, new balance. Key 2 gets two changes
  // (latest wins), key 3 is deleted, key 9 is inserted, key 7 is a
  // delete for a key the base never had (must be a no-op), key 1 is
  // untouched.
  private def changes = Seq(
    (2L, 100L, 1L, "U", 21.0),
    (2L, 200L, 2L, "U", 22.0),
    (3L, 150L, 1L, "D", 0.0),
    (9L, 120L, 1L, "U", 99.0),
    (7L, 130L, 1L, "D", 0.0),
  ).toDF("ck", "ts", "seq", "op", "v")

  test("applyChangelog: update / insert / delete / passthrough / no-op delete") {
    val out = Cdc.applyChangelog(base, changes, key = "k", changeKey = "ck",
        ts = "ts", tieBreak = "seq", opCol = "op", deleteOp = "D",
        setCols = Seq("v" -> "bal"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 9L)) // 3 deleted, 7 no-op
    assert(out(0).getString(1) == "alice" && out(0).getDouble(2) == 10.0) // untouched
    assert(out(1).getString(1) == "bob" && out(1).getDouble(2) == 22.0) // LATEST change
    assert(out(2).isNullAt(1) && out(2).getDouble(2) == 99.0) // insert: unset cols null
  }

  test("applyChangelog: same-ts changes resolve by the tie-break") {
    val ch = Seq((1L, 100L, 1L, "U", 11.0), (1L, 100L, 2L, "U", 12.0))
      .toDF("ck", "ts", "seq", "op", "v")
    val out = Cdc.applyChangelog(base, ch, "k", "ck", "ts", "seq", "op", "D",
      Seq("v" -> "bal")).filter($"k" === 1L).collect()
    assert(out.head.getDouble(2) == 12.0)
  }

  test("scd2: version chain with exclusive upper bounds and one current row per key") {
    val hist = Cdc.scd2(changes.filter($"op" === "U"), key = "ck", ts = "ts",
        tieBreak = "seq", attrs = Seq("v"))
      .orderBy("ck", "version").collect()
    // key 2: two versions, first closed by the second's ts
    val k2 = hist.filter(_.getLong(0) == 2L)
    assert(k2.map(_.getInt(2)).toSeq == Seq(1, 2))
    assert(k2(0).getLong(3) == 100L && k2(0).getLong(4) == 200L && !k2(0).getBoolean(5))
    assert(k2(1).getLong(3) == 200L && k2(1).isNullAt(4) && k2(1).getBoolean(5))
    // every key has exactly one current row
    val currents = hist.filter(_.getBoolean(5)).map(_.getLong(0)).toSeq
    assert(currents.sorted == Seq(2L, 9L))
  }
}
