package graft

import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** U1–U3 keyed-upsert semantics (reference `dags/jira/db_ops.py:29-43`,
  * MERGE spec `:83-100`): last-writer-wins, insert-if-absent, column
  * omission → NULL, idempotence, and equivalence of the window and
  * anti-join formulations.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
    .toDF("k", "name", "v")

  test("update replaces, insert appends, untouched rows survive") {
    val updates = Seq((2, "B2", 200), (4, "d", 40)).toDF("k", "name", "v")
    val out = Upsert(base, updates, Seq("k")).orderBy("k")
      .as[(Int, String, Int)].collect().toSeq
    assert(out === Seq((1, "a", 10), (2, "B2", 200), (3, "c", 30), (4, "d", 40)))
  }

  test("column missing from updates surfaces as NULL (reference column-omission semantics)") {
    val updates = Seq((2, "B2")).toDF("k", "name") // no "v" column
    val out = Upsert(base, updates, Seq("k")).orderBy("k").collect()
    assert(out(1).getString(1) === "B2")
    assert(out(1).isNullAt(2), "omitted column must become NULL, not keep the old value")
  }

  test("upsert is idempotent: upsert(upsert(T,B),B) == upsert(T,B)") {
    val updates = Seq((1, "A", 100), (5, "e", 50)).toDF("k", "name", "v")
    val once = Upsert(base, updates, Seq("k"))
    val twice = Upsert(once, updates, Seq("k"))
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("window and anti-join formulations agree on unique-key updates") {
    val updates = Seq((2, "B2", 200), (4, "d", 40)).toDF("k", "name", "v")
    val a = Upsert(base, updates, Seq("k")).orderBy("k").collect().toSeq
    val b = Upsert.applyAnti(base, updates, Seq("k")).orderBy("k").collect().toSeq
    assert(a === b)
  }

  test("result keys are unique even when base had duplicate keys") {
    val dirty = base.union(Seq((2, "dup", 99)).toDF("k", "name", "v"))
    val updates = Seq((2, "B2", 200)).toDF("k", "name", "v")
    val out = Upsert(dirty, updates, Seq("k"))
    assert(out.groupBy("k").count().filter(col("count") > 1).count() === 0)
  }
}
