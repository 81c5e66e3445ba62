package graft

import org.apache.spark.sql.functions._

import graft.etl.Flatten
import graft.etl.Flatten.{Leaf, Obj}

/** P1–P3 flatten semantics (reference
  * `dags/jira/jira_base_processor.py:65-106`): raw-key prefix chain +
  * mapped leaf, unmapped-key projection, '//' array join, null propagation
  * through absent parents.
  */
class FlattenSpec extends SparkSpec {
  import spark.implicits._

  test("output name = raw parent path + mapped leaf (reference :95,:103-104)") {
    val df = Seq(("x", "y")).toDF("a", "b")
      .select(struct(struct(col("a").as("self")).as("statusCategory")).as("status"), col("b"))
    val out = Flatten(df, Obj(
      "status" -> Obj("statusCategory" -> Obj("self" -> Leaf("url"))),
      "b" -> Leaf("bee")))
    assert(out.columns.toSeq === Seq("status_statusCategory_url", "bee"))
    assert(out.head.getString(0) === "x")
  }

  test("unmapped keys are dropped (P1, reference :88-91)") {
    val df = Seq((1, 2, 3)).toDF("keep", "drop1", "drop2")
    val out = Flatten(df, Obj("keep" -> Leaf("kept")))
    assert(out.columns.toSeq === Seq("kept"))
  }

  test("arrays stringify and join with '//' (P3, reference :98-100); [] → ''") {
    val df = Seq(
      (1, Seq("backend", "urgent")),
      (2, Seq.empty[String])).toDF("id", "labels")
    val out = Flatten(df, Obj("id" -> Leaf("id"), "labels" -> Leaf("labels")))
      .orderBy("id").as[(Int, String)].collect()
    assert(out(0)._2 === "backend//urgent")
    assert(out(1)._2 === "")
  }

  test("non-string arrays are stringified elementwise before the join") {
    val df = Seq((1, Seq(10, 20))).toDF("id", "nums")
    val out = Flatten(df, Obj("nums" -> Leaf("nums")))
    assert(out.head.getString(0) === "10//20")
  }

  test("null parent propagates NULL to every derived leaf (reference :86-104 key absence)") {
    val schema = "id INT, resolution STRUCT<name: STRING, description: STRING>"
    val df = spark.read.schema(schema).json(
      Seq("""{"id":1,"resolution":{"name":"Done","description":"d"}}""",
        """{"id":2,"resolution":null}""").toDS())
    val out = Flatten(df, Obj(
      "id" -> Leaf("id"),
      "resolution" -> Obj("name" -> Leaf("name"), "description" -> Leaf("desc"))))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "Done")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
