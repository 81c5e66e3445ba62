package graft.etl

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Data-driven nested-JSON flatten — the Spark-native form of the
  * reference's `map_response_to_database_format`
  * (`dags/jira/jira_base_processor.py:65-106`), with its exact observed
  * semantics:
  *
  *  - P1 projection: any input field with no mapping entry is dropped
  *    (`jira_base_processor.py:88-91`);
  *  - P2 flatten+rename: output column = raw parent path joined with `_`,
  *    plus the *mapped* leaf name — the prefix chain keeps RAW keys, only
  *    the leaf is renamed (recursion passes the raw key at `:95`, leaf
  *    rename at `:103-104`), hence e.g. `fields_status_statusCategory_url`
  *    from `fields.status.statusCategory.self → url`;
  *  - P3 arrays: list values are stringified and `'//'`-joined
  *    (`jira_base_processor.py:98-100`);
  *  - null propagation: a JSON-null parent yields NULL leaf columns (the
  *    reference emits no key → SQL NULL by column omission,
  *    `jira_base_processor.py:86-104` + `db_ops.py:33-35`).
  *
  * The whole mapping compiles to ONE `select` of nested-field references —
  * Catalyst's nested-schema pruning then pushes the projection into the
  * JSON/parquet reader, so unmapped fields are never materialized. No
  * per-row code, no UDFs; scales as a pure map-side projection.
  */
object Flatten {

  sealed trait Node
  /** Leaf: rename this raw key to `name` in the output. */
  final case class Leaf(name: String) extends Node
  /** Interior object: recurse; insertion order = output column order. */
  final case class Obj(children: ListMap[String, Node]) extends Node
  object Obj {
    def apply(kvs: (String, Node)*): Obj = new Obj(ListMap(kvs: _*))
  }

  /** Compile a mapping into (outputName, column) pairs against `schema`.
    * Array-typed fields get the `'//'` join; everything else is referenced
    * as-is (absent struct branches in the schema are an error — the caller
    * reads with an explicit schema, so presence is static).
    */
  def columns(mapping: Obj, schema: StructType): Seq[Column] = {
    def fieldType(t: DataType, path: Seq[String]): Option[DataType] = path match {
      case Seq() => Some(t)
      case head +: rest => t match {
        case st: StructType =>
          st.fields.find(_.name == head).flatMap(f => fieldType(f.dataType, rest))
        case _ => None
      }
    }
    def walk(node: Obj, rawPrefix: Seq[String]): Seq[Column] =
      node.children.toSeq.flatMap {
        case (raw, o: Obj) => walk(o, rawPrefix :+ raw)
        case (raw, Leaf(name)) =>
          val path = rawPrefix :+ raw
          val ref = path.tail.foldLeft(col(path.head))((c, f) => c.getField(f))
          val out = (rawPrefix :+ name).mkString("_")
          val joined = fieldType(schema, path) match {
            case Some(ArrayType(_, _)) =>
              // P3: '//'-joined stringified elements; [] → '' like ''.join
              array_join(transform(ref, x => x.cast("string")), "//")
            case _ => ref
          }
          Seq(joined.as(out))
      }
    walk(mapping, Nil)
  }

  /** Apply the mapping: one wide select. */
  def apply(df: DataFrame, mapping: Obj): DataFrame =
    df.select(columns(mapping, df.schema): _*)
}
