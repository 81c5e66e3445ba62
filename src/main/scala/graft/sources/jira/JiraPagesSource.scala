package graft.sources.jira

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.JiraEtl

/** DataSource V2 provider for the reference's paginated API responses —
  * S1–S3 of SURVEY.md §2a as a first-class Spark source instead of a
  * driver-side loop: every page file becomes one `InputPartition`, so "the
  * pagination loop" is just a parallel scan (the reference walks pages
  * sequentially, `dags/jira/issues/issue_processor.py:114-167`; here 1000
  * executors read 1000 pages at once). Column pruning is pushed into the
  * reader: the JSON→InternalRow converter is driven by the pruned schema,
  * so unrequested (even nested) fields are never materialized — the DSv2
  * form of the reference's P1 mapping-projection.
  *
  * Usage:
  *   spark.read.format("graft-jira-pages")
  *     .option("entity", "issues" | "users" | "worklogs")
  *     .load(paths: _*)
  *
  * Rows are the raw (nested) API objects; compose with `graft.etl.Flatten`
  * for the relational shape. A live-HTTP variant would implement the same
  * Table with a page-cursor `InputPartition` enumeration; offline files
  * keep the engine hermetic (SURVEY §4 "defer; document as an extension").
  */
class JiraPagesSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-jira-pages"

  private def entity(options: CaseInsensitiveStringMap): String = {
    val e = Option(options.get("entity")).getOrElse("issues")
    require(Seq("issues", "users", "worklogs").contains(e),
      s"unknown entity '$e' (expected issues|users|worklogs)")
    e
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    entity(options) match {
      case "issues" => JiraEtl.issueSchema
      case "users" => JiraEtl.userSchema
      case "worklogs" => JiraEtl.worklogSchema
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JiraPagesTable(schema,
      entity(new CaseInsensitiveStringMap(properties)),
      paths(new CaseInsensitiveStringMap(properties)))

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    // DataFrameReader.load(paths*) passes either "path" or a JSON "paths"
    val multi = Option(options.get("paths")).map { js =>
      new ObjectMapper().readTree(js).elements().asScala
        .map(_.asText()).toSeq
    }
    multi.orElse(Option(options.get("path")).map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException("no path(s) given"))
  }
}

private class JiraPagesTable(schema: StructType, entity: String,
    paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-jira-pages($entity)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JiraPagesScanBuilder(schema, entity, paths)
}

private class JiraPagesScanBuilder(fullSchema: StructType, entity: String,
    paths: Seq[String]) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new JiraPagesScan(required, entity, paths)
}

private class JiraPagesScan(schema: StructType, entity: String,
    paths: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => JiraPagePartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new JiraPageReaderFactory(schema, entity)
}

private case class JiraPagePartition(path: String) extends InputPartition

private class JiraPageReaderFactory(schema: StructType, entity: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JiraPageReader(schema, entity,
      partition.asInstanceOf[JiraPagePartition].path)
}

/** Reads one page file: resolves the entity's record array from the page
  * envelope and converts each record against the (possibly pruned) schema.
  */
private class JiraPageReader(schema: StructType, entity: String, path: String)
    extends PartitionReader[InternalRow] {

  private val records: Iterator[JsonNode] = {
    val uri = new java.net.URI(path)
    val stream =
      if (uri.getScheme == null || uri.getScheme == "file")
        new java.io.FileInputStream(
          if (uri.getScheme == null) path else uri.getPath)
      else uri.toURL.openStream()
    val root = try new ObjectMapper().readTree(stream) finally stream.close()
    entity match {
      case "issues" => Option(root.get("issues")).iterator.flatMap(_.elements().asScala)
      case "worklogs" => Option(root.get("results")).iterator.flatMap(_.elements().asScala)
      case "users" => root.elements().asScala // bare array response
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (records.hasNext) { current = JsonToRow.convert(records.next(), schema); true }
    else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Schema-driven JsonNode → InternalRow conversion. Absent keys and JSON
  * nulls become SQL NULL (the reference's column-omission semantics,
  * `jira_base_processor.py:86-104`); only fields present in the pruned
  * schema are touched.
  */
private object JsonToRow {
  def convert(node: JsonNode, schema: StructType): InternalRow =
    InternalRow.fromSeq(schema.fields.toSeq.map(f =>
      value(Option(node.get(f.name)).orNull, f.dataType)))

  private def value(n: JsonNode, t: DataType): Any =
    if (n == null || n.isNull) null
    else t match {
      case StringType => UTF8String.fromString(if (n.isTextual) n.asText() else n.toString)
      case LongType => n.asLong()
      case IntegerType => n.asInt()
      case DoubleType => n.asDouble()
      case BooleanType => n.asBoolean()
      case st: StructType => convert(n, st)
      case ArrayType(et, _) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          n.elements().asScala.map(e => value(e, et)).toArray)
      case other =>
        throw new IllegalArgumentException(s"unsupported type $other")
    }
}
