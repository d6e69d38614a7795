package graft.table

import graft.model.DdlChange
import org.apache.spark.sql.types._

/** DDL-driven schema evolution — the Spark analog of the reference's
  * refresh-catalog-on-ALTER behavior (reference:
  * server/relay/BinlogProducer.java:205-227, server/dbInfo/DbInstanceInfo.java:80-94).
  *
  * The reference re-reads information_schema when it sees `ALTER TABLE`; we
  * fold in-band DDL events into the snapshot's schema *before* the merge
  * plan is built, so later row events parse against the new shape
  * (SURVEY.md §4.4.7). Application is idempotent — a replayed DDL (at-least-
  * once feed) is a no-op.
  */
object SchemaEvolution {

  /** Widenings we accept (MySQL-ish, all loss-free in Catalyst `Cast`). */
  private val widenOk: Set[(String, String)] = Set(
    ("integer", "long"), ("integer", "double"), ("long", "double"),
    ("float", "double"), ("integer", "decimal(38,0)"),
    ("integer", "string"), ("long", "string"))

  def parseType(name: String): DataType = name.toLowerCase match {
    case "int" | "integer" => IntegerType
    case "bigint" | "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" | "text" | "varchar" => StringType
    case "boolean" | "bool" => BooleanType
    case "date" => DateType
    case "timestamp" => TimestampType
    case other => throw new IllegalArgumentException(s"unsupported DDL type '$other'")
  }

  /** Apply one DDL; idempotent. Engine columns (`_offset`, `_deleted`) stay
    * at the tail of the schema. */
  def apply(schema: StructType, ddl: DdlChange): StructType = ddl.kind match {
    case "add_column" =>
      if (schema.fieldNames.contains(ddl.col)) schema // replayed DDL: no-op
      else {
        val (data, engine) = schema.fields.partition(!_.name.startsWith("_"))
        StructType((data :+ StructField(ddl.col, parseType(ddl.toType))) ++ engine)
      }
    case "widen_type" =>
      val to = parseType(ddl.toType)
      val idx = schema.fieldIndex(ddl.col)
      val cur = schema.fields(idx).dataType
      if (cur == to) schema // replayed DDL: no-op
      else {
        require(widenOk((cur.typeName, to.typeName)),
          s"illegal widen ${cur.typeName} -> ${to.typeName} on ${ddl.col}")
        StructType(schema.fields.updated(idx,
          StructField(ddl.col, to, schema.fields(idx).nullable)))
      }
    case other =>
      throw new IllegalArgumentException(s"unknown DDL kind '$other'")
  }

  def fold(schema: StructType, ddls: Seq[DdlChange]): StructType =
    ddls.foldLeft(schema)(apply)

  /** Data columns of a target schema = everything not engine-internal. */
  def dataColumns(schema: StructType): Seq[StructField] =
    schema.fields.filter(!_.name.startsWith("_")).toSeq

  /** Evolved columns = data columns beyond the base 5-column payload. */
  def evolvedColumns(schema: StructType): Seq[StructField] = {
    val base = graft.model.Schemas.repoFile.fieldNames.toSet
    dataColumns(schema).filter(f => !base.contains(f.name))
  }
}
