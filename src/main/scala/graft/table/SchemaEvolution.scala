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

  /** Widenings we accept (MySQL-ish, all loss-free in Catalyst `Cast`).
    * Decimal widening is precision/scale-aware below. */
  private val widenOk: Set[(String, String)] = Set(
    ("integer", "long"), ("integer", "double"), ("long", "double"),
    ("float", "double"), ("integer", "decimal(38,0)"),
    ("integer", "string"), ("long", "string"), ("date", "timestamp"))

  private def widenAllowed(from: DataType, to: DataType): Boolean = (from, to) match {
    // decimal(p,s) → decimal(p',s') is loss-free iff the integral and
    // fractional digit budgets both grow (MySQL DECIMAL widen semantics)
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    case (IntegerType | LongType, t: DecimalType) => t.precision - t.scale >= 19
    case _ => widenOk((from.typeName.takeWhile(_ != '('), to.typeName.takeWhile(_ != '(')))
  }

  private val DecimalRe = """decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** The reference coerces 15 MySQL column types into its row images
    * (server/dbInfo/TableColumnList.java:44-103,
    * base/dbInfo/TableInfo.java:88-100); this is the Spark-type image of
    * that map — every type a DDL can introduce into the lake schema. */
  def parseType(name: String): DataType = name.toLowerCase match {
    case "tinyint" | "smallint" | "int" | "integer" | "mediumint" => IntegerType
    case "bigint" | "long" => LongType
    case "float" => FloatType
    case "double" | "real" => DoubleType
    case "string" | "text" | "varchar" | "char" | "json" => StringType
    case "binary" | "varbinary" | "blob" => BinaryType
    case "boolean" | "bool" => BooleanType
    case "date" => DateType
    case "timestamp" | "datetime" => TimestampType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case "decimal" | "numeric" => DecimalType(38, 18)
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
      if (!schema.fieldNames.contains(ddl.col))
        // the column's add_column happened before this stream's resume
        // point (e.g. a FROM_POS/GTID resume past it). The reference
        // re-reads information_schema on ALTER, i.e. after the statement
        // the column simply EXISTS at the widened type — so a widen on a
        // missing column materializes it (values arrive via extras).
        apply(schema, DdlChange("add_column", ddl.col, "", ddl.toType))
      else {
        val idx = schema.fieldIndex(ddl.col)
        val cur = schema.fields(idx).dataType
        if (cur == to) schema // replayed DDL: no-op
        else {
          require(widenAllowed(cur, to),
            s"illegal widen ${cur.sql} -> ${to.sql} on ${ddl.col}")
          StructType(schema.fields.updated(idx,
            StructField(ddl.col, to, schema.fields(idx).nullable)))
        }
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

  // -- P3: column-name conversion (reference utils/StrNameConvert.java:24-36
  // converts snake_case DB columns to camelCase bean fields; these two are
  // exact inverses for standard snake names, so the merge projection can
  // recover the source extras key from the lake column name).

  def snakeToCamel(name: String): String = {
    val parts = name.split('_')
    (parts.head +: parts.tail.map(p =>
      if (p.isEmpty) p else p.head.toUpper +: p.tail)).mkString
  }

  def camelToSnake(name: String): String =
    name.flatMap(c => if (c.isUpper) s"_${c.toLower}" else c.toString)
}
