package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Typed extraction from semi-structured (JSON string) columns.
  *
  * Event streams routinely carry a free-form JSON properties column next to
  * the typed ones (cf. the reference's audit-table payloads being opaque to
  * the storage layer, waimak-storage AuditTable.scala:31-47 — the engine
  * stores what it's given and the schema is the caller's business). At
  * query time those payloads need promoting back to typed columns.
  *
  * Scale shape: ONE `from_json` parse per row materialises every requested
  * field, however many there are — chained `get_json_object` calls re-parse
  * the document once per field per row, an O(fields) blow-up on a 100 TB
  * scan. The parse is a codegen'd Catalyst expression (JsonToStructs), stays
  * inside whole-stage codegen, and malformed documents degrade to null
  * fields (PERMISSIVE) instead of failing the scan.
  */
object Semistructured {

  /** Add typed columns parsed from `jsonCol` in a single pass.
    *
    * @param fields the fields to surface; each StructField's name doubles as
    *               the JSON key and the output column name. Missing keys and
    *               unparseable documents yield null.
    */
  def extractJson(df: DataFrame, jsonCol: String, fields: Seq[StructField]): DataFrame = {
    require(fields.nonEmpty, "at least one field to extract")
    val parsed = from_json(col(jsonCol), StructType(fields))
    // single parse: bind the struct once, then project its fields
    val withStruct = df.withColumn("_graft_json", parsed)
    val projected = fields.foldLeft(withStruct) { (d, f) =>
      d.withColumn(f.name, col("_graft_json").getField(f.name))
    }
    projected.drop("_graft_json")
  }

  /** Convenience: extract one field as a Column expression (still a full
    * parse — prefer [[extractJson]] when extracting several fields). */
  def jsonField(jsonCol: Column, field: StructField): Column =
    from_json(jsonCol, StructType(Seq(field))).getField(field.name)
}
