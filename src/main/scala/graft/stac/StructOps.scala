package graft.stac

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Small struct-rebuild helpers (Spark has `withField` on Column since 3.1,
  * but rebuilding by name keeps explicit control of field order, which the
  * STAC round-trip relies on). */
object StructOps {

  /** Rebuild `structCol` (with fields per `structType`), applying `fn` to
    * field `name`. Null structs stay null. */
  def withFieldTransformed(structCol: Column, structType: StructType,
                           name: String, fn: Column => Column): Column = {
    val rebuilt = struct(structType.fields.map { f =>
      val c = structCol.getField(f.name)
      (if (f.name == name) fn(c) else c).as(f.name)
    }.toIndexedSeq: _*)
    when(structCol.isNull, lit(null)).otherwise(rebuilt)
  }

  /** Rebuild dropping a set of fields. */
  def withoutFields(structCol: Column, structType: StructType,
                    drop: Set[String]): Column = {
    val keep = structType.fields.filterNot(f => drop.contains(f.name))
    val rebuilt = struct(keep.map(f => structCol.getField(f.name).as(f.name)).toIndexedSeq: _*)
    when(structCol.isNull, lit(null)).otherwise(rebuilt)
  }
}
