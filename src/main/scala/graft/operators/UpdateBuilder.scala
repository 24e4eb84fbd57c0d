package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** W2: client-side partial-update construction — the Venice UpdateBuilder
  * surface (internal/venice-common/.../writer/update/UpdateBuilder.java:33-87):
  * set a field, add/remove list elements, put/remove map entries; conflicting
  * calls on the same field throw (UpdateBuilderImpl semantics).
  *
  * `buildRow` emits a Row in [[WriteCompute.deriveUpdateSchema]] field order,
  * ready to union into an update log DataFrame.
  */
class UpdateBuilder(valueSchema: StructType) {
  private val sets = mutable.LinkedHashMap.empty[String, Any]
  private val listAdds = mutable.Map.empty[String, Seq[Any]]
  private val listRemoves = mutable.Map.empty[String, Seq[Any]]
  private val mapPuts = mutable.Map.empty[String, Map[Any, Any]]
  private val mapRemoves = mutable.Map.empty[String, Seq[Any]]

  private def field(name: String): StructField =
    valueSchema.fields.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown field $name"))

  private def checkNoOps(name: String): Unit =
    require(!listAdds.contains(name) && !listRemoves.contains(name) &&
      !mapPuts.contains(name) && !mapRemoves.contains(name),
      s"cannot set field $name after collection ops on it")

  private def checkNotSet(name: String): Unit =
    require(!sets.contains(name),
      s"cannot apply collection ops to field $name after setting it")

  def setField(name: String, value: Any): this.type = {
    field(name); checkNoOps(name)
    sets(name) = value; this
  }

  def setElementsToAddToListField(name: String, elems: Seq[Any]): this.type = {
    require(field(name).dataType.isInstanceOf[ArrayType], s"$name is not a list")
    checkNotSet(name); listAdds(name) = elems; this
  }

  def setElementsToRemoveFromListField(name: String, elems: Seq[Any]): this.type = {
    require(field(name).dataType.isInstanceOf[ArrayType], s"$name is not a list")
    checkNotSet(name); listRemoves(name) = elems; this
  }

  def setEntriesToAddToMapField(name: String, entries: Map[Any, Any]): this.type = {
    require(field(name).dataType.isInstanceOf[MapType], s"$name is not a map")
    checkNotSet(name); mapPuts(name) = entries; this
  }

  def setKeysToRemoveFromMapField(name: String, keys: Seq[Any]): this.type = {
    require(field(name).dataType.isInstanceOf[MapType], s"$name is not a map")
    checkNotSet(name); mapRemoves(name) = keys; this
  }

  /** Row in deriveUpdateSchema(valueSchema) field order. */
  def buildRow(): Row = {
    val updSchema = WriteCompute.deriveUpdateSchema(valueSchema)
    val values = updSchema.fields.map { f =>
      f.name match {
        case WriteCompute.SetFieldsCol => sets.keys.toSeq
        case n if n.endsWith("__setUnion") =>
          listAdds.get(n.stripSuffix("__setUnion")).orNull
        case n if n.endsWith("__setDiff") =>
          listRemoves.get(n.stripSuffix("__setDiff")).orNull
        case n if n.endsWith("__mapUnion") =>
          mapPuts.get(n.stripSuffix("__mapUnion")).orNull
        case n if n.endsWith("__mapDiff") =>
          mapRemoves.get(n.stripSuffix("__mapDiff")).orNull
        case n => sets.get(n).orNull
      }
    }
    Row.fromSeq(values.toIndexedSeq)
  }
}
