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

  /** Resolve a (possibly dotted) field path — "u.s" addresses branch s of
    * union-as-struct-of-optionals field u (SURVEY §1.2). */
  private def field(path: String): StructField = {
    def go(st: StructType, parts: List[String]): StructField = parts match {
      case p :: Nil => st.fields.find(_.name == p).getOrElse(
        throw new IllegalArgumentException(s"unknown field $path"))
      case p :: rest => st.fields.find(_.name == p) match {
        case Some(StructField(_, sub: StructType, _, _)) => go(sub, rest)
        case _ => throw new IllegalArgumentException(s"unknown field $path")
      }
      case Nil => throw new IllegalArgumentException("empty field path")
    }
    go(valueSchema, path.split("\\.").toList)
  }

  private def checkNoOps(name: String): Unit =
    require(!listAdds.contains(name) && !listRemoves.contains(name) &&
      !mapPuts.contains(name) && !mapRemoves.contains(name),
      s"cannot set field $name after collection ops on it")

  private def checkNotSet(name: String): Unit =
    require(!sets.contains(name),
      s"cannot apply collection ops to field $name after setting it")

  def setField(name: String, value: Any): this.type = {
    require(!field(name).dataType.isInstanceOf[StructType],
      s"$name is a union/record — set its branches (setUnionField) instead")
    checkNoOps(name)
    sets(name) = value; this
  }

  /** Set a union field to one branch: the chosen branch gets `value`, every
    * sibling branch is explicitly nulled — the struct-of-optionals encoding
    * of Avro "set union to branch X" (at most one branch non-null). */
  def setUnionField(name: String, branch: String, value: Any): this.type = {
    val st = field(name).dataType match {
      case s: StructType => s
      case _ => throw new IllegalArgumentException(s"$name is not a union")
    }
    require(st.fieldNames.contains(branch), s"$name has no branch $branch")
    st.fields.foreach { sf =>
      setField(s"$name.${sf.name}", if (sf.name == branch) value else null)
    }
    this
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

  /** Row in deriveUpdateSchema(valueSchema) field order. Union/record
    * fields nest recursively (an all-NoOp branch struct collapses to null —
    * the nested-NoOp encoding applyField expects). */
  def buildRow(): Row = {
    def cells(value: StructType, prefix: String): Seq[Any] =
      value.fields.toSeq.flatMap { f =>
        val path = prefix + f.name
        f.dataType match {
          case _: ArrayType => Seq(sets.get(path).orNull,
            listAdds.get(path).orNull, listRemoves.get(path).orNull)
          case _: MapType => Seq(sets.get(path).orNull,
            mapPuts.get(path).orNull, mapRemoves.get(path).orNull)
          case st: StructType =>
            val inner = cells(st, path + ".")
            val touched = sets.keys.exists(_.startsWith(path + "."))
            Seq(if (!touched && inner.forall(_ == null)) null
              else Row.fromSeq(inner.toIndexedSeq))
          case _ => Seq(sets.get(path).orNull)
        }
      }
    Row.fromSeq((cells(valueSchema, "") :+ sets.keys.toSeq).toIndexedSeq)
  }
}
