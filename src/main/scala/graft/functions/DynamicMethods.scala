package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Analysis-time type dispatch for SQLMethods whose reference semantics
  * depend on the runtime value class (method/misc/SQLMethodType.java,
  * SQLMethodJavaType.java, collection/SQLMethodSizeTest, conversion/
  * SQLMethodAsListTest, misc/SQLMethodInclude/Exclude with wildcards).
  * Spark columns carry one static type, so each dispatch resolves once
  * per plan to a plain built-in expression (same pattern as
  * [[DynamicPlus]]).
  */
object DynamicMethods {
  /** Reference Type enum name for a Spark type (engine Type.java). */
  def typeName(dt: DataType): String = dt match {
    case StringType            => "STRING"
    case BooleanType           => "BOOLEAN"
    case ByteType              => "BYTE"
    case ShortType             => "SHORT"
    case IntegerType           => "INTEGER"
    case LongType              => "LONG"
    case FloatType             => "FLOAT"
    case DoubleType            => "DOUBLE"
    case _: DecimalType        => "DECIMAL"
    case DateType              => "DATE"
    case TimestampType         => "DATETIME"
    case BinaryType            => "BINARY"
    case _: ArrayType          => "LIST"
    case _: MapType            => "MAP"
    case _: StructType         => "EMBEDDED"
    case NullType              => "NULL"
    case other                 => other.simpleString.toUpperCase
  }

  def javaTypeName(dt: DataType): String = dt match {
    case StringType     => "java.lang.String"
    case BooleanType    => "java.lang.Boolean"
    case ByteType       => "java.lang.Byte"
    case ShortType      => "java.lang.Short"
    case IntegerType    => "java.lang.Integer"
    case LongType       => "java.lang.Long"
    case FloatType      => "java.lang.Float"
    case DoubleType     => "java.lang.Double"
    case _: DecimalType => "java.math.BigDecimal"
    case DateType       => "java.util.Date"
    case TimestampType  => "java.util.Date"
    case BinaryType     => "byte[]"
    case _: ArrayType   => "java.util.List"
    case _: MapType     => "java.util.Map"
    case _: StructType  => "java.util.Map"
    case other          => other.simpleString
  }
}

/** `.size()`: element count for collections/maps, character count for
  * strings (SQLMethodAdditionalCoverageTest.sizeMethodOnString). */
case class DynamicSize(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case StringType | BinaryType     => Cast(Length(child), IntegerType)
    case _: ArrayType | _: MapType   => Size(child)
    case NullType                    => Literal(0)
    case _                           => Literal(1) // scalar = one value
  }
  override protected def withNewChildInternal(c: Expression): DynamicSize = copy(child = c)
}

/** `.asList()`: a collection stays itself; a scalar wraps into a
  * single-element list (SQLMethodAsList.java). */
case class DynamicAsList(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType => child
    case _            => CreateArray(Seq(child))
  }
  override protected def withNewChildInternal(c: Expression): DynamicAsList = copy(child = c)
}

/** `.type()` / `.javaType()`: the engine/Java type NAME of the value —
  * static per column in a columnar engine, so it folds to a literal. */
case class TypeNameOf(child: Expression, java: Boolean)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = Literal.create(
    if (java) DynamicMethods.javaTypeName(child.dataType)
    else DynamicMethods.typeName(child.dataType), StringType)
  override protected def withNewChildInternal(c: Expression): TypeNameOf = copy(child = c)
}

/** `.include('a','pfx*')` / `.exclude(...)` over a map OR an embedded
  * struct, with the reference's `*`-suffix wildcard patterns
  * (SQLMethodAdditionalCoverageTest includeWildcardMatchesCorrectFields). */
case class FieldsFilter(child: Expression, patterns: Seq[String], keep: Boolean)
    extends UnaryExpression with RuntimeReplaceable {
  private def matches(field: String): Boolean = patterns.exists { p =>
    if (p.endsWith("*")) field.startsWith(p.dropRight(1)) else field == p
  }
  override lazy val replacement: Expression = child.dataType match {
    case st: StructType =>
      val kept = st.fields.filter(f => matches(f.name) == keep)
      CreateNamedStruct(kept.flatMap(f =>
        Seq(Literal.create(f.name, StringType), GetStructField(
          child, st.fieldIndex(f.name), Some(f.name)))).toSeq)
    case _: MapType =>
      val key = NamedLambdaVariable("k", child.dataType.asInstanceOf[MapType].keyType, false)
      val value = NamedLambdaVariable("v",
        child.dataType.asInstanceOf[MapType].valueType, true)
      val cond = patterns.map { p =>
        if (p.endsWith("*")) StartsWith(key, Literal.create(p.dropRight(1), StringType))
        else EqualTo(key, Literal.create(p, StringType)): Expression
      }.reduceOption[Expression](Or).getOrElse(Literal.FalseLiteral)
      MapFilter(child, LambdaFunction(
        if (keep) cond else Not(cond), Seq(key, value)))
    case other =>
      throw new IllegalArgumentException(
        s"include/exclude needs a map or embedded document, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(c: Expression): FieldsFilter = copy(child = c)
}
