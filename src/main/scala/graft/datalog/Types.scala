package graft.datalog

import org.apache.spark.sql.types._

/** Declared-type mapping (reference: dl/Utilities.scala:63-83 maps the 8
  * supported DeAL types to Spark types; 128/256-bit ints — DbLongLong /
  * DbLongLongLongLong at dl/Utilities.scala:34-45 — throw "unsupported"
  * there. We EXCEED that: `decimal` maps to DecimalType(38,0), exact
  * 128-bit integer arithmetic, the declared upgrade path SURVEY.md §1
  * notes). */
object Types {
  def sparkType(name: String): DataType = name.toLowerCase match {
    case "byte" => ByteType
    case "short" => ShortType
    case "int" | "integer" => IntegerType
    case "long" | "bigint" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "datetime" | "date" => DateType
    case "decimal" => DecimalType(38, 0)
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  /** Parse one trimmed CSV field per declared type (reference:
    * dl/Utilities.scala:34-45,139-151). */
  def parse(value: String, dt: DataType): Any = dt match {
    case ByteType => value.toByte
    case ShortType => value.toShort
    case IntegerType => value.toInt
    case LongType => value.toLong
    case FloatType => value.toFloat
    case DoubleType => value.toDouble
    case StringType => value
    case DateType => java.sql.Date.valueOf(value)
    case _: DecimalType => new java.math.BigDecimal(value)
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }
}
