package graft.lake.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.lake.{PartTransform, UnsupportedTypeException}

/** The lake's `bucket(n, col)` partition function as a V2
  * `FunctionCatalog` function. Exposing it is what lets Spark's
  * storage-partitioned join REASON about bucket partitioning: the
  * analyzer resolves each side's `bucket` transform against this
  * function, and two scans whose `KeyGroupedPartitioning` binds the same
  * canonical function with the same bucket count are co-partitioned —
  * the join runs with ZERO exchange. Semantics are exactly
  * [[PartTransform]]'s md5 bucket (engine-portable, what the writers
  * stamp into the directory layout).
  */
object DuckLakeBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): DuckLake md5 hash bucket of the column's string form"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.size != 2)
      throw new UnsupportedTypeException(s"bucket expects (n, col), got $inputType")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case StringType | LongType | IntegerType | ShortType | ByteType => ()
      case other => throw new UnsupportedTypeException(
        s"bucket key type not supported: ${other.simpleString}")
    }
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "ducklake.bucket"
      // a null key has no bucket (it lives in the null partition)
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): Integer = {
        if (input.isNullAt(0) || input.isNullAt(1)) return null
        val n = input.getInt(0)
        val raw = keyType match {
          case StringType  => input.getUTF8String(1).toString
          case LongType    => input.getLong(1).toString
          case IntegerType => input.getInt(1).toString
          case ShortType   => input.getShort(1).toString
          case ByteType    => input.getByte(1).toString
          case other => throw new UnsupportedTypeException(other.simpleString)
        }
        Int.box(PartTransform.transformValue(s"bucket[$n]", StringType, raw).toInt)
      }
    }
  }
}
