package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SchemaCompat
import graft.operators.SchemaCompat.{Backward, Forward, Full, Violation}

/** Avro-mode schema compatibility on StructTypes: additive evolution,
  * widenings, nullability tightening, removals, nested structures. */
class SchemaCompatSpec extends AnyFunSuite {

  private val base = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("amt", DecimalType(10, 2), nullable = true)))

  test("identical schemas are compatible in every mode") {
    for (m <- Seq(Backward, Forward, Full))
      assert(SchemaCompat.check(base, base, m).isEmpty)
  }

  test("adding a nullable field is backward-safe; a required one is not") {
    val okAdd = base.add(StructField("tag", StringType, nullable = true))
    assert(SchemaCompat.check(base, okAdd, Backward).isEmpty)
    val badAdd = base.add(StructField("tag", StringType, nullable = false))
    val v = SchemaCompat.check(base, badAdd, Backward)
    assert(v.map(_.field) === Seq("tag"))
    assert(v.head.issue.contains("REQUIRED"))
  }

  test("widening types pass, narrowing fails, decimal scale is pinned") {
    val widened = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("amt", DecimalType(18, 2), nullable = true)))
    assert(SchemaCompat.check(base, widened, Backward).isEmpty)
    val narrowed = StructType(base.fields.map {
      case f if f.name == "k" => f.copy(dataType = IntegerType)
      case f => f
    })
    assert(SchemaCompat.check(base, narrowed, Backward).nonEmpty)
    val rescaled = StructType(base.fields.map {
      case f if f.name == "amt" => f.copy(dataType = DecimalType(12, 4))
      case f => f
    })
    assert(SchemaCompat.check(base, rescaled, Backward).nonEmpty,
      "scale change is not a widening")
  }

  test("nullability: tightening breaks backward; removing required breaks forward") {
    val tightened = StructType(base.fields.map {
      case f if f.name == "name" => f.copy(nullable = false)
      case f => f
    })
    assert(SchemaCompat.check(base, tightened, Backward)
      .exists(_.issue.contains("nullable")))
    val dropped = StructType(base.fields.filterNot(_.name == "k"))
    assert(SchemaCompat.check(base, dropped, Backward).isEmpty,
      "removal is backward-safe")
    assert(SchemaCompat.check(base, dropped, Forward)
      .exists(_.issue.contains("removed")))
    val droppedNullable = StructType(base.fields.filterNot(_.name == "name"))
    assert(SchemaCompat.check(base, droppedNullable, Forward).isEmpty,
      "removing a NULLABLE field is forward-safe")
  }

  test("FULL mode = additive nullable evolution only") {
    val okAdd = base.add(StructField("tag", StringType, nullable = true))
    assert(SchemaCompat.check(base, okAdd, Full).isEmpty,
      "nullable add is full-compatible (old readers ignore unknown fields)")
    val dropped = StructType(base.fields.filterNot(_.name == "k"))
    assert(SchemaCompat.check(base, dropped, Full).nonEmpty)
  }

  test("nested structs and array elements recurse") {
    val nested = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("addr", StructType(Seq(
        StructField("city", StringType, nullable = true))), nullable = true),
      StructField("tags", ArrayType(IntegerType, containsNull = true), nullable = true)))
    val evolved = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("addr", StructType(Seq(
        StructField("city", StringType, nullable = true),
        StructField("zip", StringType, nullable = true))), nullable = true),
      StructField("tags", ArrayType(LongType, containsNull = true), nullable = true)))
    assert(SchemaCompat.check(nested, evolved, Backward).isEmpty,
      "nested nullable add + element widening are backward-safe")
    val badNested = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("addr", StructType(Seq(
        StructField("city", StringType, nullable = true),
        StructField("zip", StringType, nullable = false))), nullable = true),
      StructField("tags", ArrayType(IntegerType, containsNull = true), nullable = true)))
    assert(SchemaCompat.check(nested, badNested, Backward).nonEmpty,
      "a REQUIRED field added inside a nested struct is caught")
  }

  test("violations name the field and read like advice") {
    val badAdd = base.add(StructField("tag", StringType, nullable = false))
    val Violation(field, issue) = SchemaCompat.check(base, badAdd, Backward).head
    assert(field === "tag" && issue.nonEmpty)
  }
}
