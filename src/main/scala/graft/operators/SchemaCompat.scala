package graft.operators

import org.apache.spark.sql.types._

/** Schema-compatibility checker — the registry gate that belongs in
  * front of every evolving feed (Avro/Confluent's compatibility modes,
  * applied to Spark StructTypes): decide BEFORE a commit whether the
  * proposed schema can break readers, instead of discovering it as a
  * downstream AnalysisException at 2am.
  *
  *  - BACKWARD: consumers compiled against the NEW schema can read
  *    data written with the OLD one. Adding a field requires it to be
  *    nullable (old rows have no value for it); removing is free; type
  *    changes must be lossless widenings.
  *  - FORWARD: consumers compiled against the OLD schema can read data
  *    written with the NEW one. Removing a field requires the OLD
  *    field to be nullable (old readers still expect it); adding is
  *    free; type changes must be lossless NARROWING-free in the other
  *    direction (old type must widen from new).
  *  - FULL: both.
  *
  * Widening follows Spark's lossless ladder: byte→short→int→long,
  * float→double, decimal(p,s)→decimal(p'≥p,s) (same scale), and a
  * nullable-ness RELAXATION (required→nullable) — never the reverse.
  * Structs recurse; arrays/maps recurse on their element/value types.
  * Driver-side metadata check: O(fields), no data touched.
  */
object SchemaCompat {

  sealed trait Mode
  case object Backward extends Mode
  case object Forward extends Mode
  case object Full extends Mode

  final case class Violation(field: String, issue: String)

  /** Violations of `mode` when evolving `old` → `next`; empty = safe. */
  def check(old: StructType, next: StructType, mode: Mode): Seq[Violation] =
    mode match {
      case Backward => backward(old, next, prefix = "")
      case Forward => forward(old, next, prefix = "")
      case Full =>
        (backward(old, next, "") ++ forward(old, next, "")).distinct
    }

  /** Lossless widening: can data of type `from` be read as `to`? */
  private[operators] def widens(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (a: DecimalType, b: DecimalType) =>
        b.scale == a.scale && b.precision >= a.precision
      case (ArrayType(ae, an), ArrayType(be, bn)) =>
        widens(ae, be) && (bn || !an)
      case (MapType(ak, av, an), MapType(bk, bv, bn)) =>
        ak == bk && widens(av, bv) && (bn || !an)
      case (a: StructType, b: StructType) =>
        // struct widens iff backward-compatible field-wise
        backward(a, b, "").isEmpty
      case _ => false
    }

  // new readers, old data: every NEW field must be fillable from old
  private def backward(old: StructType, next: StructType, prefix: String): Seq[Violation] = {
    val byName = old.fields.map(f => f.name -> f).toMap
    next.fields.toSeq.flatMap { nf =>
      val path = s"$prefix${nf.name}"
      byName.get(nf.name) match {
        case None =>
          if (nf.nullable) Nil
          else Seq(Violation(path,
            "added as REQUIRED — old rows carry no value; add it nullable (or with a default)"))
        case Some(of) =>
          val tv =
            if (widens(of.dataType, nf.dataType)) Nil
            else Seq(Violation(path,
              s"type ${of.dataType.simpleString} cannot be read as ${nf.dataType.simpleString} (lossy or incompatible)"))
          val nv =
            if (of.nullable && !nf.nullable)
              Seq(Violation(path, "tightened nullable → required — old rows may hold NULL"))
            else Nil
          tv ++ nv
      }
    }
  }

  // old readers, new data: every OLD field must still be servable
  private def forward(old: StructType, next: StructType, prefix: String): Seq[Violation] = {
    val byName = next.fields.map(f => f.name -> f).toMap
    old.fields.toSeq.flatMap { of =>
      val path = s"$prefix${of.name}"
      byName.get(of.name) match {
        case None =>
          if (of.nullable) Nil
          else Seq(Violation(path,
            "removed but old readers REQUIRE it — deprecate to nullable first, remove later"))
        case Some(nf) =>
          if (widens(nf.dataType, of.dataType)) Nil
          else Seq(Violation(path,
            s"new type ${nf.dataType.simpleString} cannot be read as old ${of.dataType.simpleString}"))
      }
    }
  }
}
