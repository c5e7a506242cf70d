package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._

import graft.engine.SchemaEvolve

/** Algebraic properties of schema reconciliation, checked over scalacheck
  * generators (sampled deterministically — no scalatestplus bridge in the
  * offline cache): evolution must be idempotent and order-insensitive in the
  * ways replay depends on — re-delivering a batch after a schema change must
  * reconcile to the same table schema. */
class SchemaEvolvePropSpec extends AnyFunSuite {

  private val names = Gen.oneOf("a", "b", "c", "d", "e")
  private val widenable = Gen.oneOf[DataType](ByteType, ShortType, IntegerType, LongType)
  private val numeric = Gen.oneOf[DataType](
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
  private val anyType = Gen.oneOf[DataType](
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, StringType,
    BooleanType, TimestampType)

  private def schemaGen(types: Gen[DataType]): Gen[StructType] = for {
    n <- Gen.choose(0, 5)
    fields <- Gen.listOfN(n, Gen.zip(names, types))
  } yield StructType(fields.toMap.map { case (k, v) => StructField(k, v) }.toSeq.sortBy(_.name))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def tryReconcile(a: StructType, b: StructType): Option[StructType] =
    try Some(SchemaEvolve.reconcile(a, b)) catch { case _: IllegalArgumentException => None }

  private def typeSet(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSet

  test("reconcile is idempotent: reconcile(t, t) == t") {
    for (t <- samples(schemaGen(anyType), 200))
      assert(typeSet(SchemaEvolve.reconcile(t, t)) === typeSet(t))
  }

  test("re-applying a batch schema after evolution is a no-op") {
    for ((t, b) <- samples(Gen.zip(schemaGen(widenable), schemaGen(widenable)), 200))
      tryReconcile(t, b).foreach { r1 =>
        assert(typeSet(SchemaEvolve.reconcile(r1, b)) === typeSet(r1),
          s"t=$t b=$b r1=$r1")
      }
  }

  test("evolution never narrows and keeps every batch column") {
    for ((t, b) <- samples(Gen.zip(schemaGen(widenable), schemaGen(widenable)), 200))
      tryReconcile(t, b).foreach { r =>
        for (tf <- t.fields) {
          val rf = r(tf.name)
          assert(SchemaEvolve.widen(tf.dataType, rf.dataType).contains(rf.dataType),
            s"${tf.name}: ${tf.dataType} must widen to ${rf.dataType} (t=$t b=$b)")
        }
        assert(b.fieldNames.toSet.subsetOf(r.fieldNames.toSet))
      }
  }

  test("widen is commutative and reflexive") {
    for ((a, b) <- samples(Gen.zip(numeric, numeric), 100)) {
      assert(SchemaEvolve.widen(a, b) === SchemaEvolve.widen(b, a))
      assert(SchemaEvolve.widen(a, a) === Some(a))
    }
  }
}
