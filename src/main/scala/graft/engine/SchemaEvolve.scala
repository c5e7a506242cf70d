package graft.engine

import org.apache.spark.sql.types._

/** Schema-evolution reconciliation: merge an incoming batch's payload schema
  * with the table's current payload schema.
  *
  * Legal evolutions (mirrors Iceberg's safe set; reference embryo:
  * /root/reference/etl/fact_planned.py:465-479 writes partial columns,
  * /root/reference/etl/fact_changed.py:793-844 widens rows with changed
  * fields):
  *   - ADD COLUMN (new payload column appended, old rows read as null)
  *   - type widening byte->short->int->long, float->double, int->long etc.
  * Anything else (drop, rename, incompatible type) is rejected loudly —
  * silent coercion is how CDC pipelines corrupt data.
  */
object SchemaEvolve {

  private val widenOrder: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
  private val floatOrder: Map[DataType, Int] = Map(FloatType -> 0, DoubleType -> 1)

  /** Widest common type if the pair is a legal widening, else None. */
  def widen(a: DataType, b: DataType): Option[DataType] = {
    if (a == b) Some(a)
    else (widenOrder.get(a), widenOrder.get(b)) match {
      case (Some(x), Some(y)) => Some(if (x >= y) a else b)
      case _ =>
        (floatOrder.get(a), floatOrder.get(b)) match {
          case (Some(x), Some(y)) => Some(if (x >= y) a else b)
          case _ => None
        }
    }
  }

  /** Reconciled payload schema: table columns first (possibly widened),
    * then new batch-only columns in batch order. */
  def reconcile(table: StructType, batch: StructType): StructType = {
    val batchByName = batch.fields.map(f => f.name -> f).toMap
    val merged = table.fields.map { tf =>
      batchByName.get(tf.name) match {
        case None => tf
        case Some(bf) =>
          val t = widen(tf.dataType, bf.dataType).getOrElse(throw new IllegalArgumentException(
            s"illegal schema evolution for column '${tf.name}': " +
              s"${tf.dataType.simpleString} -> ${bf.dataType.simpleString} " +
              "(only add-column and widening byte/short/int/long, float/double are allowed)"))
          StructField(tf.name, t, nullable = true)
      }
    }
    val tableNames = table.fieldNames.toSet
    val added = batch.fields.filterNot(f => tableNames.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    StructType(merged ++ added)
  }
}
