package graft.log

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** [[RowAlign.alignValue]] — the recursive by-name alignment that lets
  * log rows meet Spark's NESTED-pruned required schemas (the r12 fix for
  * the AIOOBE the Row→Catalyst converter threw when a full nested row
  * met a pruned struct type). The fuzz builds random nested schemas,
  * values of the FULL shape, and random pruned SUBSET schemas, then
  * demands the aligned value survives the Catalyst converter for the
  * pruned type with the right values in the right places.
  */
class RowAlignSpec extends AnyFunSuite {

  private val rnd = new Random(20261208L)

  private def randomSchema(depth: Int, prefix: String): StructType = {
    val n = 1 + rnd.nextInt(4)
    StructType((0 until n).map { i =>
      val name = s"$prefix$i"
      val dt: DataType = rnd.nextInt(if (depth > 0) 6 else 4) match {
        case 0 => StringType
        case 1 => IntegerType
        case 2 => LongType
        case 3 => DoubleType
        case 4 => randomSchema(depth - 1, name + "_")
        case 5 => ArrayType(randomSchema(depth - 1, name + "_e"), containsNull = true)
      }
      StructField(name, dt, nullable = true)
    })
  }

  private def randomValue(dt: DataType): Any = dt match {
    case _ if rnd.nextInt(8) == 0 => null
    case StringType => "s" + rnd.nextInt(100)
    case IntegerType => rnd.nextInt(1000)
    case LongType => rnd.nextLong() % 100000L
    case DoubleType => rnd.nextInt(1000) / 8.0
    case s: StructType => Row.fromSeq(s.fields.map(f => randomValue(f.dataType)).toIndexedSeq)
    case a: ArrayType => Vector.fill(rnd.nextInt(3))(randomValue(a.elementType))
    case other => throw new IllegalStateException(other.toString)
  }

  /** A random SUBSET of `s` (every field kept with p=0.6, at least one),
    * recursing into nested structs — the shape nested-schema pruning
    * produces.
    */
  private def prune(s: StructType): StructType = {
    val kept = s.fields.filter(_ => rnd.nextDouble() < 0.6)
    val base = if (kept.isEmpty) Array(s.fields(rnd.nextInt(s.fields.length))) else kept
    StructType(base.map { f =>
      f.dataType match {
        case st: StructType => f.copy(dataType = prune(st))
        case ArrayType(st: StructType, cn) => f.copy(dataType = ArrayType(prune(st), cn))
        case _ => f
      }
    })
  }

  private def check(v: Any, dt: DataType): Unit = (v, dt) match {
    case (null, _) => ()
    case (r: Row, s: StructType) =>
      assert(r.length == s.length, s"arity ${r.length} vs ${s.treeString}")
      s.fields.zipWithIndex.foreach { case (f, i) => check(r.get(i), f.dataType) }
    case (seq: Seq[_], a: ArrayType) => seq.foreach(check(_, a.elementType))
    case _ => ()
  }

  test("fuzz: aligned values fit every pruned subset schema and convert cleanly") {
    for (_ <- 0 until 200) {
      val full = randomSchema(2, "f")
      val pruned = prune(full)
      // top-level log rows are never null — only their fields are
      val value = Row.fromSeq(full.fields.map(f => randomValue(f.dataType)).toIndexedSeq)
      val aligned = RowAlign.alignValue(value, full, pruned)
      check(aligned, pruned)
      // the converter is the component the unaligned shape crashed
      val converted = CatalystTypeConverters.createToCatalystConverter(pruned)(aligned)
      assert(converted != null)
      // kept top-level fields carry the source's values
      val srcIdx = full.fieldNames.zipWithIndex.toMap
      val ar = aligned.asInstanceOf[Row]
      pruned.fields.zipWithIndex.foreach { case (f, i) =>
        if (!f.dataType.isInstanceOf[StructType] && !f.dataType.isInstanceOf[ArrayType])
          assert(ar.get(i) == value.get(srcIdx(f.name)), s"value drift on ${f.name}")
      }
    }
  }

  test("identical schemas short-circuit to the flat coercion") {
    val s = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val v = Row(1L, "x")
    assert(RowAlign.alignValue(v, s, s).asInstanceOf[Row] == v)
    // and numeric widening still applies on scalar mismatches
    assert(RowAlign.alignValue(7, IntegerType, LongType) == 7L)
  }
}
