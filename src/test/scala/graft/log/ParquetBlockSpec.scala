package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ParquetBlock decoding of nested layouts beyond what the reference
  * fixtures carry: doubly-nested LIST/MAP types (annotation-aware
  * recursion at every level) and the parquet-format backward-compat
  * rules — Hive's `bag/array_element` wrapper (rule 4: unwrap any
  * single-field group not named `array`/`*_tuple`) and the legacy
  * 2-level `array`-named struct element (rule 3: the group IS the
  * element).
  */
class ParquetBlockSpec extends AnyFunSuite {

  private def bytes(schemaStr: String)(write: SimpleGroup => Unit): Array[Byte] = {
    val schema = MessageTypeParser.parseMessageType(schemaStr)
    val tmp = Files.createTempDirectory("graft-pqblock").resolve("t.parquet")
    val w = ExampleParquetWriter.builder(new HPath(tmp.toUri.toString))
      .withConf(new Configuration(false)).withType(schema).build()
    try {
      val g = new SimpleGroup(schema)
      write(g)
      w.write(g)
    } finally w.close()
    val out = Files.readAllBytes(tmp)
    Files.deleteIfExists(tmp)
    out
  }

  test("list<list<int>> (3-level at both levels) decodes recursively") {
    val content = bytes(
      """message m {
        |  required int32 id;
        |  optional group ll (LIST) {
        |    repeated group list {
        |      optional group element (LIST) {
        |        repeated group list { optional int32 element; }
        |      }
        |    }
        |  }
        |}""".stripMargin) { g =>
      g.add("id", 1)
      val outer = g.addGroup("ll")
      val inner1 = outer.addGroup("list").addGroup("element")
      inner1.addGroup("list").add("element", 1)
      inner1.addGroup("list").add("element", 2)
      val inner2 = outer.addGroup("list").addGroup("element")
      inner2.addGroup("list").add("element", 3)
    }
    val (schema, rows) = ParquetBlock.decode(content)
    assert(schema("ll").dataType == ArrayType(ArrayType(IntegerType, true), true))
    assert(rows.head.getSeq[Seq[Int]](1) == Seq(Seq(1, 2), Seq(3)))
  }

  test("map<string, list<int>> decodes the list-typed values") {
    val content = bytes(
      """message m {
        |  required int32 id;
        |  optional group m1 (MAP) {
        |    repeated group key_value {
        |      required binary key (UTF8);
        |      optional group value (LIST) {
        |        repeated group list { optional int32 element; }
        |      }
        |    }
        |  }
        |}""".stripMargin) { g =>
      g.add("id", 7)
      val kv = g.addGroup("m1").addGroup("key_value")
      kv.add("key", "a")
      val lst = kv.addGroup("value")
      lst.addGroup("list").add("element", 1)
      lst.addGroup("list").add("element", 2)
    }
    val (schema, rows) = ParquetBlock.decode(content)
    assert(schema("m1").dataType ==
      MapType(StringType, ArrayType(IntegerType, true), true))
    assert(rows.head.getMap[String, Seq[Int]](1) == Map("a" -> Seq(1, 2)))
  }

  test("Hive bag/array_element layout unwraps to the element type (rule 4)") {
    val content = bytes(
      """message m {
        |  required int32 id;
        |  optional group tags (LIST) {
        |    repeated group bag { optional binary array_element (UTF8); }
        |  }
        |}""".stripMargin) { g =>
      g.add("id", 2)
      val outer = g.addGroup("tags")
      outer.addGroup("bag").add("array_element", "x")
      outer.addGroup("bag").add("array_element", "y")
    }
    val (schema, rows) = ParquetBlock.decode(content)
    assert(schema("tags").dataType == ArrayType(StringType, true))
    assert(rows.head.getSeq[String](1) == Seq("x", "y"))
  }

  test("legacy array-named single-field group IS the struct element (rule 3)") {
    val content = bytes(
      """message m {
        |  required int32 id;
        |  optional group pts (LIST) {
        |    repeated group array { required int32 x; }
        |  }
        |}""".stripMargin) { g =>
      g.add("id", 3)
      val outer = g.addGroup("pts")
      outer.addGroup("array").add("x", 1)
      outer.addGroup("array").add("x", 2)
    }
    val (schema, rows) = ParquetBlock.decode(content)
    assert(schema("pts").dataType ==
      ArrayType(StructType(Seq(StructField("x", IntegerType, nullable = false))), true))
    assert(rows.head.getSeq[Row](1) == Seq(Row(1), Row(2)))
  }
}
