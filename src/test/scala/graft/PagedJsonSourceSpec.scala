package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sanitize
import graft.sources.PagedJsonSource

/** The paged-cursor connector must parallelize by page (one
  * InputPartition per page), serve records as raw API strings, prune
  * columns at the reader, and compose with the silver coercion layer.
  */
class PagedJsonSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("daily_budget", StringType)))

  private def fixture(n: Int): String = {
    val f = Files.createTempFile("paged", ".jsonl")
    val lines = (0 until n).map {
      case 3 => """{"id": "c3", "name": "no budget here"}"""
      case 5 => """{"id": "c5", "name": "numeric json", "daily_budget": 1500}"""
      case i => s"""{"id": "c$i", "name": "camp $i", "daily_budget": "${100 * (i + 1)}"}"""
    }
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  private def read(path: String, pageSize: Int) =
    spark.read.format(classOf[PagedJsonSource].getName)
      .schema(schema).option("path", path)
      .option("pageSize", pageSize.toString).load()

  test("reads every record; one partition per page") {
    val df = read(fixture(10), 3)
    assert(df.rdd.getNumPartitions == 4) // ceil(10/3)
    val rows = df.collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(rows.size == 10)
    assert(rows("c0") == "100")
    assert(rows("c3") == null) // absent field -> null
    assert(rows("c5") == "1500") // non-string JSON served as its text
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val df = read(fixture(4), 2).select("id")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan renders the pruned output attribute list
    assert(plan.contains("[id#") && !plan.contains("daily_budget#"), plan)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("c0", "c1", "c2", "c3"))
  }

  test("page size larger than the file yields a single page") {
    val df = read(fixture(5), 100)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 5)
  }

  test("composes with the silver coercion layer (bronze strings -> typed)") {
    import org.apache.spark.sql.types.LongType
    // G11 canonicalizes the string in place; castToSchema types it
    val canon = Sanitize.coerceNumerics(read(fixture(6), 4))
    val silver = Sanitize.castToSchema(canon,
      StructType(Seq(StructField("daily_budget", LongType))))
    val r = silver.filter(silver("id") === "c1").head()
    assert(r.get(r.fieldIndex("daily_budget")) == 200L) // "200" -> long
  }

  test("rejects non-string schemas and missing path") {
    import org.apache.spark.sql.types.LongType
    val bad = StructType(Seq(StructField("id", LongType)))
    val e = intercept[Exception] {
      spark.read.format(classOf[PagedJsonSource].getName)
        .schema(bad).option("path", "/tmp/x.jsonl").load().collect()
    }
    assert(e.getMessage.contains("raw API strings"))
  }
}
