package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.nested.Normalize

/** SURVEY §2.5 — the recursive normalizer (the reference's centerpiece,
  * `ct_utils.py:54-180`).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val nested = Seq(
    """{"id":1,"who":{"name":"a","geo":{"lat":1.5}},"items":[{"sku":"s1","qty":2},{"sku":"s2","qty":3}]}""",
    """{"id":2,"who":{"name":"b","geo":{"lat":2.5}},"items":[]}""",
    """{"id":3,"who":{"name":"c","geo":{"lat":3.5}},"items":null}"""
  )

  private def df = spark.read.json(spark.createDataset(nested))

  test("N1 listColumns is schema-driven (ct_utils.py:54-68)") {
    assert(Normalize.listColumns(df) == Seq("items"))
    assert(Normalize.listColumns(df, exclude = Set("items")).isEmpty)
  }

  test("N4 normalize reaches scalar-only fixpoint with parent__child names (ct_utils.py:161-180)") {
    val out = Normalize.normalize(df)
    assert(Normalize.isFlat(out))
    assert(out.columns.toSet ==
      Set("id", "who__name", "who__geo__lat", "items__sku", "items__qty"))
  }

  test("N2 explode_outer preserves rows with empty/null arrays (ct_utils.py:83-93)") {
    val out = Normalize.normalize(df)
    // id=1 → 2 item rows; id=2 (empty) and id=3 (null) survive as null rows
    assert(out.count() == 4)
    val nulls = out.filter(col("items__sku").isNull)
      .select("id").as[Long].collect().toSet
    assert(nulls == Set(2L, 3L))
  }

  test("N5 exclusion list honored; serializeExcluded emits JSON strings (ct_utils.py:59-61)") {
    val out = Normalize.normalize(df, exclude = Set("items"))
    assert(out.schema("items").dataType.isInstanceOf[ArrayType])
    val ser = Normalize.normalize(df, exclude = Set("items"), serializeExcluded = true)
    assert(ser.schema("items").dataType == StringType)
    assert(Normalize.isFlat(ser))
  }

  test("N3 flatten uniquifies when parent__child collides with an existing column") {
    val df = spark.read.json(spark.createDataset(Seq(
      """{"a__b": 1, "a": {"b": 2}}"""))(org.apache.spark.sql.Encoders.STRING))
    val flat = Normalize.flattenOnce(df)
    assert(flat.columns.toSeq.sorted == Seq("a__b", "a__b_2"))
    val row = flat.select("a__b", "a__b_2").head()
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)
    // and the fixpoint stays usable on the collision
    val norm = Normalize.normalize(df)
    assert(norm.columns.distinct.length == norm.columns.length)
  }

  test("N4 terminates on deeply nested arrays-of-structs-of-arrays") {
    val deep = Seq(
      """{"a":[{"b":[{"c":[1,2]},{"c":[3]}]}],"d":{"e":{"f":{"g":"x"}}}}"""
    )
    val out = Normalize.normalize(spark.read.json(spark.createDataset(deep)))
    assert(Normalize.isFlat(out))
    assert(out.columns.contains("a__b__c"))
    assert(out.count() == 3) // 1×(2+1) exploded leaf values
  }

  test("N4 fixpoint is a no-op on already-flat frames") {
    val flat = Seq((1, "x")).toDF("a", "b")
    assert(Normalize.normalize(flat).columns.toSeq == Seq("a", "b"))
  }

  test("N4 property: terminates with a scalar-only schema on random nested JSON (depth ≤ 4)") {
    // generator for arbitrary nested JSON values (drives spark.read.json
    // schema inference → arbitrary nested StructType/ArrayType trees)
    val rnd = new scala.util.Random(42)
    def genValue(depth: Int): String =
      if (depth == 0) rnd.nextInt(3) match {
        case 0 => rnd.nextInt(100).toString
        case 1 => "\"s" + rnd.nextInt(10) + "\""
        case _ => "null"
      }
      else rnd.nextInt(4) match {
        case 0 => genValue(0)
        case 1 => // object
          (0 until 1 + rnd.nextInt(3))
            .map(i => s""""f$i": ${genValue(depth - 1)}""").mkString("{", ", ", "}")
        case 2 => // array
          (0 until rnd.nextInt(3)).map(_ => genValue(depth - 1)).mkString("[", ", ", "]")
        case _ => "null"
      }
    (1 to 15).foreach { trial =>
      val docs = (1 to 5).map(i =>
        s"""{"id": $i, "payload": ${genValue(1 + rnd.nextInt(3))}}""")
      val df = spark.read.json(spark.createDataset(docs))
      val out = Normalize.normalize(df)
      assert(Normalize.isFlat(out), s"trial $trial not flat: ${out.schema.simpleString}")
      assert(out.count() >= 0) // plan executes
    }
  }
}
