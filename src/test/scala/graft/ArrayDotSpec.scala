package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

class ArrayDotSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot matches the higher-order fold bit-for-bit") {
    val df = sources.Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val both = df
      .withColumn("native", VectorOps.dot(col("embedding"), col("embedding")))
      .withColumn("fold", expr(
        """aggregate(zip_with(cast(embedding as array<double>),
          |  cast(embedding as array<double>), (x, y) -> x * y),
          |  0.0d, (acc, x) -> acc + x)""".stripMargin))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
  }

  test("array_dot is registered as a SQL function") {
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) === 11.0)
    // float arrays work without casting
    val f = spark.sql(
      "SELECT array_dot(array(cast(1.5 as float)), array(cast(2.0 as float))) AS d").head()
    assert(f.getDouble(0) === 3.0)
  }

  test("array_dot rejects non-numeric-array inputs at analysis") {
    val e = intercept[Exception](
      spark.sql("SELECT array_dot(array('a'), array('b'))").head())
    assert(e.getMessage.toLowerCase.contains("array_dot"))
  }

  test("length mismatch errors loudly instead of truncating") {
    val e = intercept[Exception](
      spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d)) AS d").head())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("length mismatch")))
  }

  test("null array yields null, not a crash") {
    val r = spark.sql(
      "SELECT array_dot(cast(null as array<double>), array(1.0d)) AS d").head()
    assert(r.isNullAt(0))
  }

  test("lut_sum matches the higher-order fold bit-for-bit on random LUTs") {
    // deterministic pseudo-random codes + LUTs derived from the id
    val df = spark.range(200).select(col("id"),
      expr("transform(sequence(0, 7), s -> cast(pmod(hash(id, s), 16) as int))")
        .as("codes"),
      expr("""transform(sequence(0, 7), s ->
             |  transform(sequence(0, 15), c ->
             |    cast(pmod(hash(id, s, c), 1000) as double) / 7.0d))""".stripMargin)
        .as("luts"))
    val both = df
      .withColumn("native", expr("lut_sum(codes, luts)"))
      .withColumn("fold", expr(
        "aggregate(zip_with(codes, luts, (c, l) -> l[c]), 0d, (a, x) -> a + x)"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
  }

  test("lut_sum rejects shape violations loudly") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // code count != LUT count
    val e1 = intercept[Exception](spark.sql(
      "SELECT lut_sum(array(0, 1), array(array(1.0d))) AS s").head())
    assert(messages(e1).exists(_.contains("codes vs")))
    // code outside its LUT
    val e2 = intercept[Exception](spark.sql(
      "SELECT lut_sum(array(3), array(array(1.0d, 2.0d))) AS s").head())
    assert(messages(e2).exists(_.contains("outside LUT")))
    // NULL element: ArrayData.getInt on a null slot would silently read
    // 0 (a wrong lookup, not a null score) — must refuse loudly instead
    val e3 = intercept[Exception](spark.sql(
      "SELECT lut_sum(array(cast(null as int), 1), " +
        "array(array(5.0d, 6.0d), array(7.0d, 8.0d))) AS s").head())
    assert(messages(e3).exists(_.contains("NULL element")))
    // NULL inside a LUT: getDouble on a null slot would read 0.0
    val e4 = intercept[Exception](spark.sql(
      "SELECT lut_sum(array(0), array(array(cast(null as double)))) AS s").head())
    assert(messages(e4).exists(_.contains("NULL LUT entry")))
  }

  test("byte_dot == array_dot over the same code values, and rejects " +
      "mismatched lengths / wrong types loudly") {
    import spark.implicits._
    val codes = Array[Byte](1, -2, 127, -127)
    val df = Seq((Array(0.5, -1.25, 2.0, 127.0), codes,
      codes.map(_.toDouble))).toDF("q", "c", "cd")
    val viaBytes = df.selectExpr("byte_dot(q, c)").head.getDouble(0)
    val viaDoubles = df.selectExpr("array_dot(q, cd)").head.getDouble(0)
    assert(viaBytes === viaDoubles)
    assert(viaBytes === 0.5 * 1 + -1.25 * -2 + 2.0 * 127 + 127.0 * -127)

    val bad = Seq((Array(1.0, 2.0), Array[Byte](1))).toDF("q", "c")
    val e = intercept[Exception] { bad.selectExpr("byte_dot(q, c)").collect() }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("length mismatch"))
    val te = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("a", "b").selectExpr("byte_dot(a, b)").collect()
    }
    assert(te.getMessage.contains("byte_dot"))
  }
}
