package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native 60-bit hash must be BIT-identical to the composed
  * `conv(substring(md5(x), 1, 15), 16, 10)` it replaced — every oracle,
  * every salted sample, every LSH bucket depends on that equality.
  */
class Md5Hash60Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-md5hash60-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("native hash equals the conv(substring(md5)) form on varied inputs, codegen and interpreted") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val strings = Seq("", "a", "salt-0", "é中文 mixed",
      " leading and trailing ", "0123456789" * 40) ++
      (0 until 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(60)).mkString)
    val df = strings.toDF("s")
      .withColumn("native", Md5Hash60.column(col("s")))
      .withColumn("composed", conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
    assert(df.filter(col("native") =!= col("composed")).count() == 0)
    // range: 60-bit unsigned, never negative
    assert(df.filter(col("native") < 0).count() == 0)
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(Md5Hash60.column(col("s"))).collect().head
    assert(n.isNullAt(0))
    // interpreted path (no codegen) agrees too
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val df2 = strings.toDF("s")
        .withColumn("native", Md5Hash60.column(col("s")))
        .withColumn("composed", conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
      assert(df2.filter(col("native") =!= col("composed")).count() == 0)
    } finally sp.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
