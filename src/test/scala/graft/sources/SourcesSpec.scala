package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The reference's fixture-ingestion path (data-raw/datasets.R): libsvm →
  * named design matrix → factor expansion → fit.
  */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-sources")
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", dir.resolve("warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("libsvm round trip: sparse read, named expansion, straight into a fit") {
    val f = dir.resolve("tiny.libsvm")
    // y = 2*x1 - x3 (x2 absent from some rows = sparse zero)
    val lines = (1 to 40).map { i =>
      val x1 = i * 0.1; val x3 = (i % 5) * 1.0
      val y = 2 * x1 - x3
      if (i % 2 == 0) s"$y 1:$x1 3:$x3" else s"$y 1:$x1 2:0.5 3:$x3"
    }
    Files.write(f, String.join("\n", lines: _*).getBytes)

    val raw = Sources.readLibsvm(spark, f.toString, numFeatures = 3)
    assert(raw.count() == 40)
    assert(raw.schema.fieldNames.toSet == Set("label", "features"))

    val named = Sources.readLibsvmNamed(spark, f.toString,
      Seq("x1", "x2", "x3"), labelName = "y")
    assert(named.schema.fieldNames.toSeq == Seq("y", "x1", "x2", "x3"))
    val r0 = named.orderBy("y").head()
    assert(!r0.isNullAt(1))

    // the vector column fits directly (sparse-preserving path)
    val model = graft.Slope.fit(raw, Seq("features"), "label",
      graft.fit.SlopeConfig(sigma = Array(1e-9)))
    val beta = model.fit.betas.head
    assert(math.abs(beta(1, 0) - 2.0) < 1e-4)
    assert(math.abs(beta(3, 0) + 1.0) < 1e-4)
  }

  test("csv with explicit schema reads without inference") {
    val f = dir.resolve("t.csv")
    Files.write(f, "a,b\n1.5,x\n2.5,y\n".getBytes)
    val schema = StructType(Seq(
      StructField("a", DoubleType), StructField("b", StringType)))
    val df = Sources.readCsv(spark, f.toString, schema)
    assert(df.schema == schema)
    assert(df.count() == 2)
  }

  test("jsonl round trip: pinned schema, corrupt-record quarantine, no inference") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val out = dir.resolve("docs_jsonl").toString
    val df = Seq((1L, "hello world", "en"), (2L, "hallo welt", "de"))
      .toDF("doc_id", "text", "lang")
    Sinks.writeJsonLines(df, out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    // Spark disallows corrupt-column-only queries on raw JSON; cache first
    // (the same applies to production audits — documented on readJsonLines)
    val back = Sources.readJsonLines(spark, out, schema).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
    assert(back.select("doc_id", "text", "lang").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "hello world", "en"), (2L, "hallo welt", "de")))
    back.unpersist()
    // a malformed line is quarantined whole, not fatal, and good rows survive
    val f = dir.resolve("dirty.jsonl")
    Files.write(f,
      "{\"doc_id\": 1, \"text\": \"ok\", \"lang\": \"en\"}\nnot json at all\n".getBytes)
    val dirty = Sources.readJsonLines(spark, f.toString, schema).cache()
    assert(dirty.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(dirty.filter(col("_corrupt_record").isNull).count() == 1)
    assert(dirty.filter(col("doc_id") === 1L).head.getString(1) == "ok")
    dirty.unpersist()
  }

  test("oneHot drops the first lexicographic level and indicates the rest") {
    val sp = spark; import sp.implicits._
    val df = Seq((1.0, "M"), (2.0, "F"), (3.0, "I"), (4.0, "M"))
      .toDF("y", "sex")
    val out = Sources.oneHot(df, "sex")
    assert(out.columns.toSeq == Seq("y", "sex_I", "sex_M")) // F = reference level
    val byY = out.collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byY(1.0) == ((0.0, 1.0)))
    assert(byY(2.0) == ((0.0, 0.0)))
    assert(byY(3.0) == ((1.0, 0.0)))
  }

  test("partitioned parquet sink: reads prune non-matching partitions before I/O") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "en", "hello"), (2L, "de", "hallo"), (3L, "en", "world"),
      (4L, "fr", "salut")).toDF("doc_id", "lang", "text")
    val out = dir.resolve("docs_by_lang").toString
    Sinks.writeParquetPartitioned(docs, out, Seq("lang"))

    val back = spark.read.parquet(out).filter($"lang" === "en")
    assert(back.count() == 2)
    val scan = back.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"partition filter must prune at the directory level: ${scan.partitionFilters}")
    // the pruned scan's file listing holds only the en=... directory
    assert(scan.relation.location.inputFiles.length == 4, "layout sanity")
    assert(scan.metrics.contains("numFiles"))
  }

  test("ORC sink/source: partition pruning and predicate pushdown reach the ORC scan") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "en", 10), (2L, "de", 20), (3L, "en", 30), (4L, "fr", 40))
      .toDF("doc_id", "lang", "n")
    val out = dir.resolve("docs_orc").toString
    Sinks.writeOrcPartitioned(docs, out, Seq("lang"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))
    val back = Sources.readOrc(spark, out, schema)
      .filter($"lang" === "en" && $"n" > 15)
    assert(back.collect().map(_.getLong(0)).toSeq == Seq(3L))
    val scan = back.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang must prune at the directory level: ${scan.partitionFilters}")
    assert(scan.metadata.get("PushedFilters").exists(_.contains("GreaterThan(n,15)")),
      s"n > 15 must push into the ORC reader: ${scan.metadata.get("PushedFilters")}")
  }

  test("bucketed sink: fact-to-fact join on the bucket key plans with zero exchanges") {
    val sp = spark; import sp.implicits._
    val a = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, s"s$i")).toDF("k", "vb")
    Sinks.writeBucketed(a, "fact_a", "k", 4)
    Sinks.writeBucketed(b, "fact_b", "k", 4)
    // hint on the INPUT side forces the sort-merge path: a broadcast join
    // would hide the bucket layout (and at real fact⋈fact scale neither
    // side fits in memory anyway)
    val noBcast = spark.table("fact_a").hint("merge")
      .join(spark.table("fact_b"), "k")
    assert(noBcast.collect().length == 100)
    // same QueryExecution that just ran — AQE has finalized this plan
    val plan = noBcast.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    spark.sql("DROP TABLE IF EXISTS fact_a")
    spark.sql("DROP TABLE IF EXISTS fact_b")
  }
}
