package graft.fit

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** `RddOps.sumAggregate` — the bounded-driver-collect gradient reduce.
  *
  * The big-buffer path (executor-side tree to ONE partition) must compute
  * the same sums as the depth-2 treeAggregate path; integer-valued addends
  * make the equality exact regardless of addend order, so these tests pin
  * the routing logic, not float luck. The tiny `maxResultBytesOverride`
  * values force the big path deterministically — the real conf default
  * (1 GiB) never routes suite-sized buffers there.
  */
class SumAggregateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  import SumAggregateSpec.{expected, seqOp}

  test("depth-2 path and forced big-buffer path agree exactly") {
    val sc = spark.sparkContext
    val vs = 1 to 10000
    val sz = 37
    val rdd = sc.parallelize(vs, 32)
    val small = RddOps.sumAggregate(rdd, sz, seqOp) // default conf: depth-2
    val big = RddOps.sumAggregate(rdd, sz, seqOp, maxResultBytesOverride = 1L)
    val want = expected(sz, vs)
    assert(small.toSeq == want.toSeq)
    assert(big.toSeq == want.toSeq)
  }

  test("big-buffer path is multi-level above fan-in 8 and handles empty partitions") {
    val sc = spark.sparkContext
    val vs = 1 to 100
    val sz = 5
    // 100 partitions, most holding 1 element, reduced 100 → 13 → 2 → 1
    val rdd = sc.parallelize(vs, 100)
    val big = RddOps.sumAggregate(rdd, sz, seqOp, maxResultBytesOverride = 1L)
    assert(big.toSeq == expected(sz, vs).toSeq)
  }

  test("unlimited maxResultSize (0) keeps the depth-2 path") {
    val sc = spark.sparkContext
    val rdd = sc.parallelize(1 to 100, 8)
    val out = RddOps.sumAggregate(rdd, 3, seqOp, maxResultBytesOverride = 0L)
    assert(out.toSeq == expected(3, 1 to 100).toSeq)
  }
}

/** Serializable home for the executor-side closure (a method on the suite
  * would capture the non-serializable scalatest engine).
  */
private object SumAggregateSpec {
  def seqOp(buf: Array[Double], v: Int): Unit = {
    buf(0) += v
    buf(1) += v.toLong * v
    buf(2 + (v % (buf.length - 2))) += 1
  }

  def expected(sz: Int, vs: Seq[Int]): Array[Double] = {
    val buf = new Array[Double](sz)
    vs.foreach(seqOp(buf, _))
    buf
  }
}
