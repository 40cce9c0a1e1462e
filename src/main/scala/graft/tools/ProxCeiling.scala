package graft.tools

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Measure the DRIVER-SIDE feature-dimension ceiling of the path driver —
  * the documented hard part "β/prox state must fit on one node: p ≤ ~10⁸
  * doubles" (SURVEY §7) — so the claim is data, not argument.
  *
  * Every path step's driver work is O(p) or O(p log p) regardless of n:
  *   - `SortedL1.prox`: sort |v| desc + PAVA + sign restore (the per
  *     FISTA-iteration cost);
  *   - `SortedL1.infeasibility`: sort + prefix max (the per-step KKT gate);
  *   - the momentum update: 3 p-length axpy/copies;
  * plus, per iteration, ONE cluster reduce of a p-length gradient
  * (treeAggregate), whose driver-side cost is the final merge of
  * `depth`-ary partials (~8 MB per 10⁶ doubles over the wire).
  *
  * This rehearsal times each at p = 10⁶ … 10⁷·√10 on synthetic
  * deterministic arrays (xorshift values, BH-shaped λ), samples driver
  * heap, and runs the real `treeAggregate` reduce over 32 partitions —
  * the local stand-in for a 1000-executor gradient reduce. One JSON line
  * per p; `PSCALE.json` holds the table SCALING.md cites.
  *
  * Usage: runMain graft.tools.ProxCeiling [pList]
  *   pList: comma-separated, default "1000000,3162277,10000000,31622776"
  */
object ProxCeiling {

  private def xorshift(seed0: Long): () => Long = {
    var s = seed0
    () => { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def usedHeapMb(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) >> 20
  }

  def main(args: Array[String]): Unit = {
    val ps = args.headOption.getOrElse("1000000,3162277,10000000,31622776")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-prox-ceiling")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // FIRST measured knee (2026-08-14, this box): at p = 3.16e7 a fixed
      // depth-2 treeAggregate ships ~6 partials of 8p bytes to the
      // driver — 1.2 GiB, over the 1 GiB spark.driver.maxResultSize
      // DEFAULT, which killed the reduce before heap was ever stressed
      // and capped default-config wide fits at p ≈ 2e7. RddOps's
      // gradient reduces now route through `RddOps.sumAggregate`, which
      // tree-combines oversized partials executor-side down to ONE
      // buffer — so this rehearsal runs at the DEFAULT maxResultSize on
      // purpose: the p ≥ 3.16e7 rows prove the knee is gone (the first
      // edition needed an 8g override to survive them).
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc: SparkContext = spark.sparkContext

    val out = new StringBuilder
    ps.foreach { p =>
      System.gc()
      val heap0 = usedHeapMb()
      val rnd = xorshift(0x9E3779B97F4A7C15L + p)
      // gradient-shaped values in [-1, 1); BH-ish decreasing λ in (0, 1]
      val grad = Array.fill(p)(rnd().toDouble / Long.MaxValue)
      val lam = Array.tabulate(p)(i => 1.0 - i.toDouble / (p + 1))
      val heapData = usedHeapMb() - heap0

      // per-iteration prox (sort + PAVA); clone inside the timed region —
      // the solver also materializes the thresholded copy each iteration
      val (_, tProx) = time(graft.slope.SortedL1.prox(grad.clone(), lam))
      val (_, tInfeas) = time(graft.slope.SortedL1.infeasibility(grad, lam))
      // momentum-update shape: beta = tilde + (tilde - tildeOld)*c
      val tilde = grad.clone(); val tildeOld = grad.clone()
      val (_, tAxpy) = time {
        val b = new Array[Double](p)
        var i = 0
        while (i < p) { b(i) = tilde(i) + (tilde(i) - tildeOld(i)) * 0.5; i += 1 }
        b.length
      }
      // the cluster reduce a real iteration pays: 32 executor-side p-vectors
      // merged to one driver vector through the SAME bounded-collect
      // routing the solver uses (depth-2 treeAggregate for small p,
      // executor-side tree to one partition once depth-2's fan-in would
      // break maxResultSize)
      val (_, tReduce) = time {
        graft.fit.RddOps.sumAggregate[Int](
          sc.parallelize(1 to 32, 32), p,
          (acc, k) => { var i = 0; while (i < p) { acc(i) += k * 1e-6; i += 1 } }
        ).length
      }
      val heapPeak = usedHeapMb()
      val line =
        s"""{"p":$p,"prox_sec":${f"$tProx%.4f"},"infeas_sec":${f"$tInfeas%.4f"},""" +
        s""""axpy_sec":${f"$tAxpy%.4f"},"grad_reduce_sec":${f"$tReduce%.4f"},""" +
        s""""heap_data_mb":$heapData,"heap_used_mb":$heapPeak,""" +
        s""""max_heap_mb":${Runtime.getRuntime.maxMemory() >> 20},""" +
        s""""max_result_size":"${sc.getConf.get("spark.driver.maxResultSize", "1g")}"}"""
      println(s"[prox-ceiling] $line")
      out.append(line).append('\n')
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PSCALE.json"),
      out.toString)
    spark.stop()
  }
}
