package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Physical-layout contracts: bucketed joins skip exchanges, salted
  * joins reproduce plain-join results on skewed keys. */
class LayoutSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a stale warehouse dir without a catalog entry blocks re-creation
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed tables join without shuffling either side") {
    dropTable("b_orders")
    dropTable("b_lineitem")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Layout.writeBucketed(
      orders.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8)
    // force SMJ: at fixture scale AQE would broadcast (which disables
    // the bucketed read); production fact-fact sizes always take SMJ
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem").hint("merge"), "k")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle:\n" + plan.take(2000))
    assert(plan.contains("Bucketed: true"), plan.take(2000))
    assert(joined.count() === lineitem.count()) // FK join preserves fact rows
    dropTable("b_orders")
    dropTable("b_lineitem")
  }

  test("salted join equals plain join on a skewed key") {
    // 10k rows of one hot key + a uniform tail
    val big = ((1 to 10000).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong % 10 + 2, s"tail$i")))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Layout.saltedJoin(big, small, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("key skew report: shares and skew ratios against the key mean") {
    // 6 + 2 + 2 rows over 3 keys -> mean 10/3; skew(a) = 6*3/10
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
    val rows = Layout.keySkewReport(df, "k", k = 2).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b")) // count desc, key asc tie-break
    val a = rows.head
    assert(a.getLong(1) === 6L)
    assert(a.getDouble(2) === 0.6)    // 6/10
    assert(a.getDouble(3) === 1.8)    // 6 * 3 / 10
    val b = rows(1)
    assert(b.getLong(1) === 2L && b.getDouble(2) === 0.2 && b.getDouble(3) === 0.6)
  }

  test("copartitioned frames reuse their partitioning across the join") {
    val (a, b) = Layout.copartition(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey").as("k"), col("o_totalprice")),
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(col("l_orderkey").as("k"), col("l_quantity")),
      "k", 8)
    // force a sort-merge join so AQE's broadcast conversion doesn't
    // replace the partitioning-reuse scenario under test
    val joined = a.join(b.hint("merge"), "k")
    joined.collect()
    // count exchanges in the FINAL adaptive plan only (the plan string
    // repeats the initial plan below it)
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // exactly the two explicit repartitions; the join itself adds none
    assert(exchanges <= 2, s"found $exchanges exchanges:\n" + plan.take(2000))
  }

  test("compaction bins fill sequentially and isolate oversized files") {
    import spark.implicits._
    val inv = Seq(
      // partition p: 30+30 fill bin 0 (target 100 -> cum 0, 30);
      // 70 starts at cum 60 -> bin 0 (spillover allowed); 80 at cum
      // 130 -> bin 1; the 500 giant at cum 210 -> bin 2; next file at
      // cum 710 -> bin 7 (giant consumed bins 2-6)
      ("p", "a", 30L), ("p", "b", 30L), ("p", "c", 70L), ("p", "d", 80L),
      ("p", "e", 500L), ("p", "f", 10L),
      // partition q is independent
      ("q", "a", 10L))
      .toDF("part", "file", "bytes")
    val bins = Layout.compactionBins(inv, "part", "file", "bytes", 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(bins === Map(
      ("p", "a") -> 0L, ("p", "b") -> 0L, ("p", "c") -> 0L,
      ("p", "d") -> 1L, ("p", "e") -> 2L, ("p", "f") -> 7L,
      ("q", "a") -> 0L))
    val plan = Layout.compactionPlan(inv, "part", "file", "bytes", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(plan.toSeq === Seq(
      ("p", 0L, 3L, 130L, "a", "c"), ("p", 1L, 1L, 80L, "d", "d"),
      ("p", 2L, 1L, 500L, "e", "e"), ("p", 7L, 1L, 10L, "f", "f"),
      ("q", 0L, 1L, 10L, "a", "a")))
  }
}
