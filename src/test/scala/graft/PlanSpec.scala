package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape contract for the query battery — the `.explain` audit as
 * regression tests. These pin the properties that matter at 100 TB:
 * filters and projections reach the parquet scan, dimension joins
 * broadcast, top-k compiles to TakeOrdered, LSH paths never go
 * cartesian, scalar pipelines stay inside whole-stage codegen.
 */
class PlanSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q3: predicate and projection reach the parquet scan") {
    val plan = planOf(Queries.q3FilterProject(spark, dir))
    assert(plan.contains("PushedFilters:"), plan.take(1200))
    assert(plan.contains("IsNotNull(l_quantity)") ||
      plan.contains("GreaterThan(l_quantity"), plan.take(3000))
    // pruned read schema: only the 4 selected columns + filter columns
    assert(!plan.contains("l_shipdate"), "scan reads unneeded column")
    assert(!plan.contains("l_tax"), "scan reads unneeded column")
  }

  test("q2/q14: dimension joins are broadcast, not shuffled") {
    assert(planOf(Queries.q2JoinAgg(spark, dir)).contains("BroadcastHashJoin"))
    val p14 = planOf(Queries.q14StarJoin(spark, dir))
    assert(p14.contains("BroadcastHashJoin"))
    assert(!p14.contains("SortMergeJoin"), "star dims must broadcast")
  }

  test("q1: aggregate is partial+final hash aggregate") {
    val plan = planOf(Queries.q1Agg(spark, dir))
    assert(plan.contains("HashAggregate"))
    assert(plan.toLowerCase.contains("partial"), plan.take(2000))
  }

  test("q10/q21: top-k compiles to TakeOrderedAndProject") {
    assert(planOf(Queries.q10TopK(spark, dir)).contains("TakeOrderedAndProject"))
    assert(planOf(Queries.q21KnnExact(spark, dir)).contains("TakeOrderedAndProject"))
  }

  test("q5: clean-text pipeline stays in whole-stage codegen") {
    val df = Queries.q5CleanText(spark, dir)
    df.collect() // finalize the adaptive plan so codegen stages appear
    val plan = planOf(df)
    // codegen stages render as "*(n)" prefixes in the final plan tree
    assert(plan.contains("*("), plan.take(1500))
    assert(!plan.contains("BatchEvalPython"))
  }

  test("q22/q23/q24: LSH paths contain no cartesian product") {
    for (q <- Seq(
      Queries.q22MinhashPairs(spark, dir),
      Queries.q23SimhashPairs(spark, dir),
      Queries.q24AnnLsh(spark, dir))) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), plan.take(1500))
    }
  }

  test("q15: dictionary join broadcasts the 11k-entry dictionary") {
    val plan = planOf(Queries.q15WordScoreExact(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q18: jaccard runs as postings equi-join, not array pairing") {
    val plan = planOf(Queries.q18JaccardPairs(spark, dir))
    assert(!plan.contains("CartesianProduct"))
    // the postings formulation joins then aggregates pair counts
    assert(plan.contains("HashAggregate"))
  }

  test("q37: decontamination probes via broadcast, corpus side unshuffled") {
    val plan = planOf(Queries.q37Decontaminate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q38/q41/q43: per-row pipelines add no exchange before the sort/agg") {
    // map-only operators: the only exchanges allowed are the final
    // ORDER BY's range partitioning (q38/q41) or the single aggregate
    // shuffle (q43) — anything more means the operator shuffles rows
    // it should process in place
    def exchanges(p: String): Int = "Exchange".r.findAllIn(p).size
    assert(exchanges(planOf(Queries.q38Repetition(spark, dir))) <= 1)
    assert(exchanges(planOf(Queries.q41Redact(spark, dir))) <= 1)
    assert(exchanges(planOf(Queries.q43RateMix(spark, dir))) <= 2)
  }

  test("q42: stratified sample is one window shuffle") {
    val plan = planOf(Queries.q42Stratified(spark, dir))
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q70: keep-best dedup prunes groups BEFORE the exchange (WindowGroupLimit)") {
    // Spark 4 compiles the rank-1 filter to partial+final
    // WindowGroupLimit: each map task forwards only its local winner
    // per normalized-text group, so a mega-duplicate cluster ships
    // per-task winners, not every copy
    val plan = planOf(Queries.q70DupBest(spark, dir))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q68 oovRate: vocab is TakeOrdered-bounded and joins back broadcast") {
    // assert on the pre-checkpoint plan (the public query checkpoints
    // eagerly, severing the lineage under inspection): TakeOrdered
    // bounds the vocab at V rows, and the scoring join must be a
    // BroadcastHashJoin — a shuffled join here would move the whole tf
    // frame a second time
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (tf, result) = ops.TextStats.oovRatePlan(docs, "doc_id", "text", 100)
    try {
      val plan = planOf(result)
      assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      assert(!plan.contains("CartesianProduct"))
    } finally tf.unpersist()
  }

  test("q31/q32: temporal joins push event_type to the scan, no cartesian") {
    for (q <- Seq(
      Queries.q31AsofJoin(spark, dir),
      Queries.q32RangeJoin(spark, dir))) {
      val plan = planOf(q)
      // the event_type predicate reaches the parquet scan on each branch
      assert(plan.contains("PushedFilters:"), plan.take(2000))
      assert(plan.contains("EqualTo(event_type,"), plan.take(3000))
      // the range/asof shape is an equi-join or window, never a theta join
      assert(!plan.contains("CartesianProduct"), plan.take(1500))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
      // the unused wide `props` column is pruned from the scan
      assert(!plan.contains("props"), "scan reads unneeded props column")
    }
  }

  test("q107: exact global sample is TakeOrderedAndProject with zero exchanges") {
    val plan = planOf(Queries.q107ExactSample(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("Exchange"), "exact-N sample must not shuffle")
  }

  test("q106: per-source cap prunes groups before the exchange (WindowGroupLimit)") {
    val plan = planOf(Queries.q106SourceCap(spark, dir))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      "summary joins over the source domain must broadcast")
  }

  test("q122: staleness-bounded asof keeps the one-shuffle window shape") {
    val plan = planOf(Queries.q122AsofWithin(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      plan.take(2000))
  }

  test("q113: surgical decontamination is map-only after the gram census") {
    val plan = planOf(Queries.q113MaskDecontaminate(spark, dir))
    // the masking side adds only the final orderBy exchange; the hot
    // set rides the closure, so no join appears in the apply plan
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("q136: pack plan's window partitions by shard, never a global window") {
    // the running-sum window must hash-partition on shard (the scale
    // knob) — an empty partition spec would serialize the whole corpus
    // through one task
    val plan = planOf(Queries.q136PackPlan(spark, dir))
    assert(plan.contains("hashpartitioning(shard"), plan.take(2500))
    assert("windowspecdefinition\\(shard".r.findFirstIn(plan).isDefined,
      plan.take(2500))
    assert(!plan.contains("SinglePartition"), plan.take(2500))
    assert(!plan.contains("Join"), "pack plan is join-free")
  }
}
