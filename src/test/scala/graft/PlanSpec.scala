package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: at 100 TB the PLAN is the product, so the
  * properties that make these queries scale are pinned as tests — filters
  * and column pruning reaching the parquet scan, small dimensions broadcast,
  * latest-per-key as a hash aggregate (no window sort), codegen on the hot
  * paths. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize the AQE plan — pre-execution it hides codegen/join choices
    // keep only the final plan (the dump appends the pre-AQE initial plan too)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q02: predicate and projection push down to the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      s"expected pushed filters on l_shipdate in:\n$p")
    // pruned read schema: only the 4 needed columns are read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "scan reads columns the query never uses")
  }

  test("q69/q70 media decode: the scan is pruned to the two driver columns") {
    // The typed mapPartitions decode stage sits behind a select of
    // (doc_id, n_chars) — at 100 TB the difference between reading 2 of 5
    // columns and all 5 (incl. the fat `text`) is the whole scan budget.
    for (q <- Seq("q69_media_image", "q70_media_audio")) {
      val p = plan(q)
      assert(p.contains("ReadSchema"), s"$q plan lacks a parquet scan")
      assert(!p.contains("text"), s"$q scan reads `text`, which it never uses:\n$p")
      assert(!p.contains("lang") && !p.contains("source"),
        s"$q scan reads unused metadata columns")
    }
  }

  test("q03: star-schema dims are broadcast, not shuffled") {
    val p = plan("q03_star_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dim join fell back to sort-merge")
  }

  test("q06: latest-per-key is one aggregation over one shuffle — no window") {
    val p = plan("q06_latest_per_key")
    // SortAggregate is expected: HashAggregateExec cannot hold struct/string
    // buffers. The scale properties are partial agg + a single exchange.
    assert(p.contains("partial_max"), s"expected map-side partial aggregation in:\n$p")
    assert(p.split("Exchange hashpartitioning").length == 2,
      s"expected exactly one shuffle in:\n$p")
    assert(!p.contains("Window"), "latest-per-key should not need a window")
  }

  test("q01: whole-stage codegen covers the aggregation path") {
    val p = plan("q01_pricing_summary")
    // AQE's final-plan string marks codegen stages with a "*(n)" prefix
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"expected codegen spans in:\n$p")
  }

  test("q04: anti join stays a broadcast/hash join") {
    val p = plan("q04_anti_join")
    assert(p.contains("LeftAnti"), s"expected anti join in:\n$p")
  }

  test("q47 IVF: centroid set and probe set are broadcast, corpus never sort-merged") {
    val p = plan("q47_ann_ivf")
    assert(p.contains("Broadcast"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must join against broadcast centroids/probes, not sort-merge")
  }

  test("GLOBAL: no CartesianProduct anywhere; nested-loop joins only on O(1)-small broadcast sides") {
    // The one plan family that cannot run at 100x is an unbounded
    // nested-loop/cartesian pair join. Invariant over the ENTIRE library:
    // no CartesianProduct at all, and BroadcastNestedLoopJoin only where
    // the broadcast side is constant-size by construction:
    //   q09 day x event-type scaffold (|days| x |types|),
    //   q27 ten probe vectors against the partitioned corpus,
    //   q40/q46 the per-round arrival frontier (<= |node types|),
    //   q47 sixteen centroids / ten probes,
    //   q48 the single-row global-quota scalar,
    //   q59/q60 the single-row corpus-constant scalar (N/avgdl, token total).
    // Any new query joining two data-sized inputs without an equi-key
    // fails here before it ever reaches a cluster.
    val allowedBnlj = Set("q09_scaffold_zerofill", "q27_ann_topk",
      "q40_earliest_arrival", "q46_earliest_journey", "q47_ann_ivf",
      "q48_mixture_sample", "q59_bm25_rank", "q60_unigram_logprob",
      // q61: 50-probe broadcast side x `vec_id =!= probe_id` — same
      // bounded-probe-batch orientation as q27.
      "q61_knn_classify",
      // q66: the waterfill scalars (k, sat_total/m) — single-row broadcast
      // sides over the |languages|-row count table.
      "q66_capped_mix",
      // q75: the k-means fit/assign crossJoins broadcast the k=16 centroid
      // set (q47's shape); the pairwise stage itself is a shuffle equi-join
      // on cell, pinned below.
      "q75_semdedup",
      // q76: the token-total scalars — a single-row broadcast over the
      // 256-row bucket domain.
      "q76_dsir_select",
      // q78: 10-probe broadcast side x `label =!= plabel` — the bounded
      // probe-batch orientation of q27/q61.
      "q78_hard_negatives")
    for ((name, _) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!allowedBnlj.contains(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the documented allowlist")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q67: salted aggregation is two exchanges, both partial-aggregated") {
    val p = plan("q67_salted_agg")
    // phase 1 shuffles on (event_type, __salt), phase 2 on event_type —
    // exactly two exchanges, each preceded by a map-side partial aggregate
    // (4 HashAggregates total); no single-reducer funnel anywhere
    assert(p.split("Exchange hashpartitioning").length - 1 === 2,
      s"expected exactly 2 hash exchanges in:\n$p")
    assert(p.split("HashAggregate").length - 1 >= 4,
      s"expected partial+final aggregates in both phases in:\n$p")
    assert(p.contains("__salt"), s"salt column missing from the phase-1 key in:\n$p")
  }

  test("q51 normalization chain stays native: codegen projection, no UDF eval") {
    val p = plan("q51_normalize_full")
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"expected codegen span in:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("Invoke"),
      s"normalization must be a native expression chain:\n$p")
  }

  test("q26 embed near-dup: banded candidates, no all-pairs join, no corpus broadcast") {
    val p = plan("q26_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q26 plans an all-pairs join:\n$p")
  }

  test("q28 ANN LSH: candidate join shuffles on bucket — corpus is never broadcast") {
    // every vector is a probe in q28, so the candidate join's right side IS
    // the corpus: a broadcast there ships all data to every task (the q26
    // plan-shape class). The scale plan is a shuffle hash join on `bucket`
    // with identical per-bucket candidate locality.
    val p = plan("q28_ann_lsh")
    assert(p.contains("ShuffledHashJoin"),
      s"q28's bucket candidate join must shuffle, not broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q28 plans an all-pairs join:\n$p")
  }

  test("q75 SemDeDup: pairwise stage is a shuffle equi-join on cell, corpus never broadcast") {
    // the cluster-bounded pairwise scan is the method's entire scale claim:
    // both sides of the pair join are the corpus, so neither may broadcast —
    // only the k=16 centroid set (the fit/assign crossJoins) is allowed on
    // a broadcast side.
    val p = plan("q75_semdedup")
    assert(p.contains("ShuffledHashJoin"),
      s"q75's within-cell pair join must shuffle on cell:\n$p")
    assert(!p.contains("CartesianProduct"), s"q75 plans an all-pairs join:\n$p")
  }

  test("q77 substring dedup: min-witness aggregation, no pairwise join anywhere") {
    // doc x doc never appears: one groupBy(window) -> min(doc_id), one join
    // back on the window hash — O(total chars), the q58 block shape
    val p = plan("q77_substring_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q77 must not plan a pairwise join:\n$p")
  }

  test("q14/q44 fuzzy resolve: deletion-neighborhood equi-join, never a theta-join") {
    // the scale property: candidates come from an equi-join on deletion
    // variants — an all-pairs BroadcastNestedLoopJoin/CartesianProduct
    // (the reference's crossJoin shape) must not appear anywhere
    for (q <- Seq("q14_fuzzy_match", "q44_resolve_audit")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q plans an all-pairs join:\n$p")
    }
  }

  test("BFS frontierExpand: broadcast under the guard, shuffle join above it") {
    import spark.implicits._
    import graft.queries.Relational
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val frontier = Seq((1L, 0)).toDF("node", "hop").localCheckpoint(true)
    val small = Relational.frontierExpand(frontier, edges, threshold = 100L)
    assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "small frontier should broadcast")
    val big = Relational.frontierExpand(frontier, edges, threshold = 0L)
    val p = big.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"),
      s"over-threshold frontier must not broadcast:\n$p")
  }

  test("engine merge plan: state+batch LWW is a hash aggregate over a single shuffle") {
    import graft.engine.{CdcEngine, EngineConf}
    import graft.icelite.IceliteTable
    val dir = SparkTestBase.tmpDir("planspec")
    val engine = new CdcEngine(spark,
      IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8), EngineConf(buckets = 8))
    engine.applyBatch(0, graft.synth.Synth.events(spark, 500, seed = 13))
    val p = engine.currentState().queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "current-state read must not sort")
    // after one batch the read is a plain scan + project/filter
    assert(p.contains("Scan parquet") || p.contains("FileScan"), s"unexpected plan:\n$p")
  }

  test("SQL surface: a WHERE over ice.t pushes down to the parquet scan") {
    import graft.engine.{CdcEngine, EngineConf}
    import graft.icelite.IceliteTable
    val dir = SparkTestBase.tmpDir("planspec-sql")
    val engine = new CdcEngine(spark,
      IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8), EngineConf(buckets = 8))
    engine.applyBatch(0, graft.synth.Synth.events(spark, 500, seed = 21))
    graft.sql.IceliteSql.register(spark, "plansql", engine)
    val df = spark.sql(
      "SELECT repo, path FROM ice.plansql WHERE repo = 'repo-0'")
    val p = df.queryExecution.executedPlan.toString
    // the substituted plan is the engine's parquet read, so Catalyst's
    // pushdown applies to SQL text unchanged: the key predicate must reach
    // the scan as a pushed filter, not sit in a post-scan Filter only
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(repo,repo-0\\).*"),
      s"key filter not pushed to scan:\n$p")
    assert(p.contains("Scan parquet") || p.contains("FileScan"), s"no file scan:\n$p")
  }

  test("changelog plan: classification is a generate over joins — no cartesian, no window") {
    import graft.engine.{CdcEngine, EngineConf}
    import graft.icelite.IceliteTable
    val dir = SparkTestBase.tmpDir("planspec-clog")
    val engine = new CdcEngine(spark,
      IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8), EngineConf(buckets = 8))
    engine.applyBatch(0, graft.synth.Synth.events(spark, 400, seed = 14))
    val since = engine.table.currentSnapshotId
    engine.applyBatch(1, graft.synth.Synth.events(spark, 400, seed = 15))
    val p = engine.changelogSince(since).queryExecution.executedPlan.toString
    // pre/post classification is ONE outer join + an explode projection:
    // any nested-loop/cartesian or window here would be a plan regression
    assert(!p.contains("CartesianProduct"), s"cartesian in changelog plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in changelog plan:\n$p")
    assert(!p.contains("Window"), "changelog must not sort through a window")
    assert(p.contains("Generate explode"), s"expected the image explode:\n$p")
  }
}
