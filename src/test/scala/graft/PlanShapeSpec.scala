package graft

/** Scale-critical physical-plan properties, asserted so a regression
  * (lost pushdown, dropped broadcast, extra shuffle) fails CI instead
  * of silently multiplying cluster cost. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1: filters reach the parquet scan, aggregation is partial") {
    val p = plan("q1_daily_metrics")
    assert(p.contains("PushedFilters: [IsNotNull"), "filter not pushed to scan")
    assert(p.contains("partial_"), "no map-side partial aggregation")
  }

  test("q2: column pruning excludes the document text from the scan") {
    val p = plan("q2_domain_daily")
    val scanLine = p.linesIterator.find(_.contains("FileScan")).get
    assert(!scanLine.contains("text"), "scan reads the (unused) text column")
  }

  test("q15: dimension join broadcasts, no shuffle of the fact side for it") {
    val p = plan("q15_join_agg_nation")
    assert(p.contains("BroadcastHashJoin"), "nation join not broadcast")
  }

  test("q16: semi join planned as LeftSemi") {
    assert(plan("q16_semi_join").contains("LeftSemi"))
  }

  test("q39: both window sort orders share one partition exchange") {
    val p = plan("q39_window_suite")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // one for the aggregation, one for the shared window partitioning -
    // a third would mean the two sort orders stopped sharing
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
  }

  test("d6: dropped-id set broadcasts into the anti join") {
    val p = plan("d6_embedding_dedup")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "near-dup dedup anti join is not broadcast")
  }

  test("q11: order+limit is TakeOrderedAndProject, not a global sort") {
    assert(plan("q11_order_limit").contains("TakeOrderedAndProject"))
  }

  test("q70: token chunking is embarrassingly parallel - zero exchanges") {
    val p = plan("q70_chunk")
    assert(!p.contains("Exchange"),
      s"chunking must stay narrow (scan -> explode -> project):\n$p")
  }

  test("d11: paragraph dedup shuffles exactly twice (content, then doc)") {
    val p = plan("d11_paragraph_dedup")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // one hash exchange keyed on the paragraph (the rank window), one
    // back on doc_id (reconstruction agg); a third would mean the
    // window and agg stopped sharing / a stray repartition crept in
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
  }

  test("q69: both SCD2 window passes share one (user) partition exchange") {
    val p = plan("q69_scd2")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("hot scan-and-aggregate paths run inside whole-stage codegen") {
    Seq("q1_daily_metrics", "q15_join_agg_nation", "q41_exact_stats")
      .foreach { q =>
        // AQE shows codegen spans only in the FINAL plan - execute first
        val df = SparkEntry.queries(q)(spark, sf)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        // "*(n) Operator" is the codegen-stage marker in plan strings
        assert(p.contains("WholeStageCodegen") || p.contains("*("),
          s"$q lost whole-stage codegen:\n$p")
      }
  }
}
