package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rel.Rel
import graft.pipeline.{Dedup, Similarity}

/** Physical-plan assertions — the 100-TB design contract, checked at plan
  * level so a regression that silently de-optimizes (a lost pushdown, a
  * broadcast that becomes a shuffle join, an accidental cartesian) fails CI
  * even though results stay correct. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val qe = df.queryExecution
    qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filter + projection push down to the parquet scan (where/project)") {
    val li = Rel.parquet(spark, s"$sf/lineitem.parquet")
    val q = li.where(col("l_quantity") > 40).project("l_orderkey", "l_quantity")
    val f = formatted(q.df)
    // predicate reaches the scan, scan reads ONLY the projected+filtered cols
    assert(f.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"filter not pushed:\n$f")
    val readSchema = f.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity")
      && !readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"column pruning lost:\n$readSchema")
  }

  test("natural join of fact with small dim broadcasts (no shuffle of the dim)") {
    val supplier = Rel.parquet(spark, s"$sf/supplier.parquet")
      .project("s_suppkey", "s_nationkey")
      .rename("s_nationkey" -> "n_nationkey")
    val nation = Rel.parquet(spark, s"$sf/nation.parquet")
      .project("n_nationkey", "n_name")
    val j = supplier.join(nation)
    assert(plan(j.df).contains("BroadcastHashJoin"),
      s"dim join is not broadcast:\n${plan(j.df)}")
  }

  test("composite flagship (q_q10_top): 3-dim natural-join chain " +
    "broadcasts the small dimension, plans no cartesian, pushes both " +
    "filters to their scans, and the grouped fold is partial") {
    val q = Queries.qQ10Top(spark, sf)
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"),
      s"no broadcast join in the chain:\n${p.take(4000)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"composite join chain degenerated to a cartesian:\n${p.take(4000)}")
    val f = formatted(q)
    val pushed = f.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("EqualTo(l_returnflag,R)"),
      s"lineitem returnflag filter not pushed:\n$f")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"),
      s"orders date-window filter not pushed:\n$f")
    // grouped revenue fold combines map-side before the exchange
    assert(p.contains("partial_sum") || f.contains("partial_sum"),
      s"grouped fold is not partial:\n${p.take(4000)}")
    // scans prune: lineitem never reads l_comment-class columns it
    // doesn't use (only the join key, filter and measure columns)
    val liRead = f.linesIterator.filter(_.trim.startsWith("ReadSchema"))
      .find(_.contains("l_extendedprice"))
    assert(liRead.exists(l => !l.contains("l_shipdate") && !l.contains("l_tax")),
      s"lineitem scan over-reads:\n${liRead.getOrElse("<no lineitem scan>")}")
  }

  test("composite flagship #2 (q_while_rollup): the closure joins back " +
    "key-on-key (no cartesian), the rollup aggregates partially, and the " +
    "events scan prunes to the joined+folded columns") {
    val q = Queries.qWhileRollup(spark, sf)
    val p = plan(q)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"closure join-back degenerated to a cartesian:\n${p.take(4000)}")
    val f = formatted(q)
    assert(p.contains("partial_sum") || f.contains("partial_sum"),
      s"rollup fold is not partial:\n${p.take(4000)}")
    // the join-back + fold needs exactly event_id/user_id/event_type/value;
    // props (the widest column) and ts must be pruned out of the scan
    val evRead = f.linesIterator.filter(_.trim.startsWith("ReadSchema"))
      .find(_.contains("event_type"))
    assert(evRead.exists(l => !l.contains("props") && !l.contains("ts")),
      s"events scan over-reads:\n${evRead.getOrElse("<no events scan>")}")
  }

  test("banded minhash dedup never plans a cartesian product") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.minhashPairs(docs)
    val p = plan(pairs)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded join degenerated to all-pairs:\n${p.take(4000)}")
  }

  test("scalar relational path stays in whole-stage codegen (no UDFs)") {
    val li = Rel.parquet(spark, s"$sf/lineitem.parquet")
    val q = Queries.q1Agg(spark, sf)
    // AQE hides codegen stages in executedPlan.toString — ask for the
    // codegen-mode explain, which reports the WholeStageCodegen subtrees
    val cg = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen subtrees"), s"no codegen span:\n${cg.take(2000)}")
    assert(!plan(q).contains("BatchEvalPython") && !plan(li.df).contains("ScalaUDF"),
      "UDF found in the relational hot path")
  }

  test("grouped aggregation is partial (map-side combine before the shuffle)") {
    val q = Queries.q1Agg(spark, sf)
    val p = plan(q)
    // two HashAggregate phases around one Exchange = partial_merge pattern
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2 && p.contains("Exchange"), s"no partial aggregation:\n${p.take(2000)}")
  }

  test("same-key bucketed relvars join with no exchange (co-located join)") {
    val cat = new graft.catalog.Catalog(spark)
    val orders = Rel.parquet(spark, s"$sf/orders.parquet")
      .project("o_orderkey", "o_custkey")
    val lineitem = Rel.parquet(spark, s"$sf/lineitem.parquet")
      .project("l_orderkey", "l_quantity")
      .rename("l_orderkey" -> "o_orderkey")
    cat.defineBucketed("b_orders", orders, Seq("o_orderkey"), 4)
    cat.defineBucketed("b_lineitem", lineitem, Seq("o_orderkey"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = cat.relvar("b_orders").join(cat.relvar("b_lineitem"))
      val p = plan(j.bagDF)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join:\n${p.take(2000)}")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${p.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("ordg plans no single-partition window (two-pass global ordinal)") {
    val q = Queries.qOrdg(spark, sf)
    val wins = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned Window in ordg plan:\n${plan(q).take(3000)}")
  }

  test("lang ungrouped .order(): running folds + offsets plan no single-partition window") {
    // `.order(A1)` with no % group used to lower to Window.orderBy — one
    // global partition. The segmented machinery (graft.rel.Segmented) must
    // keep every window partitioned and resolve offsets via ordinal joins.
    val i = new graft.lang.AndlInterp(spark, "/tmp")
    i.run(
      """R := {{A0:=1, A1:='a'}, {A0:=2, A1:='b'}, {A0:=3, A1:='c'},
        |      {A0:=4, A1:='d'}, {A0:=5, A1:='e'}}
        |res := R .order(A1) .select{A0, N := fold(+,A0), L := lag(A0,1), O := ord()}
        |""".stripMargin, "planspec")
    val df = i.global.lookup("res") match {
      case Some(r: graft.lang.AndlValues.RelV) => r.rel.df
      case other => fail(s"expected an engine relation, got $other")
    }
    assert(df.collect().length === 5)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned Window in lang ungrouped-order plan:\n${plan(df).take(3000)}")
  }

  test("two-phase top-k never concentrates one query's candidates in a window") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val knn = Similarity.bruteForceKnn(q, emb, k = 10)
    val p = plan(knn)
    assert(!p.contains("Window"), s"top-k fell back to a per-query window:\n${p.take(3000)}")
  }

  test("language front end lowers to the same engine plans: script join broadcasts") {
    // a script's natural join must produce the plan the DSL produces —
    // broadcast of the dim side, no cartesian, filters at the scan
    val df = Queries.qLangJoin(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"script join did not broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), s"script join went cartesian:\n${p.take(2000)}")
    val f = formatted(Queries.qLangBasic(spark, sf))
    val pushed = f.linesIterator.find(_.trim.startsWith("PushedFilters")).getOrElse("")
    assert(pushed.contains("n_regionkey"), s"script where not pushed to scan: $pushed")
  }

  test("content-hash sampling is a narrow map: no exchange, filter over the scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sampled = graft.pipeline.Sampling.stratifiedHashSample(docs,
      col("source"), col("doc_id"), Map("src0" -> 1.0, "src1" -> 0.5))
    val p = plan(sampled)
    assert(!p.contains("Exchange"), s"sampling shuffled:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"sampling planned a join:\n${p.take(3000)}")
  }

  test("chunkSplit and intraDocDedup are narrow maps: zero exchanges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p1 = plan(graft.pipeline.Pack.chunkSplit(docs))
    assert(!p1.contains("Exchange"), s"chunkSplit shuffled:\n${p1.take(3000)}")
    val p2 = plan(Dedup.intraDocDedup(docs))
    assert(!p2.contains("Exchange"), s"intraDocDedup shuffled:\n${p2.take(3000)}")
    assert(!p2.contains("Window"), s"intraDocDedup planned a window:\n${p2.take(3000)}")
  }

  test("packGreedy: exactly one exchange (the shard repartition), slim rows only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.Pack.packGreedy(docs))
    assert("Exchange".r.findAllIn(p).size === 1,
      s"packGreedy should shuffle exactly once:\n${p.take(3000)}")
    // the text column must not ride the shuffle — only (id, bucket, tokens)
    val exchangeLine = p.linesIterator.find(_.trim.startsWith("+- Exchange"))
      .orElse(p.linesIterator.find(_.contains("Exchange"))).get
    assert(!exchangeLine.contains("text"), s"text rides the shuffle:\n$exchangeLine")
  }

  test("fuzzy decontamination: eval gram table broadcasts, doc grams never shuffle before the join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val snips = graft.pipeline.Decontaminate.evalSnippets(docs)
    val p = plan(graft.pipeline.Decontaminate.fuzzyContaminated(docs, snips))
    assert(p.contains("BroadcastHashJoin"),
      s"gram join is not broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      s"fuzzy decontamination went cartesian:\n${p.take(3000)}")
  }

  test("decontamination auto-regime: large eval suites Bloom-filter the window stream map-side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val snips = graft.pipeline.Decontaminate.evalSnippets(docs)
    // small regime (default 10MB threshold): plain equi-join, no Bloom probe
    val small = plan(graft.pipeline.Decontaminate.contaminated(docs, snips))
    assert(!small.contains("bloom_contains"),
      "broadcast-regime suite should not pay a Bloom pass")
    // large regime: shrink the broadcast threshold so the same suite counts
    // as over-threshold — contaminated() must route through the Bloom path,
    // with the probe BELOW the join (filtering the exploded window hashes)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try {
      val p = plan(graft.pipeline.Decontaminate.contaminated(docs, snips))
      assert(p.contains("bloom_contains"),
        s"large-suite regime did not Bloom-prefilter:\n${p.take(3000)}")
      val probeIdx = p.indexOf("bloom_contains")
      val joinIdx = math.max(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin"))
      assert(joinIdx < 0 || probeIdx > joinIdx,
        "Bloom probe must sit on the window stream below the join " +
          "(child plans print after their parents)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("semantic dedup: cluster pair join is an equi-join, never all-pairs on the corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Dedup.semanticDedup(emb))
    // the only nested-loop join allowed is the broadcast of the tiny
    // centroid table (nlist rows); the vector-pair join must key on
    // centroid_id (+ salt), i.e. a hash-partitioned equi-join
    assert(!p.contains("CartesianProduct"),
      s"semanticDedup planned a cartesian:\n${p.take(4000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"no equi-join found for the pair stage:\n${p.take(4000)}")
  }

  test("pipeline scans prune to the columns they use (no source/text over-read)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // lmScore touches doc_id + text only — `source` must not reach the scan
    val f1 = formatted(graft.pipeline.TextAnalysis.lmScore(docs))
    val rs1 = f1.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(rs1.nonEmpty && rs1.forall(l => !l.contains("source")),
      s"lmScore reads columns it never uses:\n${rs1.mkString("\n")}")
    // corpus-mix touches source + text only — doc_id must not reach the scan
    val f2 = formatted(Queries.qCorpusMix(spark, sf))
    val rs2 = f2.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(rs2.nonEmpty && rs2.forall(l => !l.contains("doc_id")),
      s"corpus-mix reads columns it never uses:\n${rs2.mkString("\n")}")
  }

  test("grouped top-k (TopK.perGroup) plans no window — two hash aggregations") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.rel.TopK.perGroup(docs, col("source"),
      length(col("text")).cast("double"), col("doc_id"), 5))
    assert(!p.contains("Window"), s"top-k degenerated to a window:\n${p.take(3000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected two-phase aggregation:\n${p.take(3000)}")
  }

  test("lmScore: LM-table joins are equi-joins, count aggregations partial") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.TextAnalysis.lmScore(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lmScore planned an all-pairs join:\n${p.take(3000)}")
    // the bigram table is PINNED (scoring reads the materialized LM
    // artifact, not a re-explode) and the remaining aggregations — c1
    // roll-up and the per-doc score — are map-side combinable
    assert(p.contains("Scan ExistingRDD"),
      s"LM table not pinned:\n${p.take(3000)}")
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2,
      s"LM aggregations not map-side combined:\n${p.take(3000)}")
  }

  test("tfidf: no cartesian, no per-doc window; both aggregations partial") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.TextAnalysis.tfidf(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"tfidf plan wrong:\n${p.take(3000)}")
    // the (doc, term, tf) matrix is PINNED; df derives from it (its own
    // partial aggregation lives in the prepass) and the score join reads
    // the materialized matrix, not a term re-explode
    assert(p.contains("Scan ExistingRDD"),
      s"tf matrix not pinned:\n${p.take(3000)}")
    assert(p.contains("Join"), s"df not joined back:\n${p.take(3000)}")
  }

  test("sessionize: one shuffle on user_id, no window over the event stream") {
    val ev = graft.sources.Sources.nanosTsToMicros(
      spark.read.parquet(s"$sf/events.parquet"))
    val p = plan(graft.streaming.EventStream.sessionize(ev))
    assert(p.contains("MergingSessions") || p.contains("session_window"),
      s"no native session window:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), s"sessionize went cartesian:\n${p.take(3000)}")
  }

  test("top-k phase-1 bounds the merge fan-in to k rows per (query, partition) under skew") {
    import spark.implicits._
    // worst case: ONE query owns every candidate — a per-query window (or a
    // naive groupBy(query)) would buffer all 40k rows in one reducer; the
    // two-phase shape must hand phase 2 at most k·numPartitions rows
    val k = 10
    val scored = (0 until 40000).map(i => (1L, i.toLong, 1.0 / (i + 1)))
      .toDF("q_id", "vec_id", "cosine")
      .repartition(8) // distinct physical input partitions
    val nPart = scored.rdd.getNumPartitions
    val out = Similarity.topK(scored, k, "q_id", "vec_id").collect()
    assert(out.length == k)
    // exact answer despite the skew: global best survives local pruning
    assert(out.map(_.getAs[Long]("vec_id")).toSet == (0L until k.toLong).toSet)
    // the invariant that bounds phase-2 buffers: phase 1 emits ≤ k per
    // (query, partition), so the merge sees ≤ k·P rows for the hot query
    val phase1 = scored.filter(col("cosine").isNotNull)
      .groupBy(col("q_id"), spark_partition_id().as("__pid"))
      .agg(slice(sort_array(collect_list(struct((-col("cosine")).as("nc"),
        col("vec_id").as("c")))), 1, k).as("top"))
      .select(col("q_id"), explode(col("top")))
      .groupBy("q_id").count().collect()
    assert(phase1.forall(_.getAs[Long]("count") <= k.toLong * nPart),
      s"phase-2 fan-in exceeded k*P: ${phase1.mkString(",")}")
  }

  test("dupSpanReport: no all-pairs, no window; fp count aggregation partial") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(Dedup.dupSpanReport(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"dup-span went all-pairs:\n${p.take(3000)}")
    assert(!p.contains("Window"), s"dup-span plans a window:\n${p.take(3000)}")
    // distinct + per-fp count + per-doc rollup all partial around exchanges
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4
      && p.contains("Exchange"), s"no partial aggregation:\n${p.take(3000)}")
  }

  test("embeddingCoherence: partial per-dim mean, no window, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.pipeline.Profile.embeddingCoherence(emb))
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"coherence plan degenerated:\n${p.take(3000)}")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4,
      s"per-dim mean not partial:\n${p.take(3000)}")
  }

  test("approx profile is a single pass (no Expand); exact profile pays the Expand") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val pApx = plan(graft.pipeline.Profile.tableProfileApprox(docs, cols))
    assert(!pApx.contains("Expand"),
      s"sketch profile expands the scan:\n${pApx.take(2000)}")
    // the exact multi-distinct profile DOES expand — the documented cost
    // the approx path exists to avoid at 100 TB
    val pExact = plan(graft.pipeline.Profile.tableProfile(docs, cols))
    assert(pExact.contains("Expand"), s"expected Expand in exact profile")
  }

  test("snapshot diff joins slim fingerprint rows — text never reaches the join") {
    val q = Queries.qCorpusDiff(spark, sf)
    val joinInputs = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.children.map(_.output.map(_.name))
    }.flatten
    assert(joinInputs.nonEmpty)
    assert(joinInputs.forall(out => !out.exists(_.contains("text"))),
      s"text column crossed into the diff join: $joinInputs")
    val p = plan(q)
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"diff plan degenerated:\n${p.take(2000)}")
  }

  test("incremental dedup match plans banded equi-joins only — delta never cross-joins history") {
    val p = plan(Queries.qIncrDedup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental match went all-pairs:\n${p.take(3000)}")
  }

  test("length-band thresholds reach the scan as pushed literal range filters") {
    val f = formatted(Queries.qLengthBand(spark, sf))
    assert(f.contains("GreaterThanOrEqual(n_chars")
      && f.contains("LessThanOrEqual(n_chars"),
      s"band predicate not pushed to the parquet scan:\n$f")
    val readSchema = f.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("text"), s"band scan over-reads:\n$readSchema")
  }

  test("normalizeText and canonicalizeUrl are narrow maps: zero exchanges") {
    val p1 = plan(Queries.qNormalize(spark, sf))
    assert(!p1.contains("Exchange"), s"normalize shuffled:\n${p1.take(3000)}")
    val p2 = plan(Queries.qUrlCanon(spark, sf))
    assert(!p2.contains("Exchange"), s"url canon shuffled:\n${p2.take(3000)}")
  }

  test("whiten apply is a narrow map: k fused dots, zero exchanges") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m = graft.pipeline.Whiten.fit(emb, k = 4)
    val p = plan(graft.pipeline.Whiten(emb, m))
    assert(!p.contains("Exchange"), s"whiten apply shuffled:\n${p.take(3000)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("Invoke"),
      s"whiten apply left codegen:\n${p.take(3000)}")
  }

  test("image/audio near-dup pair joins are banded equi-joins, never all-pairs") {
    import spark.implicits._
    val png = { // one real PNG so the render/hash path has valid bytes
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", b); b.toByteArray
    }
    val assets = graft.pipeline.Multimodal.toAssets(
      Seq((1L, png), (2L, png)).toDF("id", "bytes"), "id", "bytes", "image", "t")
    val p = plan(graft.pipeline.Multimodal.imageNearDup(assets))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"image pair join degenerated to all-pairs:\n${p.take(4000)}")
    // video twin: same pigeonhole blocking over the first-frame dHash
    val vAssets = graft.pipeline.Multimodal.toAssets(
      graft.pipeline.Multimodal.renderTextAvis(
        Seq((1L, "hello"), (2L, "hello")).toDF("doc_id", "p"), "doc_id", "p"),
      "asset_id", "avi", "video", "t")
    val vp = plan(graft.pipeline.Multimodal.videoNearDup(vAssets))
    assert(!vp.contains("CartesianProduct") && !vp.contains("BroadcastNestedLoopJoin"),
      s"video pair join degenerated to all-pairs:\n${vp.take(4000)}")
  }

  test("spanRebuild: owner election partial, fp/doc equi-joins only, no window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(Dedup.spanRebuild(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("Window"), s"spanRebuild plan wrong:\n${p.take(4000)}")
    // the global-first owner election must combine map-side (partial min)
    assert(p.contains("partial_min"), s"owner election not partial:\n${p.take(4000)}")
  }

  test("spanRebuildBytes: same contract — partial owner election, no window, " +
    "no all-pairs; the segment splice stays a narrow map") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(Dedup.spanRebuildBytes(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("Window"), s"spanRebuildBytes plan wrong:\n${p.take(4000)}")
    assert(p.contains("partial_min"), s"owner election not partial:\n${p.take(4000)}")
  }

  test("bm25: query terms broadcast onto the tf stream, ranking is windowless") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val probes = Seq((1L, "spark hash join")).toDF("query_id", "qtext")
    // inspect the scoring plan itself — public bm25 materializes it so the
    // corpus-sized pins can be released, which hides the shape from explain
    val p = plan(graft.pipeline.Retrieval.bm25Lazy(docs, probes, 5,
      1.2, 0.75, "doc_id", "text", "query_id", "qtext")._1)
    assert(p.contains("BroadcastHashJoin"),
      s"query-term filter is not a broadcast:\n${p.take(4000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"bm25 plan wrong:\n${p.take(4000)}")
    assert(p.contains("partial_count"), s"tf not map-side combined:\n${p.take(4000)}")
  }

  test("knScore: KN count tables equi-join back, aggregations partial") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.TextAnalysis.knScore(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"knScore planned an all-pairs join:\n${p.take(3000)}")
    assert("partial_count".r.findAllIn(p).size >= 2,
      s"KN count tables not map-side combined:\n${p.take(3000)}")
  }

  test("dsirWeights: both bucket models broadcast; gram aggregation partial") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the corpus-sized work lives in the ONE doc-bucket prepass — that is
    // where the map-side combine must be
    val pre = plan(graft.pipeline.Selection.docBucketCounts(
      docs, 512, "doc_id", "text"))
    assert(pre.contains("partial_count"),
      s"doc-bucket counts not map-side combined:\n${pre.take(4000)}")
    // the scoring plan reads the PINNED counts (no gram re-explode) and
    // joins two driver-built model tables by broadcast
    val p = plan(graft.pipeline.Selection.dsirWeights(
      docs, docs.filter(col("lang") === "fr")))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"bucket models not broadcast:\n${p.take(4000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"dsir plan wrong:\n${p.take(4000)}")
    assert(!p.contains("Generate"),
      s"scoring pass re-explodes the gram stream:\n${p.take(4000)}")
    assert(p.contains("partial_sum"),
      s"per-doc weight sum not map-side combined:\n${p.take(4000)}")
  }

  test("classifier predict: one narrow pass — no join, no shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = graft.pipeline.Classifier.Model(
      0.1, Map(3 -> 0.5, 17 -> -0.25), buckets = 512)
    val p = plan(graft.pipeline.Classifier.predict(docs, model))
    // scoring is in-row (bucket set + BucketDotSums): any Exchange or
    // join here means the corpus is being re-shuffled per model apply
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"predict is not a narrow pass:\n${p.take(3000)}")
    assert(p.contains("bucket_dot_sums"),
      s"predict not using the fixed-point kernel:\n${p.take(3000)}")
  }

  test("co-bucketed relvar join + same-key aggregation: ZERO Exchange " +
    "(the shuffle was paid once at write time and is reused)") {
    val q = graft.Queries.qBucketedJoin(spark, sf)
    val p = plan(q)
    assert(p.contains("SortMergeJoin"),
      s"bucketed join did not sort-merge:\n${p.take(4000)}")
    assert(!p.contains("Exchange"),
      s"bucketed join/agg shuffled — bucket co-location lost:\n${p.take(4000)}")
  }

  test("q_catalog_lifecycle: the POST-LOAD join over the reopened " +
    "catalog is Exchange-free — the bucketed layout's metadata (and the " +
    "zero-shuffle contract) survives insert, update, save and load") {
    val q = graft.Queries.qCatalogLifecycle(spark, sf)
    val p = plan(q)
    assert(p.contains("SortMergeJoin"),
      s"post-load join did not sort-merge:\n${p.take(4000)}")
    assert(!p.contains("Exchange"),
      s"post-load join/agg shuffled — the attach lost the bucket " +
        s"co-location across the save/load boundary:\n${p.take(4000)}")
  }

  test("repetition signals are ONE narrow scan: no explode, no join, " +
    "no shuffle — the in-row sorted-run pass, not a gram blow-up") {
    val p = plan(graft.Queries.qRepetition(spark, sf))
    assert(!p.contains("Generate") && !p.contains("Join") &&
      !p.contains("Exchange"),
      s"repetition pass not narrow:\n${p.take(3000)}")
  }

  test("skewed-key join: AQE splits the hot partition (skew=true in the " +
    "final adaptive plan) and the skewed result stays correct") {
    // q_skew_join's shape: ~20% of lineitem on ONE key, shuffled join. At
    // production scale the hot partition crosses AQE's default skew
    // thresholds on its own; at test scale we lower them to force the
    // same reaction. The aggregate ABOVE the join reuses the join's
    // partitioning, so AQE (correctly) declines the split there unless
    // forced — the gate therefore checks the join stage itself.
    val confs = Seq(
      // 32 reduce partitions (the bench setting): the hot key's partition
      // is then ~9x the median — unambiguous skew, like production
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2k")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.01"
      // Two test-scale adjustments to reach the production shape AQE
      // reacts to: (a) AQE splits a skewed reduce partition by MAPPER
      // ranges, and a single sf0.01 parquet file is ONE map task — so
      // fan out to 8 mappers; (b) skew detection is BYTE-based, and a
      // hot partition of identical tiny keys compresses ~6x better than
      // its neighbors, hiding a 9x row skew — so carry an incompressible
      // payload column, like the document/text payloads a real skewed
      // pipeline shuffles
      val li = spark.read.parquet(s"$dir/lineitem.parquet").select(
        when(col("l_orderkey") % 5 === 0, lit(1L))
          .otherwise(col("l_orderkey")).as("k"),
        col("l_quantity"),
        md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))).as("payload"))
        .repartition(8)
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
      val joined = li.hint("merge").join(o, "k")
      // collect() executes joined's OWN QueryExecution, so AQE finalizes
      // THIS plan (count() would execute a separate one and leave this
      // plan isFinalPlan=false with no skew markers)
      assert(joined.collect().length > 0)
      val p = plan(joined)
      assert(p.contains("skew=true"),
        s"hot partition not skew-split by AQE:\n${p.take(4000)}")
      // and the full oracle-gated query (join + agg) runs green under the
      // same lowered thresholds — correctness is threshold-independent
      val q = graft.Queries.qSkewJoin(spark, dir)
      val hot = q.where(col("k") === 1).collect()
      assert(hot.length === 1 && hot(0).getAs[Long]("n_li") > 10000L,
        s"hot key missing/underweight: ${hot.toSeq}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("pageRank tiny-rank regime (r18): every iteration's rank rebuild " +
    "broadcasts the node-sized sides — the pinned edge layout is never " +
    "re-sorted or re-shuffled — and the forced shuffled fallback returns " +
    "bit-identical ranks") {
    import spark.implicits._
    val e = (0 until 2000).map(i => (s"s${i % 50}", s"c${i % 211}"))
      .toDF("src", "dst")
    val probe = new graft.rel.Graph.PlanProbe
    val tiny = graft.rel.Graph.pageRank(e, iters = 2, dangling = true,
      planProbe = probe)
    val iterPlans = probe.plans.filter(_._1.startsWith("iteration")).map(_._2)
    assert(iterPlans.size === 2)
    iterPlans.foreach { p =>
      assert(p.contains("BroadcastHashJoin"),
        s"iteration rank rebuild lost its broadcast:\n${p.take(3000)}")
      assert(!p.contains("SortMergeJoin"),
        s"iteration re-sorts the pinned edge layout:\n${p.take(3000)}")
    }
    // above the broadcast bound the joins degrade to the shuffled plans;
    // ranks are exact-long sums, so the result must not move by one bit
    spark.conf.set("spark.graft.graph.broadcastBytes", "1")
    try {
      val full = graft.rel.Graph.pageRank(e, iters = 2, dangling = true)
      assert(tiny.exceptAll(full).count() === 0)
      assert(full.exceptAll(tiny).count() === 0)
    } finally spark.conf.unset("spark.graft.graph.broadcastBytes")
  }

  test("pageRank shuffled fallback (r19): the edge and node layouts are " +
    "re-homed into bucketed scratch tables, so every iteration is " +
    "Exchange-free and Sort-free on those sides — only the node-sized " +
    "rank vector and the narrow contributions move") {
    import spark.implicits._
    val e = (0 until 2000).map(i => (s"s${i % 50}", s"c${i % 211}"))
      .toDF("src", "dst")
    // force the fallback regime AND the at-scale join strategy: at test
    // sizes the planner would auto-broadcast the 2 KB edge table and hide
    // the shuffle shape under test (a 100 TB edge table cannot broadcast)
    val saved = Seq("spark.graft.graph.broadcastBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.graft.graph.broadcastBytes", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = new graft.rel.Graph.PlanProbe
      graft.rel.Graph.pageRank(e, iters = 2, planProbe = probe).count()
      val iterPlans = probe.plans.filter(_._1.startsWith("iteration")).map(_._2)
      assert(iterPlans.size === 2)
      def occurrences(s: String, sub: String): Int =
        s.sliding(sub.length).count(_ == sub)
      iterPlans.foreach { p =>
        // both reused sides read bucketed scans...
        assert(occurrences(p, "SelectedBucketsCount") === 2,
          s"iteration does not read both bucketed layouts:\n${p.take(3000)}")
        // ...and the only exchanges/sorts left are the rank-vector shuffle
        // into the edge join and the contribution aggregation (both
        // node-sized): 2 Exchange + 2 Sort, vs 4 + 4 against the old pins
        assert(occurrences(p, "Exchange (") === 2,
          s"unexpected exchange count (want 2):\n${p.take(3000)}")
        assert(occurrences(p, "Sort (") === 2,
          s"unexpected sort count (want 2 — the bucketed sides must be " +
            s"sort-free):\n${p.take(3000)}")
      }
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("fused per-row expressions stay inside whole-stage codegen (r19): " +
    "none of the native kernels demotes its containing operator, and the " +
    "generated calls compile (codegen fallback disabled) and match the " +
    "interpreted values") {
    import graft.functions._
    val base = spark.range(0, 200).selectExpr("id",
      "concat('doc ', id, ' café 🎯 text body ', id % 7) as s",
      "array(cast(id as string), 'a', 'b', concat('t', id % 5)) as toks",
      "array(cast(id as bigint), id % 13, 42L) as hashes",
      "array(cast(id as float), cast(id % 3 as float)) as vec")
    val bloom = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (0L until 100L).foreach(bf.putLong)
      BloomContains.serialize(bf)
    }
    def proj(df: org.apache.spark.sql.DataFrame) = df.select(
      CharNgramHashes(NfcNormalize(col("s")), 4).as("g"),
      ShingleHashes(col("toks"), 2).as("sh"),
      WindowMd5Hex(col("toks"), 2).as("w"),
      Md5Bucket(col("s"), 512).as("b"),
      SignedGramSums(col("toks"), 8).as("sg"),
      HyperplaneSig(col("vec"), 8, 42L).as("hp"),
      DeflateRatio(col("s")).as("dr"),
      GearChunks(col("s"), 4, 3, 64).as("gc"),
      BloomContains(bloom, col("id")).as("bc"))
    // 1. the Project sits INSIDE a WholeStageCodegen span — rendered with
    // the `*(n)` codegen star; a single CodegenFallback expression would
    // demote it to a bare (unstarred) Project
    val exec = proj(base).queryExecution.executedPlan.toString
    val demoted = exec.linesIterator
      .map(_.trim.stripPrefix("+- ").stripPrefix(":- "))
      .filter(_.startsWith("Project "))
    assert(demoted.isEmpty,
      s"fused-expression Project fell out of whole-stage codegen:\n$exec")
    // 2. the generated code COMPILES — fallback off turns a codegen
    // compile error into a test failure instead of a silent interpreted
    // re-run — and produces the interpreted values bit-for-bit
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val gen = proj(base).collect()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = try proj(base).collect()
      finally spark.conf.unset("spark.sql.codegen.wholeStage")
      assert(gen.toSeq === interp.toSeq)
    } finally saved.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
      spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("connectedComponents distributed tier (r19): every label round's " +
    "neighbor-min join reads the bucketed-by-src edge layout — " +
    "Exchange-free and Sort-free on the edge side") {
    import spark.implicits._
    // a 4000-node chain: worst-case diameter, several doubling rounds
    val pairs = (0L until 4000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = new graft.pipeline.Cluster.PlanProbe
      val out = graft.pipeline.Cluster
        .connectedComponents(pairs, driverEdgeCap = 0, planProbe = probe)
      assert(out.where(col("rep") =!= 0L).count() === 0) // one chain, rep 0
      assert(probe.plans.nonEmpty)
      def occurrences(s: String, sub: String): Int =
        s.sliding(sub.length).count(_ == sub)
      probe.plans.foreach { case (label, p) =>
        // the edge side appears twice in the round's formatted tree (the
        // jump self-joins the stepped frame, duplicating the subtree
        // textually; execution reuses the exchanges) — both reads must
        // come from the bucketed layout
        assert(occurrences(p, "SelectedBucketsCount") === 2,
          s"$label does not read the bucketed edge layout on both " +
            s"branches:\n${p.take(3000)}")
        // remaining exchanges all sit on label-vector (node-sized) sides:
        // ≤ 7 textual Exchange nodes per round vs 9 with the old pinned
        // edge set (whose edge-sized exchange+sort appeared on both
        // branches) — plans/r19/q_cc_dist_{before,after}.txt
        assert(occurrences(p, "Exchange (") <= 7,
          s"$label re-shuffles the edge side:\n${p.take(3000)}")
      }
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
