package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler (not part of the deliverable surface).
  * Pass query names as args to time just those (min-of-2, cold caches),
  * or no args for the full stage breakdown. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions._
    import graft.sources.Tables

    def timed(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def time(name: String)(f: => Unit): Unit =
      println(f"[profile] $name%-30s ${timed(f)}%.3f s")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(Tables.load(spark, sfDir, "documents").groupBy($"lang").count())

    // `abn <names...>`: interleaved all-spread-off vs current — variant A
    // sets Tables.spreadNone (kills table opt-ins AND the media spread),
    // variant B is the shipped configuration. Complements `ab` (which
    // toggles spread ON for everything).
    if (args.headOption.contains("abn")) {
      args.drop(1).foreach { q =>
        val fn = SparkEntry.queries(q)
        var offT = List.empty[Double]; var onT = List.empty[Double]
        for (_ <- 1 to 3) {
          graft.sources.Tables.spreadNone = true
          offT ::= timed(noop(fn(spark, sfDir)))
          graft.sources.Tables.spreadNone = false
          onT ::= timed(noop(fn(spark, sfDir)))
        }
        println(f"[abn] $q%-30s shipped=${onT.min}%.3f s  off=${offT.min}%.3f s  " +
          f"ratio=${onT.min / offT.min}%.2f " +
          f"(shipped ${onT.reverse.map(t => f"$t%.2f").mkString(" ")}; " +
          f"off ${offT.reverse.map(t => f"$t%.2f").mkString(" ")})")
      }
      spark.stop()
      return
    }

    // `cmp <names...>`: interleaved OLD-vs-NEW code comparison — the old
    // (pre-r12) implementation of each changed query is copied verbatim
    // below, and rounds alternate old/new inside ONE JVM (same rationale
    // as `ab`: sequential process-level runs drifted up to 2× on this
    // host with identical code).
    if (args.headOption.contains("cmp")) {
      import org.apache.spark.sql.DataFrame
      import graft.operators.TextAnalysis
      // r12 q43 shape (diff-of-merge), factored so the old q44 can chain it
      def oldQ43(spark: SparkSession, dir: String): DataFrame = {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.types.DoubleType
        import graft.operators.Relational
        val before = Tables.load(spark, dir, "customer")
          .filter($"c_custkey" % 3 =!= 0)
          .select($"c_custkey".as("merge_key"), lit(1).as("in_a"),
            $"c_name".as("a_name"), $"c_mktsegment".as("a_seg"),
            (round($"c_acctbal" * 100).cast("long").cast(DoubleType) / 100)
              .as("a_bal"))
        val after = Relational.q42MergeUpsert(spark, dir)
          .select($"merge_key", lit(1).as("in_b"), $"c_name".as("b_name"),
            $"c_mktsegment".as("b_seg"), $"acctbal".as("b_bal"))
        def rec(op: String, n: Column, s: Column, bal: Column): Column =
          struct(lit(op).as("op"), n.as("c_name"), s.as("c_mktsegment"),
            bal.as("acctbal"))
        val emptyT = "array<struct<op:string,c_name:string," +
          "c_mktsegment:string,acctbal:double>>"
        before.join(after, Seq("merge_key"), "full_outer")
          .select($"merge_key", explode(
            when($"in_a".isNull,
              array(rec("+I", $"b_name", $"b_seg", $"b_bal")))
              .when($"in_b".isNull,
                array(rec("-D", $"a_name", $"a_seg", $"a_bal")))
              .when($"a_name" =!= $"b_name" || $"a_seg" =!= $"b_seg" ||
                $"a_bal" =!= $"b_bal",
                array(rec("-U", $"a_name", $"a_seg", $"a_bal"),
                  rec("+U", $"b_name", $"b_seg", $"b_bal")))
              .otherwise(lit(null).cast(emptyT))).as("r"))
          .select($"merge_key", $"r.op".as("op"), $"r.c_name",
            $"r.c_mktsegment", $"r.acctbal")
          .orderBy($"merge_key",
            when($"op" === "-U", 1).when($"op" === "+U", 2).otherwise(0))
      }
      // r12 prefixSums shape: input relation re-executed per consumer
      // (maxId head + offsets aggregate + per-block window leg)
      def oldPrefixSums(docs: DataFrame): DataFrame = {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.Pipeline
        val maxId = Option(docs.agg(max($"doc_id")).head().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        val blockWidth = maxId / Pipeline.ShardMaxBlocks + 1
        val base = docs
          .withColumn("block", expr(s"doc_id DIV $blockWidth"))
        val wIn = Window.partitionBy($"block").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wBlocks = Window.orderBy($"block")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = base.groupBy($"block")
          .agg(sum($"n_tokens").as("block_total"))
          .select($"block",
            coalesce(sum($"block_total").over(wBlocks), lit(0L))
              .as("block_off"))
        base.join(broadcast(offsets), "block")
          .select(docs.columns.toIndexedSeq.map(col) :+
            (($"block_off" + coalesce(sum($"n_tokens").over(wIn), lit(0L)))
              .as("cum_before")): _*)
      }
      val oldImpl: Map[String, (SparkSession, String) => DataFrame] = Map(
        "p3_token_shards" -> { (spark, dir) =>
          import graft.operators.Pipeline
          oldPrefixSums(Tables.load(spark, dir, "documents")
            .select($"doc_id", size(tokens($"text")).as("n_tokens")))
            .select($"doc_id", $"n_tokens", $"cum_before",
              expr(s"cum_before DIV ${Pipeline.ShardTokenBudget}")
                .as("shard_id"))
            .orderBy($"doc_id")
        },
        "p15_sequence_pack" -> { (spark, dir) =>
          import graft.operators.Pipeline
          oldPrefixSums(Tables.load(spark, dir, "documents")
            .select($"doc_id", size(tokens($"text")).as("n_tokens")))
            .select($"doc_id", $"n_tokens", $"cum_before",
              expr(s"cum_before DIV ${Pipeline.SeqLen}").as("seq_start"),
              expr(s"(cum_before + n_tokens - 1) DIV ${Pipeline.SeqLen}")
                .as("seq_end"),
              expr(s"cum_before % ${Pipeline.SeqLen}").as("seq_offset"))
            .withColumn("n_seqs_spanned", $"seq_end" - $"seq_start" + 1)
            .orderBy($"doc_id")
        },
        "t10_surprisal" -> { (spark, dir) =>
          val tk = Tables.load(spark, dir, "documents")
            .select($"doc_id", explode(tokens($"text")).as("tok"))
          val dt = tk.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
          val vocab = dt.groupBy($"tok").agg(sum($"c").as("cnt"))
          val total = dt.select(sum($"c").as("total"))
          dt.join(vocab, "tok")
            .crossJoin(broadcast(total))
            .withColumn("bits", length(bin(expr("total DIV cnt"))) - 1)
            .groupBy($"doc_id")
            .agg(sum($"c").as("n_tokens"), sum($"c" * $"bits").as("sum_bits"))
            .withColumn("avg_bits",
              $"sum_bits".cast("double") / $"n_tokens")
            .select($"doc_id", $"n_tokens", $"sum_bits", $"avg_bits")
            .orderBy($"doc_id")
        },
        "t11_bigram_surprisal" -> { (spark, dir) =>
          val bg = Tables.load(spark, dir, "documents")
            .select($"doc_id", tokens($"text").as("w"))
            .filter(size($"w") >= 2)
            .select($"doc_id", explode(expr(
              "transform(sequence(1, size(w) - 1), i -> " +
                "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("big"))
          val db = bg.groupBy($"doc_id", $"big").agg(count(lit(1)).as("m"))
          val cb = db.groupBy($"big").agg(sum($"m").as("c2"))
          val ctx = cb.groupBy(split($"big", " ").getItem(0).as("prev"))
            .agg(sum($"c2").as("ctx"))
          val model = cb
            .withColumn("prev", split($"big", " ").getItem(0))
            .join(ctx, "prev")
            .select($"big", (length(bin(expr("ctx DIV c2"))) - 1).as("bits"))
          db.join(model, "big")
            .groupBy($"doc_id")
            .agg(sum($"m").as("n_bigrams"), sum($"m" * $"bits").as("sum_bits"))
            .withColumn("avg_bits", $"sum_bits".cast("double") / $"n_bigrams")
            .select($"doc_id", $"n_bigrams", $"sum_bits", $"avg_bits")
            .orderBy($"doc_id")
        },
        "t14_pmi_collocations" -> { (spark, dir) =>
          import graft.operators.TextAnalysis
          val tk = Tables.load(spark, dir, "documents")
            .select($"doc_id", tokens($"text").as("w"))
          val uni = tk.select(explode($"w").as("tok"))
            .groupBy($"tok").agg(count(lit(1)).as("c1"))
          val tot = uni.agg(sum($"c1").as("t"))
          val cb = tk.filter(size($"w") >= 2)
            .select(explode(expr(
              "transform(sequence(1, size(w) - 1), i -> " +
                "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("big"))
            .groupBy($"big").agg(count(lit(1)).as("c2"))
            .filter($"c2" >= TextAnalysis.PmiMinCount)
          cb.select($"big", $"c2",
              posexplode(split($"big", " ")).as(Seq("pos", "tok")))
            .join(uni.hint("shuffle_hash"), "tok")
            .groupBy($"big", $"c2")
            .agg(max(when($"pos" === 0, $"c1")).as("cx"),
              max(when($"pos" === 1, $"c1")).as("cy"))
            .crossJoin(broadcast(tot))
            .withColumn("pmi_fp",
              expr(s"(c2 * t * ${TextAnalysis.PmiScale}) DIV (cx * cy)"))
            .select($"big", $"c2".as("pair_count"), $"cx", $"cy", $"pmi_fp")
            .orderBy($"pmi_fp".desc, $"big".asc)
            .limit(TextAnalysis.PmiTopK)
        },
        "q45_recursive_depth" -> { (spark, dir) =>
          // r13-old: the r12 cache KEPT (settled) but full-width —
          // isolates this round's column-narrowing delta
          Tables.load(spark, dir, "customer").cache()
            .createOrReplaceTempView("customer_q45_old")
          spark.sql(s"""
            WITH RECURSIVE h (c_custkey, depth) AS (
              SELECT c_custkey, 0 FROM customer_q45_old WHERE c_custkey = 1
              UNION ALL
              SELECT c.c_custkey, h.depth + 1
              FROM customer_q45_old c JOIN h ON c.c_custkey DIV 2 = h.c_custkey
            )
            SELECT h.depth, count(*) AS n_nodes,
                   CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                     / 100 AS total_acctbal
            FROM h JOIN customer_q45_old c ON h.c_custkey = c.c_custkey
            GROUP BY h.depth ORDER BY h.depth""")
        },
        "p34_effective_mixture" -> { (spark, dir) =>
          import graft.operators.{Dedup, Pipeline}
          val docs = Tables.load(spark, dir, "documents")
            .select($"doc_id", $"lang")
          val dropped = Dedup.nearDupPairs(spark, dir)
            .select($"d2".as("doc_id")).distinct()
          val eff = docs.join(dropped, Seq("doc_id"), "left_anti")
          val W = Pipeline.MixtureWeights.map(_._2).sum
          val wdf = Pipeline.MixtureWeights.toDF("lang", "w")
          val rawCnt = docs.groupBy($"lang").agg(count(lit(1)).as("raw_cnt"))
          val effCnt = eff.groupBy($"lang").agg(count(lit(1)).as("c"))
          val joined = rawCnt
            .join(effCnt, Seq("lang"), "left")
            .select($"lang", $"raw_cnt", coalesce($"c", lit(0L)).as("eff_cnt"))
            .join(broadcast(wdf), "lang")
          val totRaw = joined.agg(min(expr(s"(raw_cnt * $W) DIV w")).as("tot_raw"))
          val totEff = joined.agg(min(expr(s"(eff_cnt * $W) DIV w")).as("tot_eff"))
          joined.crossJoin(broadcast(totRaw)).crossJoin(broadcast(totEff))
            .select($"lang", $"raw_cnt", $"eff_cnt",
              expr(s"(tot_raw * w) DIV $W").as("quota_raw"),
              expr(s"(tot_eff * w) DIV $W").as("quota_eff"))
            .orderBy($"lang")
        },
        "d9_edit_verified" -> { (spark, dir) =>
          import graft.operators.Dedup
          val cand = Dedup.jaccardCandidates(spark, dir, Dedup.EditCandJaccard)
            .select($"d1", $"d2")
          val docs = Tables.load(spark, dir, "documents")
            .select($"doc_id", $"text", $"n_chars")
          cand
            .hint("shuffle_hash")
            .join(docs.select($"doc_id".as("d1"), $"text".as("t1"),
              $"n_chars".as("len1")), "d1")
            .hint("shuffle_hash")
            .join(docs.select($"doc_id".as("d2"), $"text".as("t2"),
              $"n_chars".as("len2")), "d2")
            .withColumn("edit_dist",
              levenshtein($"t1", $"t2", Dedup.EditMaxDist))
            .filter($"edit_dist" >= 0 && $"edit_dist" <= Dedup.EditMaxDist)
            .withColumn("edit_sim", lit(1.0) -
              $"edit_dist".cast("double") / greatest($"len1", $"len2"))
            .select($"d1", $"d2", $"edit_dist", $"len1", $"len2", $"edit_sim")
            .orderBy($"d1", $"d2")
        },
        "d15_incremental_dedup" -> { (spark, dir) =>
          import graft.operators.Dedup
          val idx = Dedup.baseIndexModel(spark, dir)
          val baseSizes = idx.groupBy($"doc_id").agg(count(lit(1)).as("n2"))
          val dsh = Tables.load(spark, dir, "documents")
            .filter($"doc_id" % 10 === Dedup.IncrMod)
            .select($"doc_id",
              explode(shingleHashes($"text", Dedup.ShingleN)).as("h"))
            .join(Dedup.baseHotModel(spark, dir), Seq("h"), "left_anti")
          val deltaSizes = dsh.groupBy($"doc_id").agg(count(lit(1)).as("n1"))
          val pairs = dsh.as("d")
            .join(idx.as("b"), $"d.h" === $"b.h")
            .groupBy($"d.doc_id".as("d1"), $"b.doc_id".as("d2"))
            .agg(count(lit(1)).as("shared"))
            .join(deltaSizes.select($"doc_id".as("d1"), $"n1"), "d1")
            .join(baseSizes.select($"doc_id".as("d2"), $"n2"), "d2")
            .withColumn("j",
              $"shared".cast("double") / ($"n1" + $"n2" - $"shared"))
            .filter($"j" >= Dedup.JaccardThreshold)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"d1").orderBy($"j".desc, $"d2".asc)
          val best = pairs
            .withColumn("rk", row_number().over(w))
            .withColumn("nm", count(lit(1)).over(
              org.apache.spark.sql.expressions.Window.partitionBy($"d1")))
            .filter($"rk" === 1)
            .select($"d1", $"nm", $"d2".as("best_base"), $"j".as("best_jaccard"))
          Tables.load(spark, dir, "documents")
            .filter($"doc_id" % 10 === Dedup.IncrMod)
            .select($"doc_id")
            .join(best, $"doc_id" === $"d1", "left_outer")
            .select($"doc_id",
              coalesce($"nm", lit(0L)).as("n_matches"),
              $"best_base", $"best_jaccard",
              $"best_base".isNull.as("admit"))
            .orderBy($"doc_id")
        },
        "d16_longest_dup_span" -> { (spark, dir) =>
          import graft.operators.Dedup
          val pairs = Dedup.jaccardCandidates(spark, dir, Dedup.JaccardThreshold)
            .select($"d1", $"d2")
          val needed = pairs.select($"d1".as("doc_id"))
            .union(pairs.select($"d2".as("doc_id"))).distinct()
          val grams = Tables.load(spark, dir, "documents")
            .join(needed, "doc_id")
            .select($"doc_id",
              posexplode(shingleHashesPos($"text", Dedup.ShingleN))
                .as(Seq("p0", "g")))
            .select($"doc_id", ($"p0" + 1).as("p"), $"g")
          val shared = pairs
            .join(grams.select($"doc_id".as("d1"), $"p".as("p1"), $"g"), "d1")
            .join(grams.select($"doc_id".as("d2"), $"p".as("p2"), $"g"),
              Seq("d2", "g"))
            .select($"d1", $"d2", $"p1", $"p2")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"d1", $"d2", $"diag").orderBy($"p1")
          shared.withColumn("diag", $"p1" - $"p2")
            .withColumn("grp", $"p1" - row_number().over(w))
            .groupBy($"d1", $"d2", $"diag", $"grp")
            .agg(count(lit(1)).as("run"))
            .groupBy($"d1", $"d2")
            .agg((max($"run") + (Dedup.ShingleN - 1)).as("longest_tokens"))
            .orderBy($"d1", $"d2")
        },
        "q43_snapshot_diff" -> (oldQ43 _),
        "v21_cosine_pairs_blocked" -> { (spark, dir) =>
          // r12 shape: shared assign/radius subtrees recomputed per consumer
          graft.operators.Similarity.v21CosinePairsBlocked(spark, dir,
            stageShared = false)
        },
        "q44_incremental_agg" -> { (spark, dir) =>
          // r12 shape verbatim, except deltas chain the OLD q43
          val baseAgg = Tables.load(spark, dir, "customer")
            .filter($"c_custkey" % 3 =!= 0)
            .groupBy($"c_mktsegment")
            .agg(count(lit(1)).as("n0"),
              sum(round($"c_acctbal" * 100).cast("long")).as("c0"))
          val deltas = oldQ43(spark, dir)
            .select($"c_mktsegment",
              when($"op".isin("+I", "+U"), 1L).otherwise(-1L).as("sgn"),
              round($"acctbal" * 100).cast("long").as("cents"))
            .groupBy($"c_mktsegment")
            .agg(sum($"sgn").as("dn"), sum($"sgn" * $"cents").as("dc"))
          baseAgg.join(deltas, Seq("c_mktsegment"), "full_outer")
            .select($"c_mktsegment",
              (coalesce($"n0", lit(0L)) + coalesce($"dn", lit(0L)))
                .as("n_customers"),
              (coalesce($"c0", lit(0L)) + coalesce($"dc", lit(0L)))
                .as("cents"))
            .filter($"n_customers" > 0)
            .select($"c_mktsegment", $"n_customers",
              ($"cents".cast(org.apache.spark.sql.types.DoubleType) / 100)
                .as("total_acctbal"))
            .orderBy($"c_mktsegment")
        },
        "p24_drift_audit" -> { (spark, dir) =>
          // r12 shape: counts (≤ sources×256 rows) recomputed per consumer
          import org.apache.spark.sql.types.DoubleType
          import graft.operators.Pipeline
          def bucketSql(t: String): String =
            s"(instr('0123456789abcdef', substring(md5($t), 1, 1)) - 1) * 16" +
              s" + (instr('0123456789abcdef', substring(md5($t), 2, 1)) - 1)"
          val counts = Tables.load(spark, dir, "documents")
            .select($"source", explode(tokens($"text")).as("token"))
            .withColumn("bucket", expr(bucketSql("token")))
            .groupBy($"source", $"bucket").agg(count(lit(1)).as("o"))
          val ref = counts.filter($"source" === Pipeline.DsirTarget)
            .select($"bucket", $"o".as("r"))
          val refTot = ref.agg(sum($"r").as("n_ref"))
          val srcTot = counts.filter($"source" =!= Pipeline.DsirTarget)
            .groupBy($"source").agg(sum($"o").as("n_src"))
          counts.filter($"source" =!= Pipeline.DsirTarget)
            .join(broadcast(ref), Seq("bucket"), "left")
            .join(broadcast(srcTot), "source")
            .crossJoin(broadcast(refTot))
            .groupBy($"source", $"n_src", $"n_ref")
            .agg(sum(abs($"o" * $"n_ref" - coalesce($"r", lit(0L)) * $"n_src"))
                .as("covered_num"),
              sum(coalesce($"r", lit(0L))).as("covered_r"))
            .select($"source", $"n_src", $"n_ref",
              ($"covered_num" + $"n_src" * ($"n_ref" - $"covered_r"))
                .as("l1_num"))
            .withColumn("tvd", $"l1_num".cast(DoubleType) /
              ($"n_src" * $"n_ref" * 2).cast(DoubleType))
            .orderBy($"source")
        },
        "p28_epoch_plan" -> { (spark, dir) =>
          // r12 shape: per-source aggregate chain re-derived per consumer
          // (5 corpus tokenize passes)
          import org.apache.spark.sql.expressions.Window
          import graft.operators.Pipeline
          val d = Tables.load(spark, dir, "documents")
            .select($"doc_id", $"source",
              size(tokens($"text")).cast("long").as("nt"))
          val s = d.groupBy($"source")
            .agg(count(lit(1)).as("n_docs"), sum($"nt").as("toks"))
          val w = s.withColumn("wt", floor(sqrt($"toks") * lit(1e6)))
          val tot = w.agg(sum($"wt").as("wsum"), sum($"toks").as("b"))
          val tg = w.crossJoin(broadcast(tot))
            .select($"source", $"n_docs", $"toks",
              expr("CAST((CAST(b AS DECIMAL(38,0)) * wt) DIV wsum AS BIGINT)")
                .as("target"))
          val rkW = Window.partitionBy($"source")
            .orderBy(md5(concat(lit(Pipeline.EpochSalt),
              $"doc_id".cast("string"))), $"doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
          val p = d.withColumn("cumb",
              coalesce(sum($"nt").over(rkW), lit(0L)))
            .join(broadcast(tg.select($"source", $"toks".as("stoks"),
              $"target")), "source")
            .filter($"cumb" < $"target" % $"stoks")
            .groupBy($"source")
            .agg(count(lit(1)).as("partial_docs"),
              sum($"nt").as("partial_tokens"))
          tg.join(p, Seq("source"), "left_outer")
            .select($"source", $"n_docs", $"toks".as("tokens_total"),
              $"target".as("target_tokens"),
              expr("target DIV toks").as("full_epochs"),
              ($"target" % $"toks").as("rem_tokens"),
              coalesce($"partial_docs", lit(0L)).as("partial_docs"),
              coalesce($"partial_tokens", lit(0L)).as("partial_tokens"))
            .orderBy($"source")
        },
        "v26_hybrid_rrf" -> { (spark, dir) =>
          // r12 shape: idx recomputed per consumer (3 corpus explodes)
          import graft.functions.VectorFunctions.{asDouble, cosine}
          import graft.operators.Similarity
          val emb = Tables.load(spark, dir, "embeddings")
            .select($"vec_id", asDouble($"embedding").as("v"))
          val queries = emb.filter($"vec_id" < Similarity.QueryCount)
            .select($"vec_id".as("query_id"), $"v".as("qv"))
          val dense = emb
            .join(broadcast(queries), $"vec_id" =!= $"query_id")
            .select($"query_id", $"vec_id", cosine($"qv", $"v").as("cos"))
            .groupBy($"query_id")
            .agg(graft.plans.TopKAggregate
              .topK($"cos", $"vec_id", Similarity.FuseDepth).as("top"))
            .select($"query_id", posexplode($"top"))
            .select($"query_id", $"col.id".as("id"),
              ($"pos" + 1).cast("long").as("rd"))
          val toks = Tables.load(spark, dir, "documents")
            .select($"doc_id",
              explode(array_distinct(split($"text", " "))).as("tok"))
          val kept = toks.groupBy($"tok").agg(count(lit(1)).as("df"))
            .filter($"df" <= Similarity.HybridDfCap).select($"tok")
          val idx = toks.join(kept, "tok")
          val qtok = idx.filter($"doc_id" < Similarity.QueryCount)
            .select($"doc_id".as("query_id"), $"tok")
          val overlap = qtok
            .join(idx.withColumnRenamed("doc_id", "id"), "tok")
            .filter($"id" =!= $"query_id")
            .groupBy($"query_id", $"id")
            .agg(count(lit(1)).as("shared"))
          val lex = overlap
            .groupBy($"query_id")
            .agg(graft.plans.TopKAggregate
              .topK($"shared".cast("double"), $"id",
                Similarity.FuseDepth).as("top"))
            .select($"query_id", posexplode($"top"))
            .select($"query_id", $"col.id".as("id"),
              ($"pos" + 1).cast("long").as("rl"))
          val fused = dense.join(lex, Seq("query_id", "id"), "full_outer")
            .select($"query_id", $"id".as("doc_id"),
              (coalesce(expr(s"${Similarity.RrfScale} DIV " +
                s"(${Similarity.RrfConst} + rd)"), lit(0L)) +
                coalesce(expr(s"${Similarity.RrfScale} DIV " +
                  s"(${Similarity.RrfConst} + rl)"), lit(0L)))
                .as("rrf"))
          fused
            .groupBy($"query_id")
            .agg(graft.plans.TopKAggregate
              .topK($"rrf".cast("double"), $"doc_id", Similarity.K)
              .as("top"))
            .select($"query_id", posexplode($"top"))
            .select($"query_id", ($"pos" + 1).cast("int").as("rk"),
              $"col.id".as("doc_id"), $"col.score".cast("long")
                .as("rrf_score"))
            .orderBy($"query_id", $"rk")
        },
        "p14_bloom_contamination" -> { (spark, dir) =>
          // r12 shape: distinct before the bit build + the 6-conjunct
          // probe with the 16384-long bit array INLINE as a literal per
          // conjunct (~1.5 MB expression tree)
          import org.apache.spark.sql.Column
          import graft.operators.Pipeline
          val m = Pipeline.BloomTwinBits
          def positions(s: Column): Seq[Column] = {
            val h1 = s % lit(m)
            val step = (s / lit(1L << 20)).cast("long") * 2 + 1
            (0 until Pipeline.BloomTwinK).map(j => (h1 + step * j) % lit(m))
          }
          val bench = Tables.load(spark, dir, "documents")
            .filter($"source" === Pipeline.BenchmarkSource)
            .select(explode(graft.plans.VectorExpressions
              .md5SpanHashes($"text", Pipeline.ContamN)).as("s"))
            .distinct()
          import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
          def shl(v: Column, amount: Column): Column = column(
            org.apache.spark.sql.catalyst.expressions.ShiftLeft(
              expression(v), expression(amount)))
          def shr(v: Column, amount: Column): Column = column(
            org.apache.spark.sql.catalyst.expressions.ShiftRight(
              expression(v), expression(amount)))
          val words = bench
            .select(explode(array(positions($"s"): _*)).as("pos"))
            .select(($"pos" / 64).cast("int").as("word"),
              shl(lit(1L), ($"pos" % 64).cast("int")).as("b"))
            .groupBy($"word").agg(bit_or($"b").as("bits"))
            .collect()
          val bits = new Array[Long]((m / 64).toInt)
          words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
          val bitsLit = lit(bits)
          val hit = positions($"s").map { p =>
            val word = (p / 64).cast("int") + 1
            shr(element_at(bitsLit, word), (p % 64).cast("int"))
              .bitwiseAND(lit(1L)) === lit(1L)
          }.reduce(_ && _)
          Tables.load(spark, dir, "documents")
            .filter($"source" =!= Pipeline.BenchmarkSource)
            .select($"doc_id", explode(graft.plans.VectorExpressions
              .md5SpanHashes($"text", Pipeline.ContamN)).as("s"))
            .filter(hit)
            .groupBy($"doc_id")
            .agg(countDistinct($"s").as("n_hit_ngrams"))
            .orderBy($"doc_id")
        },
        "d14_span_removal" -> { (spark, dir) =>
          // r12 shape: dup grams via distinct(doc,g) -> per-g count -> re-join
          // onto a SECOND corpus gram explode (2 shingle_hashes Generates)
          import graft.operators.Dedup
          val docs = Tables.load(spark, dir, "documents")
            .select($"doc_id", tokens($"text").as("w"))
          val grams = Tables.load(spark, dir, "documents")
            .select($"doc_id",
              posexplode(shingleHashesPos($"text", Dedup.ShingleN))
                .as(Seq("p0", "g")))
            .select($"doc_id", ($"p0" + 1).as("start"), $"g")
          val dupGrams = grams.select($"doc_id", $"g").distinct()
            .groupBy($"g").agg(count(lit(1)).as("n_docs"))
            .filter($"n_docs" >= 2)
            .select($"g")
          val covered = grams.join(dupGrams, "g")
            .select($"doc_id",
              explode(sequence($"start", $"start" + (Dedup.ShingleN - 1)))
                .as("pos"))
            .groupBy($"doc_id")
            .agg(collect_set($"pos".cast("long")).as("cut"))
          docs.join(covered, Seq("doc_id"), "left")
            .select($"doc_id", size($"w").as("n_tokens"),
              graft.plans.VectorExpressions.filterPositions($"w",
                coalesce($"cut", expr("CAST(array() AS array<bigint>)")))
                .as("kept"))
            .select($"doc_id", $"n_tokens",
              size($"kept").cast("long").as("n_kept"),
              ($"n_tokens" - size($"kept")).cast("long").as("n_removed"),
              md5(concat_ws(" ", $"kept")).as("cleaned_digest"))
            .orderBy($"doc_id")
        },
        "p29_full_prep" -> { (spark, dir) =>
          // r13-old: the r12 staged `joined` KEPT (that change is settled)
          // but prefixSums unstaged — isolates this round's delta
          import graft.operators.Pipeline
          val kept = Pipeline.p13QualityFilter(spark, dir)
            .filter($"keep")
            .select($"doc_id", $"n_tokens".cast("long").as("n_tokens"))
          val docs = Tables.load(spark, dir, "documents")
            .select($"doc_id", $"lang", md5($"text").as("tk"))
          val joined = graft.sources.Tables.stage(docs.join(kept, "doc_id"))
          val firstPerText = joined.groupBy($"tk").agg(min($"doc_id").as("keep_id"))
          val deduped = joined
            .join(firstPerText, joined("doc_id") === firstPerText("keep_id"))
            .select($"doc_id", $"lang", $"n_tokens")
          val sampled = deduped.filter(Pipeline.samplePredicate)
          oldPrefixSums(sampled.select($"doc_id", $"n_tokens", $"lang"))
            .select($"doc_id", $"lang", $"n_tokens",
              expr(s"cum_before DIV ${Pipeline.SeqLen}").as("seq_start"),
              expr(s"cum_before % ${Pipeline.SeqLen}").as("seq_offset"),
              expr(s"(cum_before + n_tokens - 1) DIV ${Pipeline.SeqLen}").as("seq_end"))
            .orderBy($"doc_id")
        })
      args.drop(1).foreach { q =>
        val newFn = SparkEntry.queries(q)
        val oldFn = oldImpl(q)
        var oldT = List.empty[Double]; var newT = List.empty[Double]
        for (_ <- 1 to 3) {
          oldT ::= timed(noop(oldFn(spark, sfDir)))
          newT ::= timed(noop(newFn(spark, sfDir)))
        }
        println(f"[cmp] $q%-30s new=${newT.min}%.3f s  old=${oldT.min}%.3f s  " +
          f"ratio=${newT.min / oldT.min}%.2f " +
          f"(new ${newT.reverse.map(t => f"$t%.2f").mkString(" ")}; " +
          f"old ${oldT.reverse.map(t => f"$t%.2f").mkString(" ")})")
      }
      spark.stop()
      return
    }

    // `ab <names...>`: interleaved spread-on/spread-off A/B — rounds
    // alternate variants inside ONE JVM so host drift hits both equally;
    // reports min-of-3 per variant. The only trustworthy comparison on a
    // noisy host (sequential full-process runs drifted 1.7→4.6 s on
    // identical code while building r12).
    if (args.headOption.contains("ab")) {
      // demo1 loads its `user` view UNSPREAD by design (seeded RAND(42)
      // draws per (partition, row-offset)); forcing spreadAll on it would
      // compare timings of non-identical work (ADVICE r12) — skip it.
      val abNames = (if (args.length > 1) args.drop(1).toSeq
                     else SparkEntry.queries.keys.toSeq.sorted)
        .filterNot(_ == "demo1_user_locations")
      abNames.foreach { q =>
        val fn = SparkEntry.queries(q)
        val times = scala.collection.mutable.Map(
          true -> List.empty[Double], false -> List.empty[Double])
        for (_ <- 1 to 3; spreadOn <- Seq(false, true)) {
          graft.sources.Tables.spreadAll = spreadOn
          times(spreadOn) ::= timed(noop(fn(spark, sfDir)))
        }
        graft.sources.Tables.spreadAll = false
        println(f"[ab] $q%-30s spread=${times(true).min}%.3f s  " +
          f"base=${times(false).min}%.3f s  " +
          f"ratio=${times(true).min / times(false).min}%.2f " +
          f"(spread runs ${times(true).reverse.map(t => f"$t%.2f").mkString(" ")}; " +
          f"base runs ${times(false).reverse.map(t => f"$t%.2f").mkString(" ")})")
      }
      spark.stop()
      return
    }

    // `explain <suffix> [names...]`: dump .explain("formatted") of the named
    // registry queries (or every query with no names) to
    // plans/r13/<name>_<suffix>.txt — the optimization round's plan-shape
    // evidence (Exchange count, join strategy, PushedFilters/ReadSchema).
    if (args.headOption.contains("explain")) {
      val suffix = args.lift(1).getOrElse("before")
      // "-nospread" suffix variants disable every input spread so the
      // pre-spread plan of spread-only queries can be dumped from the
      // current tree (their only delta IS the spread exchange)
      if (suffix.endsWith("nospread")) graft.sources.Tables.spreadNone = true
      val names = if (args.length > 2) args.drop(2).toSeq
                  else SparkEntry.queries.keys.toSeq.sorted
      val outDir = java.nio.file.Paths.get("plans", "r13")
      java.nio.file.Files.createDirectories(outDir)
      names.foreach { q =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote ${q}_$suffix.txt " +
          s"(${txt.linesIterator.count(_.contains("Exchange"))} exchange lines)")
      }
      spark.stop()
      return
    }

    // `floor <names...>`: decompose the fixed per-query overhead of the
    // long-tail queries (~100 registry rows sit at 0.2–0.5 s regardless of
    // SF — VERDICT r12 item #4). For each query, separately time
    //   build    — registry fn call + analysis (logical plan ready)
    //   plan     — executedPlan force (optimizer + physical planning +
    //              any eager stage()/collect work the builder runs)
    //   run1/2/3 — the noop action, with job/stage counts from a listener
    // so the floor can be attributed to planning vs codegen vs job count.
    if (args.headOption.contains("floor")) {
      val names = if (args.length > 1) args.drop(1).toSeq
                  else Seq("q6_group_count", "q4_casewhen_buckets",
                    "t6_length_percentiles", "v22_range_search",
                    "p5_vocab_topk", "d1_dedup_exact", "m3_media_catalog")
      @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs += 1; stages += j.stageInfos.size
          tasks += j.stageInfos.map(_.numTasks).sum
        }
      }
      spark.sparkContext.addSparkListener(listener)
      names.foreach { q =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val t2 = System.nanoTime()
        jobs = 0; stages = 0; tasks = 0
        val runs = (1 to 3).map { _ =>
          val r0 = System.nanoTime()
          noop(df)
          (System.nanoTime() - r0) / 1e9
        }
        Thread.sleep(200) // let the async listener bus drain the job events
        // what Bench actually times: a FRESH fn() call per run (build +
        // analysis + optimization + codegen cache lookup + jobs)
        val full = (1 to 3).map { _ =>
          val r0 = System.nanoTime()
          noop(SparkEntry.queries(q)(spark, sfDir))
          (System.nanoTime() - r0) / 1e9
        }
        println(f"[floor] $q%-26s build=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f " +
          f"action=${runs.map(t => f"$t%.3f").mkString("/")} " +
          f"fresh=${full.map(t => f"$t%.3f").mkString("/")} " +
          f"(3 actions: jobs=$jobs stages=$stages tasks=$tasks)")
      }
      spark.stop()
      return
    }

    // `jobs <query>`: print every job one noop action of the query
    // launches (stages, task counts, first stage name) — attributes the
    // long-tail floor to specific job launches.
    if (args.headOption.contains("jobs")) {
      val q = args(1)
      val df = SparkEntry.queries(q)(spark, sfDir)
      noop(df) // warm: codegen + file listing out of the way
      val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val s = j.stageInfos
          log.add(f"job ${j.jobId}%3d stages=${s.size} " +
            f"tasks=${s.map(_.numTasks).sum} " +
            s"[${s.map(i => i.name.takeWhile(_ != '\n')).mkString(" | ")}]")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      noop(SparkEntry.queries(q)(spark, sfDir))
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobs] $q action=$el%.3f s, jobs:")
      log.forEach(l => println(s"  $l"))
      spark.stop()
      return
    }

    // `d5probe [n]`: measure SimHash candidate-pair counts under the old
    // single-byte-band scheme vs the band-pair scheme on n synthetic
    // near-unique docs (uniform sigs = the random-collision regime the
    // band-pair change targets; the fixture's dup families mask it).
    // `v3probe`: occupancy distribution + candidate-pair mass of v3's
    // banding at the given SF dir — where does the near-boundary scaling
    // ratio actually come from (mega-buckets vs medium-bucket mass)?
    if (args.headOption.contains("v3probe")) {
      import graft.functions.VectorFunctions._
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select($"vec_id", asDouble($"embedding").as("v"))
      val n = emb.count()
      val bits = graft.operators.Similarity.adaptiveLshBits(n)
      println(s"[v3probe] n=$n bits=$bits")
      val bands = 8
      val sig = graft.operators.Similarity.lshSignatureProbe($"v", 64, bands * bits)
      val banded = emb.withColumn("sig", sig)
        .select($"vec_id", explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright($"sig", b * bits)
              .bitwiseAND(lit((1L << bits) - 1)).as("bucket"))
        }: _*)).as("bb"))
        .select($"vec_id", $"bb.band", $"bb.bucket")
      val occ = banded.groupBy($"band", $"bucket").count()
      occ.selectExpr("max(count) mx", "avg(count) av",
          "percentile(count, 0.99) p99", "count(1) nbuckets",
          "sum(count * (count - 1) / 2) pairs",
          s"sum(CASE WHEN count > ${graft.operators.Similarity.LshBucketCap} " +
            "THEN count * (count - 1) / 2 ELSE 0 END) hot_pairs")
        .show(false)
      occ.orderBy($"count".desc).show(10, false)
      // stage costs: signature computation alone, at both widths
      Seq(32, 64).foreach { planes =>
        time(s"signature x$planes") {
          noop(emb.withColumn("sig",
            graft.operators.Similarity.lshSignatureProbe($"v", 64, planes))
            .select($"vec_id", $"sig"))
        }
      }
      time("full v3") {
        noop(graft.operators.Similarity.v3AnnLsh(spark, sfDir))
      }
      time("v18 binaryCodes") {
        noop(graft.operators.Similarity.binaryCodes(spark, sfDir))
      }
      time("full v18") {
        noop(graft.operators.Similarity.v18AnnBinary(spark, sfDir))
      }
      spark.stop(); return
    }

    if (args.headOption.contains("d5probe")) {
      import graft.plans.VectorExpressions.simhash64
      val n = args.lift(1).map(_.toInt).getOrElse(50000)
      val docs = spark.range(n).select($"id".as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(50)),
          i => concat(lit("w"),
            pmod(xxhash64($"id" * 100 + i), lit(5000))))).as("text"))
      val sigs = docs.select($"doc_id",
        simhash64(split($"text", " ")).as("sig")).cache()
      sigs.count()
      def candidates(keys: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)]): Long = {
        val banded = sigs.select($"doc_id",
          explode(array(keys.map { case (band, bucket) =>
            struct(band.as("band"), bucket.as("bucket"))
          }: _*)).as("bb"))
          .select($"doc_id", $"bb.band", $"bb.bucket")
        banded.as("a").join(banded.as("b"),
          $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
            $"a.doc_id" < $"b.doc_id").count()
      }
      val single = candidates((0 until 8).map(b =>
        (lit(b), shiftright($"sig", b * 8).bitwiseAND(lit(0xffL)))))
      val pairs = candidates(for (i <- 0 until 8; j <- i + 1 until 8) yield
        (lit(i * 8 + j), shiftright($"sig", i * 8).bitwiseAND(lit(0xffL))
          .multiply(256).plus(shiftright($"sig", j * 8).bitwiseAND(lit(0xffL)))))
      println(s"[probe] n=$n single_band_candidates=$single " +
        s"band_pair_candidates=$pairs ratio=${single.toDouble / math.max(pairs, 1)}")
      spark.stop()
      return
    }

    // `annprobe`: time the model-consuming ANN family twice — the first
    // run pays any cold-store fit (+persist), the second consumes the
    // persisted model (the production steady state the bench reflects).
    if (args.headOption.contains("annprobe")) {
      for (name <- Seq("v4_ann_ivf", "v8_semantic_dedup", "v10_ann_pq",
                       "v15_ann_ivfpq")) {
        val q = SparkEntry.queries(name)
        val t1 = timed(noop(q(spark, sfDir)))
        val t2 = timed(noop(q(spark, sfDir)))
        println(f"[probe] $name%-18s first=$t1%.3f s (store fit or hit) " +
          f"second=$t2%.3f s (store hit)")
      }
      spark.stop()
      return
    }

    // `v15recall`: v15 recall@K vs the exact v1 top-k across nprobe —
    // the tuning curve behind the recall-spec floor.
    if (args.headOption.contains("v15recall")) {
      import graft.operators.Similarity
      val exact = Similarity.v1AnnTopK(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for (np <- Seq(4, 5, 6, 7, 8, 10)) {
        val got = Similarity.v15AnnIvfPq(spark, sfDir, nprobe = np)
          .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        val rs = exact.map { case (q, ids) =>
          got.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
        }
        println(f"[probe] v15 nprobe=$np%2d recall=${rs.sum / rs.size}%.3f")
      }
      spark.stop()
      return
    }

    // `skewprobe [n]`: MEASURE the claim the dedup/text scaladocs lean on
    // — that AQE's skew-join splits a hot probe key across tasks where a
    // window partition cannot be split. Builds an n-row fact table where
    // ONE key owns half the rows, joins it to a per-key dimension (the
    // d8/t10 re-attach shape), and reports the max task input size with
    // AQE skew handling on vs off, plus the unsplittable hot-partition
    // size a count-over-window would be stuck with.
    if (args.headOption.contains("skewprobe")) {
      val n = args.lift(1).map(_.toInt).getOrElse(4000000)
      // key 0 owns half the rows; the rest spread over 100k keys
      val fact = spark.range(n).select(
        when($"id" % 2 === 0, 0L)
          .otherwise(pmod(xxhash64($"id"), lit(100000L))).as("k"),
        $"id".as("payload"))
      val dim = spark.range(100001).select($"id".as("k"),
        lit(1L).as("cnt"))
      def maxPartRows(skewJoin: Boolean): (Long, Boolean) = {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val joined = fact.hint("merge").join(dim, "k")
          val counts = joined
            .mapPartitions(it => Iterator.single(it.size.toLong))(
              org.apache.spark.sql.Encoders.scalaLong)
          val mx = counts.collect().max
          (mx, counts.queryExecution.executedPlan.toString.contains("skew"))
        } finally {
          spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
          spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
          spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
          spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
      }
      val (without, _) = maxPartRows(skewJoin = false)
      val (withAqe, marked) = maxPartRows(skewJoin = true)
      println(s"[probe] n=$n hot_key_rows=${n / 2} " +
        s"max_task_rows_no_skewjoin=$without max_task_rows_aqe=$withAqe " +
        s"split=${without.toDouble / math.max(withAqe, 1)}x skew_marked=$marked " +
        "(a count-over-window would always be the no-skewjoin number)")
      spark.stop()
      return
    }

    // `d3alt`: compare the d3 candidate pipeline's pair generation — the
    // current posting self-join (rsh ⋈ rsh on h) vs a posting-LIST form
    // (groupBy(h) + collect_list + explode of the C(df,2) in-list pairs,
    // df bounded by the cap). Same output; the question is shuffle count
    // vs explode cost.
    if (args.headOption.contains("d3alt")) {
      import graft.operators.Dedup
      val maxDf = 20 // mirrors Dedup.MaxShingleDf at measurement time
      val sh = Tables.load(spark, sfDir, "documents")
        .select($"doc_id", explode(shingleHashes($"text", 3)).as("h"))
      def selfJoin(): org.apache.spark.sql.DataFrame = {
        val rare = sh.groupBy($"h").agg(count(lit(1)).as("df"))
          .filter($"df" <= maxDf && $"df" >= 2).select($"h")
        val rsh = sh.join(rare, "h")
        rsh.as("a").join(rsh.as("b"),
            $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
          .agg(count(lit(1)).as("shared"))
      }
      def postingList(): org.apache.spark.sql.DataFrame = {
        val lists = sh.groupBy($"h")
          .agg(sort_array(collect_list($"doc_id")).as("ds"))
          .filter(size($"ds").between(2, maxDf))
        lists
          .select(explode(expr(
            """flatten(transform(ds, (x, i) ->
              |  transform(slice(ds, i + 2, size(ds) - i - 1),
              |            y -> struct(x AS d1, y AS d2))))""".stripMargin))
            .as("p"))
          .groupBy($"p.d1".as("d1"), $"p.d2".as("d2"))
          .agg(count(lit(1)).as("shared"))
      }
      for (r <- 1 to 2) {
        time(s"self-join pairs (run $r)")(noop(selfJoin()))
        time(s"posting-list pairs (run $r)")(noop(postingList()))
      }
      val a = selfJoin().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = postingList().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      println(s"[probe] equal=${a == b} pairs=${a.size} (cap=$maxDf, " +
        s"registry cap=${Dedup.MaxShingleDf})")
      spark.stop()
      return
    }

    // `p14probe`: stage breakdown of the bloom contamination twin — the
    // bench-side bit-array build (explode + distinct + positions + bit_or
    // + collect, runs at CONSTRUCTION time) vs the corpus-side probe scan
    // (md5 span hashes + k codegen probes + per-doc distinct count).
    if (args.headOption.contains("p14probe")) {
      import graft.operators.Pipeline
      for (_ <- 1 to 2) {
        time("bench-side build (to collect)") {
          val m = Pipeline.BloomTwinBits
          val bench = Tables.load(spark, sfDir, "documents")
            .filter($"source" === Pipeline.BenchmarkSource)
            .select(explode(graft.plans.VectorExpressions
              .md5SpanHashes($"text", Pipeline.ContamN)).as("s"))
            .distinct()
          val h1 = $"s" % lit(m)
          val step = ($"s" / lit(1L << 20)).cast("long") * 2 + 1
          val words = bench
            .select(explode(array((0 until Pipeline.BloomTwinK).map(j =>
              (h1 + step * j) % lit(m)): _*)).as("pos"))
            .select(($"pos" / 64).cast("int").as("word"))
            .groupBy($"word").agg(count(lit(1)).as("n"))
          words.collect()
        }
        time("corpus md5 explode only") {
          noop(Tables.load(spark, sfDir, "documents")
            .filter($"source" =!= Pipeline.BenchmarkSource)
            .select($"doc_id", explode(graft.plans.VectorExpressions
              .md5SpanHashes($"text", Pipeline.ContamN)).as("s")))
        }
        time("full p14 (registry)") {
          noop(SparkEntry.queries("p14_bloom_contamination")(spark, sfDir))
        }
        // probe+agg with a PREBUILT bit array: isolates the corpus-side
        // filter/countDistinct from the construction-time build job
        locally {
          import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
          val m = Pipeline.BloomTwinBits
          def positions(s: org.apache.spark.sql.Column) = {
            val h1 = s % lit(m)
            val step = (s / lit(1L << 20)).cast("long") * 2 + 1
            (0 until Pipeline.BloomTwinK).map(j => (h1 + step * j) % lit(m))
          }
          def shr(v: org.apache.spark.sql.Column,
                  amount: org.apache.spark.sql.Column) = column(
            org.apache.spark.sql.catalyst.expressions.ShiftRight(
              expression(v), expression(amount)))
          val bits = new Array[Long]((m / 64).toInt) // empty: zero hits,
          // upper-bounds the probe cost (every gram evaluates all 6 probes
          // only until the first zero bit — an EMPTY filter SHORTS at probe
          // 1, so also time an ALL-ONES filter: every gram runs all 6 and
          // survives to the aggregate)
          val bitsLit = lit(bits)
          val ones = lit(Array.fill((m / 64).toInt)(-1L))
          for ((bl, tag) <- Seq((bitsLit, "empty"), (ones, "all-ones"))) {
            val hit = positions($"s").map { p =>
              val word = (p / 64).cast("int") + 1
              shr(element_at(bl, word), (p % 64).cast("int"))
                .bitwiseAND(lit(1L)) === lit(1L)
            }.reduce(_ && _)
            time(s"corpus probe+agg ($tag bits)") {
              noop(Tables.load(spark, sfDir, "documents")
                .filter($"source" =!= Pipeline.BenchmarkSource)
                .select($"doc_id", explode(graft.plans.VectorExpressions
                  .md5SpanHashes($"text", Pipeline.ContamN)).as("s"))
                .filter(hit)
                .groupBy($"doc_id")
                .agg(countDistinct($"s").as("n_hit_ngrams"))
                .orderBy($"doc_id"))
            }
          }
        }
      }
      spark.stop()
      return
    }

    // `t14probe`: stage breakdown of the PMI collocation query — where
    // does the time go (unigram agg, bigram agg+floor, the two unigram
    // re-attach joins + ranking)?
    if (args.headOption.contains("t14probe")) {
      import graft.operators.TextAnalysis
      val tk = Tables.load(spark, sfDir, "documents")
        .select($"doc_id", tokens($"text").as("w"))
      for (_ <- 1 to 2) {
        time("uni: explode+groupBy") {
          noop(tk.select(explode($"w").as("tok"))
            .groupBy($"tok").agg(count(lit(1)).as("c1")))
        }
        time("cb: bigrams+groupBy+floor") {
          noop(tk.filter(size($"w") >= 2)
            .select(explode(expr(
              "transform(sequence(1, size(w) - 1), i -> " +
                "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("big"))
            .groupBy($"big").agg(count(lit(1)).as("c2"))
            .filter($"c2" >= TextAnalysis.PmiMinCount))
        }
        time("full t14 (registry)") {
          noop(SparkEntry.queries("t14_pmi_collocations")(spark, sfDir))
        }
        time("t14 alt: melt, ONE uni join") {
          val uni = tk.select(explode($"w").as("tok"))
            .groupBy($"tok").agg(count(lit(1)).as("c1"))
          val tot = uni.agg(sum($"c1").as("t"))
          val cb = tk.filter(size($"w") >= 2)
            .select(explode(expr(
              "transform(sequence(1, size(w) - 1), i -> " +
                "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("big"))
            .groupBy($"big").agg(count(lit(1)).as("c2"))
            .filter($"c2" >= TextAnalysis.PmiMinCount)
          val melted = cb
            .select($"big", $"c2", posexplode(split($"big", " "))
              .as(Seq("pos", "tok")))
          val re = melted
            .join(uni.hint("shuffle_hash"), "tok")
            .groupBy($"big", $"c2")
            .agg(max(when($"pos" === 0, $"c1")).as("cx"),
              max(when($"pos" === 1, $"c1")).as("cy"))
          noop(re.crossJoin(broadcast(tot))
            .withColumn("pmi_fp",
              expr(s"(c2 * t * ${TextAnalysis.PmiScale}) DIV (cx * cy)"))
            .select($"big", $"c2".as("pair_count"), $"cx", $"cy", $"pmi_fp")
            .orderBy($"pmi_fp".desc, $"big".asc)
            .limit(TextAnalysis.PmiTopK))
        }
      }
      spark.stop()
      return
    }

    // `t11probe`: stage breakdown of bigram surprisal.
    if (args.headOption.contains("t11probe")) {
      val tk = Tables.load(spark, sfDir, "documents")
        .select($"doc_id", tokens($"text").as("w"))
      val bg = tk.filter(size($"w") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(w) - 1), i -> " +
            "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("big"))
      for (_ <- 1 to 2) {
        time("bg: explode only") { noop(bg) }
        time("db: per-(doc,big) agg") {
          noop(bg.groupBy($"doc_id", $"big").agg(count(lit(1)).as("m")))
        }
        time("cb+ctx+model") {
          val db = bg.groupBy($"doc_id", $"big").agg(count(lit(1)).as("m"))
          val cb = db.groupBy($"big").agg(sum($"m").as("c2"))
          val ctx = cb.groupBy(split($"big", " ").getItem(0).as("prev"))
            .agg(sum($"c2").as("ctx"))
          noop(cb.withColumn("prev", split($"big", " ").getItem(0))
            .join(ctx, "prev")
            .select($"big", (length(bin(expr("ctx DIV c2"))) - 1).as("bits")))
        }
        time("full t11 (registry)") {
          noop(SparkEntry.queries("t11_bigram_surprisal")(spark, sfDir))
        }
      }
      spark.stop()
      return
    }

    if (args.nonEmpty) {
      val registry = SparkEntry.queries
      args.foreach { q =>
        val runs = (1 to 2).map(_ => timed(noop(registry(q)(spark, sfDir))))
        println(f"[profile] $q%-30s min ${runs.min}%.3f s  runs ${runs.map(t => f"$t%.3f").mkString(" ")}")
      }
      spark.stop()
      return
    }

    for (_ <- 1 to 2) {
      time("scan+explode+hash") {
        noop(Tables.load(spark, sfDir, "documents")
          .select($"doc_id", explode(shingles(tokens($"text"), 3)).as("s"))
          .select($"doc_id", xxhash64($"s").as("h")))
      }
      time("scan only") {
        noop(Tables.load(spark, sfDir, "documents").select($"doc_id", $"text"))
      }
      time("native shingle hashes") {
        noop(Tables.load(spark, sfDir, "documents")
          .select($"doc_id", explode(shingleHashes($"text", 3)).as("h")))
      }
      time("full d3 (registry)") {
        noop(SparkEntry.queries("d3_jaccard_pairs")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
