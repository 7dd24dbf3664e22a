package graft.api

import java.security.SecureRandom

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.changelog.{Op, RawRecord}
import graft.streaming.ChangelogStream

/** Statement lifecycle phases, lowercase like the reference's
  * `status.phase` (`/root/reference/api/statements.py:180-189`). */
object Phase {
  val Pending = "pending"
  val Running = "running"
  val Completed = "completed"
  val Failed = "failed"
}

/** A created statement: name, SQL, result schema ("traits.schema" in the
  * reference, read at `/root/reference/dashboard.py:201`), current phase,
  * and a changelog-shaped result cursor. */
final class Statement private[api] (
    val name: String,
    val sql: String,
    val df: DataFrame,
    streamHandle: Option[ChangelogStream.Handle],
    /** The creation-time properties map — the reference posts
      * `{sql.current-catalog, sql.current-database}` with every create
      * (`/root/reference/api/statements.py:27-31,70-78`) and the
      * statement carries them; mirrored here so the L5 API shape is
      * complete. Empty for the default namespace. */
    val properties: Map[String, String] = Map.empty) {

  val schema: StructType = df.schema
  val columns: Seq[String] = schema.fieldNames.toSeq

  @volatile private[api] var failure: Option[Throwable] = None

  def isStreaming: Boolean = streamHandle.isDefined

  def phase: String = streamHandle match {
    case Some(h) =>
      if (failure.isDefined || h.query.exception.isDefined) Phase.Failed
      else if (h.query.isActive) Phase.Running
      else Phase.Completed
    case None => if (failure.isDefined) Phase.Failed else Phase.Completed
  }

  /** Result pages as a raw-record iterator: streaming statements read the
    * live changelog cursor; batch statements produce `+I` rows (a bounded
    * query's entire changelog is its result set).
    *
    * The streaming iterator never exhausts (the query is continuous), so
    * consumers must pass a bounded `limit` to `Changelog.consume`. Each
    * empty poll sleeps `heartbeatMs` before yielding its heartbeat —
    * the in-process stand-in for the reference's per-page HTTP round trip,
    * without which a drained cursor busy-spins.
    *
    * The batch path serves `toLocalIterator()` — one partition on the
    * driver at a time, fetched as the consumer pages — never `collect()`:
    * a batch statement over a 100 TB table must not materialize its whole
    * result driver-side just because the client reads page 1. Failures
    * surface lazily (on the `hasNext`/`next` that hits the bad partition)
    * and flip the statement to Failed, same as the eager path did. */
  def results(heartbeatMs: Long = 10L): Iterator[Option[RawRecord]] =
    streamHandle match {
      case Some(h) => new Iterator[Option[RawRecord]] {
        private val cl = h.changelog()
        override def hasNext: Boolean = true // continuous: never exhausts
        override def next(): Option[RawRecord] = cl.consume(1).headOption match {
          case Some(rec) => Some(RawRecord(rec.op.map(_.code), rec.values))
          case None => // heartbeat — no data this poll; back off
            if (heartbeatMs > 0) Thread.sleep(heartbeatMs)
            None
        }
      }
      case None => new Iterator[Option[RawRecord]] {
        private val rows =
          try df.toLocalIterator()
          catch { case e: Throwable => failure = Some(e); throw e }
        override def hasNext: Boolean =
          try rows.hasNext
          catch { case e: Throwable => failure = Some(e); throw e }
        override def next(): Option[RawRecord] = {
          val r = try rows.next()
                  catch { case e: Throwable => failure = Some(e); throw e }
          Some(RawRecord(Some(Op.Insert.code), r.toSeq.toVector))
        }
      }
    }

  def stop(): Unit = streamHandle.foreach(_.stop())
  private[api] def handle: Option[ChangelogStream.Handle] = streamHandle
}

/** The engine's public statement facade — the Spark re-host of the
  * reference's `StatementsEndpoint` (`/root/reference/api/statements.py`):
  * `create(sql)` replaces the POST (Catalyst parses/plans instead of the
  * remote Flink service), `waitForStatus` replaces the 300 ms status poll,
  * `results` replaces the result-page generator. Statement names are a
  * prefix + 12 random hex chars (`/root/reference/api/statements.py:11-13`).
  *
  * Statements are memoized by (SQL text, changelog keys), like the
  * reference's one-statement-per-distinct-SQL cache
  * (`/root/reference/dashboard.py:195-209`) — keying also on `keyCols` so
  * the same SQL with different changelog keying gets its own statement
  * rather than silently reusing the first keying.
  */
final class Statements(spark: SparkSession, prefix: String = "stmt-",
                       pollMs: Long = 300L) {

  private val rng = new SecureRandom()
  private val byName = TrieMap.empty[String, Statement]
  private val byQuery =
    TrieMap.empty[(String, Seq[String], Map[String, String]), Statement]
  private val createLock = new Object

  private def randomId(): String = {
    val bytes = new Array[Byte](6)
    rng.nextBytes(bytes)
    bytes.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Grouping-key columns of the statement's top aggregate, read from the
    * analyzed plan (the way the reference reads the server-inferred schema,
    * `dashboard.py:201` — the engine knows its own plan). Only keys that
    * survive into the output schema count; empty for non-aggregating
    * (append-only) queries. */
  private def derivedKeys(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.NamedExpression
    val out = df.schema.fieldNames.toSet
    df.queryExecution.analyzed.collectFirst {
      case a: Aggregate => a.groupingExpressions.collect {
        case ne: NamedExpression if out.contains(ne.name) => ne.name
      }
    }.getOrElse(Nil)
  }

  /** Column contract for one side of a continuous JOIN statement: a
    * STREAMING temp view carrying one side's changelog feed — `seq` (the
    * caller's per-feed monotone sequence, making in-batch fold order
    * deterministic), the equi-join `key`, the row identity `id`, its
    * current `value`, and the upsert/delete flag. The reference's Flink
    * service accepts a two-table continuous JOIN statement over exactly
    * such keyed changelogs; this is the engine's wire shape for it. */
  private val FeedCols = Seq("seq", "key", "id", "value", "delete")

  private def changelogFeed(name: String): Option[DataFrame] =
    try {
      val t = spark.table(name)
      if (t.isStreaming && FeedCols.forall(t.schema.fieldNames.contains))
        Some(t)
      else None
    } catch { case _: Exception => None }

  /** A matched two-feed continuous JOIN: the IVM delta stream (op, key,
    * left_id, left_value, right_id, right_value) plus the SQL-side alias
    * each feed was given (for resolving `a.value`-style references in a
    * downstream GROUP BY). */
  private case class FeedJoin(deltas: DataFrame, lAlias: String,
                              rAlias: String)

  /** Columns of the maintained join view, in delta-row order AFTER the
    * leading op column. */
  private val JoinViewCols =
    Seq("key", "left_id", "left_value", "right_id", "right_value")

  /** Match `l [AS a] <type> JOIN r [AS b] ON <key equality>` over two
    * registered changelog feeds and build the exact-retraction IVM join
    * ([[graft.streaming.StatefulOps.changelogJoinStream]]) over them —
    * Structured Streaming's own stream-stream join is append-only and
    * never retracts on upsert/delete, so this operator is the engine's
    * equivalent of what the reference's Flink service maintains for a
    * continuous two-table JOIN. */
  /** Relation name (resolves the feed) and the outermost alias (what
    * column references qualify by; the relation name itself when
    * unaliased). */
  private def relInfo(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    p match {
      case u: UnresolvedRelation =>
        Some((u.multipartIdentifier.last, u.multipartIdentifier.last))
      case SubqueryAlias(id, c) => relInfo(c).map { case (n, _) => (n, id.name) }
      case _ => None
    }
  }

  private def matchFeedJoin(
      j: org.apache.spark.sql.catalyst.plans.logical.Join): Option[FeedJoin] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}
    import graft.streaming.StatefulOps
    val outer = j.joinType match {
      case Inner => Some((false, false))
      case LeftOuter => Some((true, false))
      case RightOuter => Some((false, true))
      case FullOuter => Some((true, true))
      case _ => None
    }
    val keyEquality = j.condition.exists {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        a.nameParts.last == "key" && b.nameParts.last == "key"
      case _ => false
    }
    for {
      (lo, ro) <- outer if keyEquality
      (ln, la) <- relInfo(j.left); (rn, ra) <- relInfo(j.right)
      lt <- changelogFeed(ln); rt <- changelogFeed(rn)
    } yield {
      import spark.implicits._
      def feed(t: DataFrame, isLeft: Boolean) = t
        .select("seq", "key", "id", "value", "delete")
        .as[(Long, Long, Long, String, Boolean)]
        .map { case (seq, k, id, v, del) =>
          (seq, StatefulOps.JoinEvent(k, isLeft, id, v, del))
        }
      val deltas = StatefulOps
        .changelogJoinStream(feed(lt, true).union(feed(rt, false)), lo, ro)
        .toDF()
      FeedJoin(deltas, la, ra)
    }
  }

  /** Recognize the continuous-statement shapes that need EXACT RETRACTION
    * semantics the default `spark.sql` route cannot express, and run them
    * through the IVM operators:
    *  - `SELECT * FROM l JOIN r ON l.key = r.key` (two-feed join view)
    *  - `SELECT * FROM feed` (single-feed maintained view)
    *  - `SELECT <groups>, <aliased aggs> FROM <join | feed> [WHERE …]
    *    GROUP BY … [HAVING …]` (grouped fold over the view's deltas)
    * Parsing is Catalyst's own (`sessionState.sqlParser`), not regex; any
    * SQL that does not match these shapes (or whose relations are not
    * changelog feeds) falls through to the default route untouched. */
  private def tryContinuousStatement(sql: String, name: String,
      properties: Map[String, String] = Map.empty): Option[Statement] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedStar
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case _: Exception => return None }
    parsed match {
      // ONLY the exact `SELECT * FROM l JOIN r ON …` shape routes here:
      // the statement serves the full maintained-view columns, so a
      // narrowing projection must NOT silently get the wide view — any
      // other shape falls through to the default route and keeps Spark's
      // own semantics
      case Project(Seq(UnresolvedStar(None)), j: Join) => joinStatement(j, sql, name, properties)
      case j: Join => joinStatement(j, sql, name, properties)
      // `SELECT * FROM feed` over a single changelog feed serves the
      // MAINTAINED VIEW's changelog (upsert retracts, delete removes) —
      // the default route would append raw wire events, serving delete
      // markers as data rows
      case Project(Seq(UnresolvedStar(None)), rel) =>
        feedViewStatement(rel, sql, name, properties)
      // the composed continuous statement a reference user writes next:
      // JOIN → [WHERE] → GROUP BY in one statement (Flink-the-service
      // maintains it as one changelog; `spark.sql` alone cannot — a
      // stream-stream join feeding an aggregate is rejected without
      // watermarks, and even the watermarked form never retracts). A
      // WHERE between them is sound on the retraction stream: a
      // deterministic row predicate passes or rejects a joined row
      // identically on its +I and its -D, so filtering the deltas
      // equals filtering the view.
      case agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        routeAgg(agg, None, sql, name, properties)
      // HAVING filters the AGGREGATE view: applied to the fold's emitted
      // snapshot, so a group crossing the boundary emits the -D / +I the
      // changelog wire expects (the complete-mode-diff transition)
      case h: org.apache.spark.sql.catalyst.analysis.UnresolvedHaving =>
        h.child match {
          case agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
            routeAgg(agg, Some(h.havingCondition), sql, name, properties)
          case _ => None
        }
      case _ => None
    }
  }

  /** `SELECT * FROM <changelog feed>`: the single-feed maintained view
    * as a retraction changelog — [[graft.streaming.StatefulOps.changelogUpsertStream]]'s
    * exact deltas through the passthrough sink, columns (key, id, value). */
  private def feedViewStatement(
      rel: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      sql: String, name: String,
      properties: Map[String, String]): Option[Statement] = {
    import graft.streaming.StatefulOps
    for {
      (relName, _) <- relInfo(rel)
      feed <- changelogFeed(relName)
    } yield {
      val deltas = upsertDeltas(feed)
      val handle = ChangelogStream.deltaPassthrough(deltas, name)
      new Statement(name, sql, deltas.drop("op"), Some(handle), properties)
    }
  }

  /** One feed's wire rows → the exact retraction deltas of its
    * maintained view. */
  private def upsertDeltas(feed: DataFrame): DataFrame = {
    import graft.streaming.StatefulOps
    import spark.implicits._
    StatefulOps.changelogUpsertStream(
      feed.select("seq", "key", "id", "value", "delete")
        .as[(Long, Long, Long, String, Boolean)]
        .map { case (seq, k, id, v, del) =>
          (seq, StatefulOps.UpsertEvent(k, id, v, del))
        }).toDF()
  }

  /** Dispatch an `Aggregate over [Filter over] <source>` continuous
    * statement: the source is either a two-feed JOIN (the IVM join's
    * deltas) or a SINGLE changelog feed — whose upsert/delete semantics
    * an append-only reading gets wrong (deletes must subtract, updates
    * must not double-count), so it routes through
    * [[graft.streaming.StatefulOps.changelogUpsertStream]]. */
  private def routeAgg(
      agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate,
      having: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      sql: String, name: String,
      properties: Map[String, String]): Option[Statement] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val (src, where) = agg.child match {
      case Filter(cond, s) => (s, Some(cond))
      case s => (s, None)
    }
    src match {
      case j: Join => tryJoinAggStatement(agg, j, where, having,
        sql, name, properties)
      case rel => tryFeedAggStatement(agg, rel, where, having,
        sql, name, properties)
    }
  }

  /** Columns of a single feed's maintained view, in delta-row order
    * after the leading op column. */
  private val FeedViewCols = Seq("key", "id", "value")

  /** Route `SELECT <group cols>, <aliased aggs> FROM feed [WHERE …]
    * GROUP BY … [HAVING …]` over ONE registered changelog feed through
    * the exact-retraction upsert stream feeding the same grouped fold as
    * the join route. */
  private def tryFeedAggStatement(
      agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate,
      rel: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      where: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      having: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      sql: String, name: String,
      properties: Map[String, String]): Option[Statement] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.types.{LongType, StringType}
    val (relName, alias) = relInfo(rel).getOrElse(return None)
    val feed = changelogFeed(relName).getOrElse(return None)
    val deltas = upsertDeltas(feed)
    def resolve(a: UnresolvedAttribute): Option[Int] = {
      val colName = a.nameParts match {
        case Seq(c) if FeedViewCols.contains(c) => Some(c)
        case Seq(q, c) if q == alias && FeedViewCols.contains(c) => Some(c)
        case _ => None
      }
      colName.map(FeedViewCols.indexOf)
    }
    aggOverDeltas(deltas, FeedViewCols,
      Map("key" -> LongType, "id" -> LongType, "value" -> StringType),
      resolve, agg, where, having, sql, name, properties)
  }

  private def joinStatement(
      j: org.apache.spark.sql.catalyst.plans.logical.Join, sql: String,
      name: String, properties: Map[String, String]): Option[Statement] =
    matchFeedJoin(j).map { fj =>
      val handle = ChangelogStream.deltaPassthrough(fj.deltas, name)
      // the statement's advertised schema is the maintained view's
      // columns (op travels as the record op, not a column)
      new Statement(name, sql, fj.deltas.drop("op"), Some(handle), properties)
    }

  /** The per-aggregate incremental state a retraction stream can maintain
    * exactly: COUNT(*) / COUNT(col) / SUM / AVG are all ±-foldable (MIN and
    * MAX are not — a retraction of the current extremum needs the full
    * multiset, so they fall through to the default route). */
  private sealed trait AggOp
  private case object CountStar extends AggOp
  private case class CountCol(idx: Int) extends AggOp
  private case class SumCol(idx: Int) extends AggOp
  private case class AvgCol(idx: Int) extends AggOp

  /** Route `SELECT <group cols>, <aliased aggs> FROM a JOIN b ON a.key =
    * b.key [WHERE <pred>] GROUP BY <cols>` over two changelog feeds
    * through the IVM join feeding a grouped incremental fold
    * ([[ChangelogStream.foldingSnapshot]]): the join emits its exact
    * retraction deltas executor-side, and the fold maintains O(groups)
    * aggregate state (COUNT/SUM/AVG, each ±-foldable), diff-synthesizing
    * `+I/-U/+U/-D` per page. Aggregates must be aliased (the engine-wide
    * oracle discipline); group keys may be any view column (`key`,
    * `a.id`, `b.value`, …); numeric casts accept `CAST(x AS DOUBLE)`;
    * WHERE supports column-vs-literal comparisons, IS [NOT] NULL, and
    * AND/OR/NOT with SQL three-valued semantics (see compilePred).
    * Any non-matching shape falls through untouched. */
  private def tryJoinAggStatement(
      agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate,
      j: org.apache.spark.sql.catalyst.plans.logical.Join,
      where: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      having: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      sql: String, name: String,
      properties: Map[String, String]): Option[Statement] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.types.{LongType, StringType}
    val fj = matchFeedJoin(j).getOrElse(return None)
    // view-column resolution: unqualified names hit the view columns
    // directly; alias-qualified names map id/value/key onto their side
    def resolve(attr: UnresolvedAttribute): Option[Int] = {
      val colName = attr.nameParts match {
        case Seq(c) if JoinViewCols.contains(c) => Some(c)
        case Seq(q, c) if q == fj.lAlias || q == fj.rAlias =>
          val side = if (q == fj.lAlias) "left" else "right"
          c match {
            case "key" => Some("key")
            case "id" => Some(s"${side}_id")
            case "value" => Some(s"${side}_value")
            case _ => None
          }
        case _ => None
      }
      colName.map(JoinViewCols.indexOf)
    }
    aggOverDeltas(fj.deltas, JoinViewCols,
      Map("key" -> LongType, "left_id" -> LongType, "right_id" -> LongType,
        "left_value" -> StringType, "right_value" -> StringType),
      resolve, agg, where, having, sql, name, properties)
  }

  /** The source-agnostic core of the composed continuous aggregate
    * statement: a delta stream (op + view columns), the view's column
    * names/types, and an attribute resolver in — a running Statement
    * out. Shared by the two-feed JOIN route and the single-feed upsert
    * route. */
  private def aggOverDeltas(
      deltas: DataFrame, viewCols: Seq[String],
      viewType: Map[String, org.apache.spark.sql.types.DataType],
      viewColResolve: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Option[Int],
      agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate,
      where: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      having: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      sql: String, name: String,
      properties: Map[String, String]): Option[Statement] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    def viewCol(attr: UnresolvedAttribute): Option[Int] = viewColResolve(attr)
    // numeric argument of an aggregate: a view column, optionally under
    // CAST(… AS DOUBLE) — other cast targets (INT truncation etc.) would
    // change the value, so they fall through rather than mis-evaluate
    def numArg(e: Expression): Option[Int] = e match {
      case a: UnresolvedAttribute => viewCol(a)
      case Cast(a: UnresolvedAttribute, DoubleType, _, _) => viewCol(a)
      case _ => None
    }
    // WHERE compiler — the supported predicate algebra over the joined
    // view: a view column compared to a literal (=, <>, <, <=, >, >=),
    // IS [NOT] NULL, AND/OR/NOT. SQL three-valued logic is modeled with
    // Option[Boolean] (None = unknown): a comparison against NULL is
    // unknown, NOT(unknown) stays unknown, and only a definite TRUE
    // passes the row. Any predicate outside this algebra falls through
    // to the default route rather than mis-evaluating.
    def litVal(l: Literal): Any = l.value match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case other => other
    }
    def compileCmp(resolve: UnresolvedAttribute => Option[Int])(
        a: UnresolvedAttribute, l: Literal,
        test: Int => Boolean): Option[Vector[Any] => Option[Boolean]] =
      resolve(a).map { i => (v: Vector[Any]) =>
        val x = v(i)
        val y = litVal(l)
        if (x == null || y == null) None
        else (x, y) match {
          case (s: String, t: String) => Some(test(s.compareTo(t)))
          case (xn: Number, yn: Number) => Some(test(
            java.lang.Double.compare(xn.doubleValue, yn.doubleValue)))
          case _ => None // incomparable types: unknown
        }
      }
    def compilePred(resolve: UnresolvedAttribute => Option[Int])(
        e: Expression): Option[Vector[Any] => Option[Boolean]] = {
      val rec = compilePred(resolve) _
      val cmp = compileCmp(resolve) _
      e match {
        case And(l, r) =>
          for { lf <- rec(l); rf <- rec(r) } yield
            (v: Vector[Any]) => (lf(v), rf(v)) match {
              case (Some(false), _) | (_, Some(false)) => Some(false)
              case (Some(true), Some(true)) => Some(true)
              case _ => None
            }
        case Or(l, r) =>
          for { lf <- rec(l); rf <- rec(r) } yield
            (v: Vector[Any]) => (lf(v), rf(v)) match {
              case (Some(true), _) | (_, Some(true)) => Some(true)
              case (Some(false), Some(false)) => Some(false)
              case _ => None
            }
        case Not(c) => // also covers `<>`, which parses as Not(EqualTo)
          rec(c).map(f => (v: Vector[Any]) => f(v).map(!_))
        case IsNull(a: UnresolvedAttribute) =>
          resolve(a).map(i => (v: Vector[Any]) => Some(v(i) == null))
        case IsNotNull(a: UnresolvedAttribute) =>
          resolve(a).map(i => (v: Vector[Any]) => Some(v(i) != null))
        case EqualTo(a: UnresolvedAttribute, l: Literal) => cmp(a, l, _ == 0)
        case EqualTo(l: Literal, a: UnresolvedAttribute) => cmp(a, l, _ == 0)
        case LessThan(a: UnresolvedAttribute, l: Literal) => cmp(a, l, _ < 0)
        case LessThan(l: Literal, a: UnresolvedAttribute) => cmp(a, l, _ > 0)
        case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) => cmp(a, l, _ <= 0)
        case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) => cmp(a, l, _ >= 0)
        case GreaterThan(a: UnresolvedAttribute, l: Literal) => cmp(a, l, _ > 0)
        case GreaterThan(l: Literal, a: UnresolvedAttribute) => cmp(a, l, _ < 0)
        case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) => cmp(a, l, _ >= 0)
        case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) => cmp(a, l, _ <= 0)
        case _ => None
      }
    }
    val rowFilter: Option[Vector[Any] => Boolean] = where match {
      case None => None
      case Some(cond) => compilePred(viewCol)(cond) match {
        case Some(f) => Some((v: Vector[Any]) => f(v).contains(true))
        case None => return None // unsupported predicate: default route
      }
    }
    val groupIdx: Seq[Int] = agg.groupingExpressions.map {
      case a: UnresolvedAttribute => viewCol(a).getOrElse(return None)
      case _ => return None
    }
    // SELECT list → (output name, Left(view col idx) | Right(agg op))
    val outCols: Seq[(String, Either[Int, AggOp])] =
      agg.aggregateExpressions.map {
        case a: UnresolvedAttribute =>
          val i = viewCol(a).getOrElse(return None)
          if (!groupIdx.contains(i)) return None // bare col must be grouped
          (a.nameParts.last, Left(i))
        case Alias(child, outName) =>
          child match {
            case a: UnresolvedAttribute =>
              val i = viewCol(a).getOrElse(return None)
              if (!groupIdx.contains(i)) return None
              (outName, Left(i))
            case f: UnresolvedFunction if !f.isDistinct =>
              val op = (f.nameParts.map(_.toLowerCase).mkString("."),
                f.arguments) match {
                case ("count", Seq(UnresolvedStar(None))) => CountStar
                // count over a non-null literal counts rows; count(NULL)
                // is always 0 and must not take the row-count path
                case ("count", Seq(Literal(v, _))) if v != null => CountStar
                case ("count", Seq(arg)) => CountCol(numArg(arg).getOrElse(return None))
                case ("sum", Seq(arg)) => SumCol(numArg(arg).getOrElse(return None))
                case ("avg", Seq(arg)) => AvgCol(numArg(arg).getOrElse(return None))
                case _ => return None
              }
              (outName, Right(op))
            case _ => return None
          }
        case _ => return None
      }
    if (!outCols.exists(_._2.isRight)) return None // not an aggregate shape
    // every grouping column must be in the SELECT list: the synthesizer
    // retracts by value equality on the key columns, so two groups folding
    // to identical visible rows would corrupt the changelog
    if (!groupIdx.forall(i => outCols.exists(_._2 == Left(i)))) return None
    // HAVING resolves against the OUTPUT columns (aliases + group cols)
    // and filters the fold's emitted snapshot — a group crossing the
    // boundary emits the -D / +I the complete-mode diff produces
    def outIdx(a: UnresolvedAttribute): Option[Int] = a.nameParts match {
      case Seq(n) =>
        val i = outCols.indexWhere(_._1 == n)
        if (i >= 0) Some(i) else None
      case _ => None
    }
    val havingFilter: Option[Vector[Any] => Boolean] = having match {
      case None => None
      case Some(cond) => compilePred(outIdx)(cond) match {
        case Some(f) => Some((v: Vector[Any]) => f(v).contains(true))
        case None => return None // unsupported predicate: default route
      }
    }
    // ---- driver-side incremental fold over the join's retraction deltas:
    // per group, live-row count plus (sum, non-null count) per aggregate —
    // state is O(output groups), the dashboard-size contract; the heavy
    // join state stays in the executor StateStore
    val aggOps = outCols.collect { case (_, Right(op)) => op }
    final class GState {
      var rows: Long = 0L
      val sums: Array[Double] = new Array[Double](aggOps.length)
      val counts: Array[Long] = new Array[Long](aggOps.length)
    }
    val state = mutable.LinkedHashMap.empty[Vector[Any], GState]
    def toNum(v: Any): Option[Double] = v match {
      case null => None
      case d: java.lang.Double => Some(d)
      case l: java.lang.Long => Some(l.toDouble)
      case i: java.lang.Integer => Some(i.toDouble)
      case s: String =>
        try Some(s.toDouble) catch { case _: NumberFormatException => None }
      case other => try Some(other.toString.toDouble)
                    catch { case _: NumberFormatException => None }
    }
    def fold(deltas: Seq[Vector[Any]]): Seq[Vector[Any]] = {
      deltas.foreach { row =>
        // delta rows lead with the changelog op; view columns follow
        val sign = row(0).asInstanceOf[Int] match {
          case 0 | 2 => 1L // +I / +U add
          case 1 | 3 => -1L // -U / -D retract
          case other => throw new IllegalStateException(
            s"join delta carried an invalid changelog op: $other")
        }
        val view = row.drop(1)
        // WHERE applies to the joined row: a deterministic predicate
        // filters a row's +I and its -D identically, so the filtered
        // fold maintains exactly the aggregate of the filtered view
        if (rowFilter.forall(_(view))) {
          val gkey = groupIdx.map(view).toVector
          val g = state.getOrElseUpdate(gkey, new GState)
          g.rows += sign
          aggOps.zipWithIndex.foreach { case (op, k) =>
            op match {
              case CountStar => ()
              case CountCol(i) =>
                if (view(i) != null) g.counts(k) += sign
              case SumCol(i) => toNum(view(i)).foreach { d =>
                g.sums(k) += sign * d; g.counts(k) += sign
              }
              case AvgCol(i) => toNum(view(i)).foreach { d =>
                g.sums(k) += sign * d; g.counts(k) += sign
              }
            }
          }
          if (g.rows <= 0) state.remove(gkey)
        }
      }
      val snapshot = state.iterator.map { case (gkey, g) =>
        var k = -1
        outCols.map {
          case (_, Left(i)) => gkey(groupIdx.indexOf(i))
          case (_, Right(op)) =>
            k += 1
            op match {
              case CountStar => java.lang.Long.valueOf(g.rows)
              case CountCol(_) => java.lang.Long.valueOf(g.counts(k))
              case SumCol(_) =>
                if (g.counts(k) > 0) java.lang.Double.valueOf(g.sums(k)) else null
              case AvgCol(_) =>
                if (g.counts(k) > 0)
                  java.lang.Double.valueOf(g.sums(k) / g.counts(k))
                else null
            }
        }.toVector
      }.toSeq
      havingFilter match {
        case Some(f) => snapshot.filter(f)
        case None => snapshot
      }
    }
    val outNames = outCols.map(_._1)
    val keyNames = outCols.collect {
      case (n, Left(i)) if groupIdx.contains(i) => n
    }
    if (keyNames.isEmpty) return None // ungrouped global agg: keep default
    val fields = outCols.map {
      case (n, Left(i)) => StructField(n, viewType(viewCols(i)))
      case (n, Right(CountStar)) => StructField(n, LongType)
      case (n, Right(CountCol(_))) => StructField(n, LongType)
      case (n, Right(_)) => StructField(n, DoubleType, nullable = true)
    }
    val handle = ChangelogStream.foldingSnapshot(deltas, name,
      outNames, keyNames, fold)
    // advertised schema ("traits.schema") is the aggregate view's — an
    // empty typed frame carries it; results flow through the handle
    val schemaDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields))
    Some(new Statement(name, sql, schemaDf, Some(handle), properties))
  }

  /** A memo hit is only served while the statement is still usable: a
    * Failed statement (a batch result iterator hit a failing partition —
    * possibly long after create(), since the batch path pages lazily — or
    * the streaming query died), or a streaming statement that was
    * stopped, would otherwise be returned permanently broken for its SQL
    * with no way to re-run it. */
  private def live(s: Statement): Boolean =
    s.phase != Phase.Failed &&
      !(s.isStreaming && !s.handle.exists(_.query.isActive))

  /** The two statement properties the reference posts with every create
    * (`/root/reference/api/statements.py:27-31`): the catalog/database
    * the statement's unqualified table names resolve in. */
  val CurrentCatalogProp = "sql.current-catalog"
  val CurrentDatabaseProp = "sql.current-database"

  /** Create (or return the memoized) statement for this SQL. Streaming
    * plans start immediately with a changelog-synthesizing sink keyed on
    * `keyCols` — or, when omitted, on the grouping columns derived from
    * the analyzed plan; batch plans are complete on arrival. A cached
    * statement that has failed (or whose streaming query is no longer
    * active) is evicted and re-created rather than returned dead.
    *
    * `properties` mirrors the reference's create payload
    * (`api/statements.py:27-31,70-78`): `sql.current-catalog` /
    * `sql.current-database` scope how THIS statement's unqualified table
    * names resolve — routed to the session catalog for the duration of
    * planning (creates serialize on `createLock`, so the temporary
    * namespace switch cannot leak into a concurrent create) and restored
    * after. Name resolution happens at plan time, so the restored
    * session state does not affect the statement's later execution.
    * Properties participate in the memo key: the same SQL against two
    * databases is two statements. */
  def create(sql: String, keyCols: Seq[String] = Nil,
             properties: Map[String, String] = Map.empty): Statement = {
    val cacheKey = (sql, keyCols, properties)
    // creation is heavyweight (may start a live streaming query), so misses
    // serialize: concurrent creates of the same SQL must not race two
    // queries into existence with one silently leaked
    byQuery.get(cacheKey).filter(live).getOrElse(createLock.synchronized {
      byQuery.get(cacheKey).filter(live).getOrElse {
        // evicting a dead statement must also drop it from the by-name
        // index, or failed statements pile up for the facade's lifetime
        byQuery.get(cacheKey).foreach(dead => byName.remove(dead.name))
        val name = prefix + randomId()
        val prevCatalog = spark.catalog.currentCatalog()
        val prevDatabase = spark.catalog.currentDatabase
        properties.get(CurrentCatalogProp)
          .foreach(spark.catalog.setCurrentCatalog)
        properties.get(CurrentDatabaseProp)
          .foreach(spark.catalog.setCurrentDatabase)
        val stmt =
          try {
            tryContinuousStatement(sql, name, properties).getOrElse {
              val df = spark.sql(sql)
              val handle =
                if (df.isStreaming) {
                  val keys = if (keyCols.nonEmpty) keyCols else derivedKeys(df)
                  if (keys.nonEmpty)
                    Some(ChangelogStream.updating(df, name, keys))
                  else Some(ChangelogStream.appending(df, name))
                } else None
              new Statement(name, sql, df, handle, properties)
            }
          } finally {
            spark.catalog.setCurrentCatalog(prevCatalog)
            spark.catalog.setCurrentDatabase(prevDatabase)
          }
        byName.put(name, stmt)
        byQuery.put(cacheKey, stmt)
        stmt
      }
    })
  }

  def get(name: String): Option[Statement] = byName.get(name)

  /** Block until the statement reaches one of `statuses`, polling at the
    * reference's cadence (`poll_ms=300`, `api/statements.py:24,171-192`;
    * overridable via the `pollMs` constructor parameter).
    * Returns None on `failed`; throws on timeout. */
  def waitForStatus(stmt: Statement, statuses: Set[String],
                    timeoutMs: Long = 120000L): Option[Statement] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      val p = stmt.phase
      if (p == Phase.Failed) return None
      if (statuses.contains(p)) return Some(stmt)
      Thread.sleep(pollMs)
    }
    throw new java.util.concurrent.TimeoutException(
      s"statement ${stmt.name} did not reach $statuses in ${timeoutMs} ms")
  }

  def stopAll(): Unit = byName.values.foreach(_.stop())
}
