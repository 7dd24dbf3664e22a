package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{DotProduct, MinHashSig, ShingleHashes, SimHash64}

/** Registers graft's custom Catalyst expressions as SQL functions so they
  * are first-class from SQL text (the engine's statement facade accepts raw
  * SQL like the reference's endpoint did):
  *
  *   SELECT dot_product(a.v, b.v), minhash_sig(shingles, 32),
  *          simhash64(toks), shingle_hashes(text, 3)
  *
  * Injected via SparkSessionExtensions — usable with
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a real cluster,
  * or `EngineSession.create()` locally.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    e.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args(0),
        args(1).eval().asInstanceOf[Int])))
  }
}

/** One place to build a correctly-configured engine session: UTC (oracle
  * parity), shuffle parallelism = core count (not the 200 default — wrong
  * for local mode and re-planned by AQE on a cluster), AQE on (runtime
  * skew-join + partition coalescing at scale), and graft's SQL functions
  * registered. */
object EngineSession {
  def create(cores: Int = Runtime.getRuntime.availableProcessors(),
             appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // getOrCreate may return a pre-existing session where extensions never
    // ran — (re-)register directly; idempotent either way.
    registerFunctions(spark)
    spark
  }

  /** Register graft's SQL functions on an already-built session. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product",
      args => DotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      args => MinHashSig(args(0), args(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      args => SimHash64(args(0)), "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      args => ShingleHashes(args(0), args(1).eval().asInstanceOf[Int]),
      "built-in")
  }
}
