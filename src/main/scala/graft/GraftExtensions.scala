package graft

import graft.functions.XashKernel
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Session extension exposing the graft kernels to SQL users:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT graft_cleaned_text(c), graft_xash(tok), graft_simhash(t) ...
  *
  * Each function resolves to a StaticInvoke of a compiled kernel — a
  * native Catalyst expression inside whole-stage codegen, not a UDF.
  * [[GraftExtensions.register]] injects the same functions into an
  * already-running session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach(ext.injectFunction)
    // Planner surface: the top-k heap operator and the optimizer rule
    // that rewrites the row_number()<=k window idiom onto it.
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    GraftExtensions.tableInjections.foreach(ext.injectTableFunction)
    // SQL DML on graft Delta tables (DELETE/UPDATE/MERGE against
    // graft_delta.`path`) — parse with Spark's grammar, rewrite the
    // catalyst DML plan onto the production writers. Parser injection
    // only applies to sessions BUILT with these extensions (all graft
    // entry points set spark.sql.extensions); register() on a live
    // session cannot swap the parser.
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // Catalog reads: a GraftTable relation resolved through the V2
    // catalog (spark.sql.catalog.<name> = graft.catalog.GraftCatalog)
    // substitutes to the production DeltaReader plan at analysis time.
    ext.injectResolutionRule(session => new graft.catalog.GraftCatalogScanRule(session))
  }
}

object GraftExtensions {
  private def info(name: String) = new ExpressionInfo(XashKernel.getClass.getName, name)

  val injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cleaned_text"), info("graft_cleaned_text"),
      (args: Seq[Expression]) =>
        StaticInvoke(XashKernel.getClass, StringType, "cleanText", args)),
    (FunctionIdentifier("graft_xash"), info("graft_xash"),
      (args: Seq[Expression]) =>
        StaticInvoke(XashKernel.getClass, ArrayType(LongType, containsNull = false), "xash",
          args, returnNullable = false)),
    (FunctionIdentifier("graft_super_key"), info("graft_super_key"),
      (args: Seq[Expression]) =>
        StaticInvoke(XashKernel.getClass, ArrayType(LongType, containsNull = false), "superKey",
          args, returnNullable = false)),
    (FunctionIdentifier("graft_simhash"), info("graft_simhash"),
      (args: Seq[Expression]) =>
        StaticInvoke(XashKernel.getClass, LongType, "simhash", args, returnNullable = false)),
    (FunctionIdentifier("graft_dot"), info("graft_dot"),
      (args: Seq[Expression]) =>
        StaticInvoke(graft.functions.VecKernel.getClass, org.apache.spark.sql.types.DoubleType,
          "dot", args, returnNullable = false)),
    (FunctionIdentifier("graft_xash_words"), info("graft_xash_words"),
      (args: Seq[Expression]) =>
        StaticInvoke(XashKernel.getClass, ArrayType(LongType, containsNull = false), "xashWords",
          args, returnNullable = false)),
    (FunctionIdentifier("graft_super_key_words"), info("graft_super_key_words"),
      (args: Seq[Expression]) =>
        StaticInvoke(XashKernel.getClass, ArrayType(LongType, containsNull = false),
          "superKeyWords", args, returnNullable = false)),
    (FunctionIdentifier("graft_contains_words"), info("graft_contains_words"),
      (args: Seq[Expression]) =>
        StaticInvoke(XashKernel.getClass, org.apache.spark.sql.types.BooleanType,
          "containsWords", args, returnNullable = false)),
    (FunctionIdentifier("graft_minhash_sig"), info("graft_minhash_sig"),
      (args: Seq[Expression]) =>
        StaticInvoke(graft.functions.MinHashSig.getClass,
          ArrayType(LongType, containsNull = false), "sigOfArray", args,
          returnNullable = false)),
    (FunctionIdentifier("graft_term_stats"), info("graft_term_stats"),
      (args: Seq[Expression]) =>
        StaticInvoke(graft.functions.SearchKernel.getClass,
          ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false), "termStats",
          args, returnNullable = false))
  )

  /** SQL table-valued functions: Delta tables queryable from pure SQL
    * (`SELECT * FROM graft_delta('/path')`), resolved at analysis time
    * into the reader's full distributed plan.
    */
  val tableInjections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_delta"), info("graft_delta"),
      (args: Seq[Expression]) => GraftTableFunctions.deltaPlan(args)),
    (FunctionIdentifier("graft_delta_changes"), info("graft_delta_changes"),
      (args: Seq[Expression]) => GraftTableFunctions.deltaChangesPlan(args)),
    (FunctionIdentifier("graft_delta_rows"), info("graft_delta_rows"),
      (args: Seq[Expression]) => GraftTableFunctions.deltaRowsPlan(args)),
    (FunctionIdentifier("graft_delta_history"), info("graft_delta_history"),
      (args: Seq[Expression]) => GraftTableFunctions.deltaHistoryPlan(args)),
    (FunctionIdentifier("graft_delta_detail"), info("graft_delta_detail"),
      (args: Seq[Expression]) => GraftTableFunctions.deltaDetailPlan(args)),
    (FunctionIdentifier("graft_delta_files"), info("graft_delta_files"),
      (args: Seq[Expression]) => GraftTableFunctions.deltaFilesPlan(args))
  )

  /** Register into a live session (equivalent to the extension). */
  def register(spark: SparkSession): Unit = {
    injections.foreach { case (id, fi, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
    }
    tableInjections.foreach { case (id, fi, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, fi, builder)
    }
    graft.plans.TopKRewriteRule.install(spark)
  }
}
