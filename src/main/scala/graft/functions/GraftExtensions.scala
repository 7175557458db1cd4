package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-injectable registration of the native expressions:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * makes every `graft_*` function available to pure-SQL users of every
  * session, without any Scala call site. (Programmatic users can
  * instead call [[GraftFunctions.ensureRegistered]].)
  *
  * The injected list IS [[GraftFunctions.registry]] — one loop over the
  * single source of truth, so the SQL-extension surface can never lag
  * the programmatic surface again (rounds 1 and 2 each shipped a
  * hand-maintained gap here; GraftExtensionsSpec pins the parity).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
        builder))
    }
}
