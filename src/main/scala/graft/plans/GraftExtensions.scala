package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point, wired via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * [[graft.Engine.builder]]) — the canonical way to ship custom Catalyst
  * pieces without forking Spark. Currently registers:
  *
  *  - `format5_decode(binary)` → struct of the seven decoded sensor
  *    metrics ([[Format5Decode]]), NULL for invalid payloads.
  *  - `vector_dot(array<double>, array<double>)` → double
  *    ([[VectorDot]]), the codegen'd similarity inner loop.
  *  - `nfc_normalize(string)` → string ([[NfcNormalize]]), Unicode NFC
  *    with ASCII/already-normalized fast paths; same name and semantics
  *    as DuckDB's builtin.
  *  - `nibble_counts(string)` → array<int> ([[NibbleCounts]]), the
  *    one-pass hex-digit histogram behind the byte-entropy triage.
  *  - `char_class_counts(string, alphabet)` → array<int>
  *    ([[CharClassCounts]]), the generalized one-pass ASCII-alphabet
  *    histogram behind the character-entropy kernel.
  *  - the [[BoundLevenshtein]] optimizer rule: threshold comparisons of
  *    unbounded `levenshtein` rewrite to the banded early-abandon form.
  *  - the [[AsOfJoinStrategy]] planner strategy: plans the custom
  *    [[AsOfJoinNode]] logical operator into the sorted-merge
  *    [[AsOfJoinExec]] — the whole-operator (logical node + strategy +
  *    physical plan) tier of the extension ladder.
  *  - the [[GraftSqlParser]] delegating parser + [[ResolveAsOfJoin]]
  *    resolution rule: DuckDB's `ASOF [LEFT|INNER] JOIN` SQL syntax,
  *    lowered to the same [[AsOfJoinNode]] — the `injectParser` tier,
  *    letting one query text run verbatim on both engines.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BoundLevenshtein)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectResolutionRule(_ => ResolveAsOfJoin)
    ext.injectFunction((
      FunctionIdentifier("format5_decode"),
      new ExpressionInfo(
        classOf[Format5Decode].getCanonicalName,
        null,
        "format5_decode",
        "format5_decode(payload) - Decodes a 24-byte RuuviTag data-format-5 payload " +
          "into (temperature, humidity, pressure, acceleration_x/y/z, movement_counter); " +
          "NULL when the payload is not a valid format-5 frame.",
        "", "", "", "misc_funcs", "4.0.0", "", "built-in"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"format5_decode expects 1 argument (payload BINARY), got ${children.length}")
        Format5Decode(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(
        classOf[VectorDot].getCanonicalName,
        null,
        "vector_dot",
        "vector_dot(a, b) - Sequential-fold dot product of two ARRAY<DOUBLE> vectors; " +
          "NULL on length mismatch or NULL elements.",
        "", "", "", "misc_funcs", "4.0.0", "", "built-in"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vector_dot expects 2 arguments (a, b ARRAY<DOUBLE>), got ${children.length}")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[NfcNormalize].getCanonicalName,
        null,
        "nfc_normalize",
        "nfc_normalize(s) - Unicode NFC normalization of a string; identity on " +
          "ASCII and already-normalized input, NULL on NULL.",
        "", "", "", "misc_funcs", "4.0.0", "", "built-in"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"nfc_normalize expects 1 argument (s STRING), got ${children.length}")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("nibble_counts"),
      new ExpressionInfo(
        classOf[NibbleCounts].getCanonicalName,
        null,
        "nibble_counts",
        "nibble_counts(s) - 16-element array of hex-digit class counts of s " +
          "(both cases; non-hex bytes ignored), in one allocation-free pass; " +
          "NULL on NULL.",
        "", "", "", "misc_funcs", "4.0.0", "", "built-in"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"nibble_counts expects 1 argument (s STRING), got ${children.length}")
        NibbleCounts(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_class_counts"),
      new ExpressionInfo(
        classOf[CharClassCounts].getCanonicalName,
        null,
        "char_class_counts",
        "char_class_counts(s, alphabet) - per-character occurrence counts of the " +
          "pure-ASCII alphabet in s, as one array in one pass; NULL on NULL.",
        "", "", "", "misc_funcs", "4.0.0", "", "built-in"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"char_class_counts expects 2 arguments (s, alphabet STRING), got ${children.length}")
        CharClassCounts(children.head, children(1))
      }))
  }
}
