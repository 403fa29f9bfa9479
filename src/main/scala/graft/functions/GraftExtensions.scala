package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SparkSessionExtensions registering graft's native expressions in the
 * function registry, so the SQL surface can use them directly:
 *
 *   spark.sql("SELECT shingle_hash_set(text, 3) FROM docs")
 *
 * Enable with:
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)                       // code
 *   // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSetExpr].getName, "shingle_hash_set"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "shingle_hash_set(text, n)")
        ShingleHashSetExpr(args.head, intArg(args(1), "shingle_hash_set"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("token_hash_array"),
      new ExpressionInfo(classOf[TokenHashArrayExpr].getName, "token_hash_array"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "token_hash_array(text, bits)")
        TokenHashArrayExpr(args.head, intArg(args(1), "token_hash_array"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "minhash_signature(sset, numHashes)")
        MinHashSignature(args.head, intArg(args(1), "minhash_signature"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("simhash_fingerprint"),
      new ExpressionInfo(classOf[SimHashFingerprint].getName, "simhash_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "simhash_fingerprint(toks, bits)")
        SimHashFingerprint(args.head, intArg(args(1), "simhash_fingerprint"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGramsExpr].getName, "word_ngrams"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "word_ngrams(text, n)")
        WordNGramsExpr(args.head, intArg(args(1), "word_ngrams"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("ngram_stats"),
      new ExpressionInfo(classOf[NGramStatsExpr].getName, "ngram_stats"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "ngram_stats(text)")
        NGramStatsExpr(args.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "rolling_hash(hashes)")
        RollingHashExpr(args.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("winnowed_hashes"),
      new ExpressionInfo(classOf[WinnowedHashesExpr].getName, "winnowed_hashes"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "winnowed_hashes(text, width, rate)")
        WinnowedHashesExpr(args.head, intArg(args(1), "winnowed_hashes"),
          intArg(args(2), "winnowed_hashes"))
      }))

    // composition of builtin codegen'd RegExpReplace nodes (not a custom
    // kernel) — registered so SQL users get the same fixed redaction
    // contract as TextFunctions.redactPii
    ext.injectFunction((
      new FunctionIdentifier("redact_pii"),
      new ExpressionInfo(classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace].getName,
        "redact_pii"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "redact_pii(text)")
        import org.apache.spark.sql.catalyst.expressions.RegExpReplace
        RegExpReplace(
          RegExpReplace(args.head,
            Literal(graft.text.TextFunctions.EmailPattern), Literal("<EMAIL>")),
          Literal(graft.text.TextFunctions.LongDigitRunPattern), Literal("<ID>"))
      }))
  }
}
