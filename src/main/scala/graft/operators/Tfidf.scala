package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Document-frequency-weighted term relevance (TF-IDF family).
  *
  * Scale shape: two hash aggregations — (doc, term) term frequencies,
  * then term document frequencies — and one broadcast-sized term->df
  * table joined back (the distinct-term table is vocabulary-sized, tiny
  * next to the corpus; Spark auto-broadcasts under the threshold, AQE
  * converts at runtime otherwise). Ranking is a per-doc window top-k.
  *
  * The score is tf/df — monotone in tf × (1/df), the raw-idf variant of
  * TF-IDF. Deliberately log-free: a single double division of two ints
  * is bit-identical on every engine, so ranks oracle-match exactly;
  * swapping in tf · ln(N/df) changes only the score expression.
  */
object Tfidf {

  /** Top-k terms per document by tf/df, ties broken by term asc.
    * Output: (doc_id-named idCol, term, rank). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = docs.select(col(idCol), explode(
      TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy((col("tf").cast("double") / col("df").cast("double")).desc,
        col("term").asc)
    tf.join(broadcast(df), "term")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("rnk"))
  }
}
