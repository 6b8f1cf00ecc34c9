package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination (SURVEY.md §2 B-10): remove training documents
  * that share any word n-gram with an evaluation set — the standard
  * train/eval overlap gate before pretraining.
  *
  * Scale shape: the eval shingle set is tiny against a 100 TB train corpus
  * and BROADCASTS; the train side is one narrow shingle explode + broadcast
  * join + distinct on flagged ids — the corpus itself never shuffles.
  */
object Decontaminate {

  /** Distinct `idCol` values of `train` documents sharing at least one word
    * `n`-gram with any `eval` document. */
  def contaminatedIds(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val evalShingles = eval
      .select(explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
        .as("g"))
      .distinct()
    train
      .select(col(idCol),
        explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
          .as("g"))
      .join(broadcast(evalShingles), "g")
      .select(idCol).distinct()
  }
}
