package graft.streaming

import org.apache.spark.sql.DataFrame

/** Micro-batch spreading for `foreachBatch` sinks whose upstream is a
  * file source with atomic-rename arrivals: a trigger then often
  * delivers ONE small file, and every row-local stage downstream
  * (tokenize, signatures, embedding assignment) runs as ONE task
  * until the first shuffle (VERDICT r15 #4, measured in
  * SemStreamDiag: 2.7× the batch lifecycle at sf1, 0.9× once
  * spread). The repartition is GATED on the incoming partition count
  * (ADVICE r16): a batch already carved into >= session-parallelism
  * splits gains nothing from re-spreading, and the unconditional
  * version paid a full batch-sized shuffle on exactly the wide
  * arrivals where batches are biggest.
  */
object Spread {

  /** `batch` repartitioned to the session's default parallelism iff
    * it arrives with fewer partitions than that; unchanged otherwise.
    */
  def toParallelism(batch: DataFrame): DataFrame = {
    val par = batch.sparkSession.sparkContext.defaultParallelism
    if (batch.rdd.getNumPartitions < par) batch.repartition(par) else batch
  }
}
