package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for plan-shape auditing (pushdown,
  * broadcast choice, TakeOrdered, codegen spans). Planning only — no jobs. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q01_sas_keep_rename", "q02_sas_drop_where", "q11_join_broadcast",
      "q12_join_shuffle", "q13_topn", "q16_anti_semi", "q20_asof_join",
      "q30_dedup_exact", "q34_dedup_embedding", "q50_ann_brute", "q52_knn_join",
      "q48_asof_inner", "q49_asof_native", "q53_asof_broadcast", "q54_split_sample",
      "q66_dedup_corpus", "q67_tfidf_topk", "q68_funnel")
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      println(graft.SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
