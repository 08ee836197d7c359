package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints a condensed physical-plan summary per query
  * and flags the things that matter at 100 TB — missing filter pushdown,
  * wide scans, non-broadcast joins of small dims, codegen gaps.
  *
  * Usage: graft.PlanCheck [sfDir] [query...]  (no queries = all)
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet else SparkEntry.queries.keySet
    val spark = GraftSession.getOrCreate("graft-plancheck")
    names.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val scans = "FileScan parquet [^\\n]*".r.findAllIn(plan).toList
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
        .findAllIn(plan).toList.groupBy(identity).view.mapValues(_.size).toMap
      val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllIn(plan).length
      val wscg = "\\*\\(\\d+\\)".r.findAllIn(plan).map(identity).toSet.size
      println(s"== $name: joins=$joins exchanges=$exchanges codegenSpans=$wscg")
      scans.foreach { s =>
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(s).getOrElse("PushedFilters: ?")
        val schema = "ReadSchema: struct<[^>]*>".r.findFirstIn(s).getOrElse("")
        val cols = "[a-z_0-9]+:".r.findAllIn(schema).length
        println(s"   scan cols=$cols $pushed")
      }
      if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
        println(s"   WARN: nested-loop/cartesian in $name")
    }
    spark.stop()
  }
}
