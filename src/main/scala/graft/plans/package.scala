package graft

/** Custom logical/physical plan nodes — deliberately empty, and the
  * emptiness is a design decision with evidence (SURVEY.md §4, §7.4):
  *
  * Every operator in the reference's capability surface lowers to plans
  * Catalyst already produces optimally, verified in PlanSpec against the
  * executed plans:
  *  - latest-wins compaction → Window + [[org.apache.spark.sql.execution.window.WindowGroupLimit]]
  *    (partial top-1 per key BEFORE the exchange — better than a naive
  *    custom operator would do without replicating that rewrite);
  *  - top-k / pagination → TakeOrderedAndProject (per-partition heaps);
  *  - facets/stats → partial+final HashAggregate;
  *  - row fetch → BroadcastHashJoin with the hit list as build side;
  *  - candidate-pair generation → Generate chains (streamed, no
  *    materialized cross product).
  *
  * Where the built-in EXECUTION (not semantics) was the bottleneck, the
  * remedy was one level down the extension ladder: a custom codegen'd
  * Expression ([[graft.functions.VecDotFloat]], ~45× over the interpreted
  * higher-order fold) — not a plan node. A custom LogicalPlan + Strategy
  * earns its complexity only when an operator's distribution/ordering
  * requirements can't be expressed through existing nodes (e.g. an as-of
  * join); nothing in this engine's surface qualifies. If that changes,
  * this package is where the node, its Rule, and its SparkStrategy land,
  * registered through [[graft.functions.GraftExtensions]].
  */
package object plans
