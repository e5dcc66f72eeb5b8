package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank: conservation, dangling redistribution, authority ordering. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank: rank sums to 1, dangling redistributes, the hub outranks leaves") {
    // star: 1..4 all link to 0; 0 links nowhere (dangling)
    val nodes = (0L to 4L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("src", "dst")
    val out = Graph.pageRank(nodes, edges, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // total rank is conserved (dangling mass recycles, nothing leaks)
    assert(math.abs(out.values.sum - 1.0) < 1e-4, s"rank leaked: $out")
    // the linked-to hub dominates every leaf
    assert((1L to 4L).forall(i => out(0L) > out(i)), s"hub must win: $out")
    // leaves are symmetric and must tie exactly
    assert((2L to 4L).forall(i => out(i) === out(1L)))
    // a rankless graph (no edges at all): uniform ranks survive rounds
    val uni = Graph.pageRank(nodes, edges.limit(0), iters = 3)
      .collect().map(_.getDouble(1)).distinct
    assert(uni.length === 1)
    intercept[IllegalArgumentException](Graph.pageRank(nodes, edges, 0))
    intercept[IllegalArgumentException](Graph.pageRank(nodes, edges, 3, damping = 1.0))
  }
}
