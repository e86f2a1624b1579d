package graft.ops

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  // message tree: 1 is root; 2,3 reply to 1; 4 replies to 2;
  // 9 is an orphan (parent 99 never appears)
  private def tree = Seq(
    (1L, None: Option[Long]), (2L, Some(1L)), (3L, Some(1L)),
    (4L, Some(2L)), (9L, Some(99L)),
  ).toDF("msg_id", "parent_id")

  test("rootToNodePaths: native recursive CTE enumerates every " +
      "root-to-node path; orphans emit nothing") {
    val out = Hierarchy.rootToNodePaths(tree, "msg_id", "parent_id")
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 1, "1"), (2L, 2, "1>2"), (3L, 2, "1>3"), (4L, 3, "1>2>4")))
  }

  test("rootToLeafPaths: one row per complete branch") {
    val out = Hierarchy.rootToLeafPaths(tree, "msg_id", "parent_id")
      .as[(Long, Int, String)].collect().toSet
    // leaves are 3 and 4 (1 and 2 are referenced as parents)
    assert(out == Set((3L, 2, "1>3"), (4L, 3, "1>2>4")))
  }

  test("rootToNodePaths: multiple roots recurse independently") {
    val forest = Seq(
      (1L, None: Option[Long]), (2L, Some(1L)),
      (10L, None: Option[Long]), (11L, Some(10L)), (12L, Some(11L)),
    ).toDF("msg_id", "parent_id")
    val out = Hierarchy.rootToNodePaths(forest, "msg_id", "parent_id")
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 1, "1"), (2L, 2, "1>2"),
      (10L, 1, "10"), (11L, 2, "10>11"), (12L, 3, "10>11>12")))
  }

  test("bfsDistances: min hop wins over a longer path, depth bound " +
      "truncates, unreachable nodes absent, seed distance 0") {
    // 1 → 2 → 3 → 4 → 5 plus shortcut 1 → 3; 9 → 1 points INTO the
    // seed (unreached upstream); 7 isolated target of nothing
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
      (9L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = Hierarchy.bfsDistances(edges, seeds, maxDepth = 4)
      .as[(Long, Long)].collect().toMap
    // 3 via the shortcut is 1 hop, not 2; 9 never reached
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    val shallow = Hierarchy.bfsDistances(edges, seeds, maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    assert(shallow == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    intercept[IllegalArgumentException] {
      Hierarchy.bfsDistances(edges, seeds, maxDepth = 13)
    }
  }
}
