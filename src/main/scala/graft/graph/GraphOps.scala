package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-iterative graph statistics over ordered edge lists (the
  * near-dup pair convention: one row per undirected edge with
  * `id_a < id_b`).
  */
object GraphOps {

  /** Exact triangle count: the standard ordered 3-way self-join —
    * a triangle {a < b < c} is counted exactly once as
    * (a,b) ⋈ (b,c) ⋈ (a,c), so no division by 6 and no orientation
    * bookkeeping. Input rows where `id_a < id_b` does not hold (or
    * either side is NULL) are normalized/dropped first, and duplicate
    * edges collapse.
    *
    * Scale shape: two hash equi-joins on edge endpoints. The classic
    * skew caveat applies — a hub vertex of degree d contributes
    * O(d²) candidate wedges; for dup-graph reporting (bounded cluster
    * sizes by construction) that is immaterial, for social-scale
    * graphs shard the wedge build by the lower-degree endpoint.
    */
  def triangleCount(pairs: DataFrame, aCol: String = "id_a",
                    bCol: String = "id_b"): Long = {
    val e = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull && col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .distinct()
      .localCheckpoint()
    val ab = e
    val bc = e.select(col("a").as("b"), col("b").as("c"))
    val ac = e.select(col("a"), col("b").as("c"))
    ab.join(bc, "b").join(ac, Seq("a", "c")).count()
  }
}
