package graft.vec

import graft.Q

/** Embedding/similarity layer over `embeddings`: norms, brute-force
  * cosine top-k, LSH bucketing, label centroids.
  */
object VectorQueries {
  def all: Seq[Q] = Seq()
}
