package graft.text

import graft.Q

/** Text-analysis layer over `documents` (filled in below as operators
  * land): token stats, language ID, quality scoring, fingerprints,
  * shingles, minhash/simhash dedup.
  */
object TextQueries {
  def all: Seq[Q] = Seq()
}
