package graft.queries

object QSimilarity extends Registry {
  def qs: Seq[Q] = Seq()
}
