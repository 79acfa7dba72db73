package graft.queries

object QAggs extends Registry {
  def qs: Seq[Q] = Seq()
}
