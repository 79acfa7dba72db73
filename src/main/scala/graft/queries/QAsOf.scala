package graft.queries

object QAsOf extends Registry {
  def qs: Seq[Q] = Seq()
}
