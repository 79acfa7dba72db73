package graft.queries

object QWindows extends Registry {
  def qs: Seq[Q] = Seq()
}
