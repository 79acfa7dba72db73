package graft.queries

object QDedup extends Registry {
  def qs: Seq[Q] = Seq()
}
