package graft.queries

object QMultimodal extends Registry {
  def qs: Seq[Q] = Seq()
}
