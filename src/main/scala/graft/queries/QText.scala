package graft.queries

object QText extends Registry {
  def qs: Seq[Q] = Seq()
}
