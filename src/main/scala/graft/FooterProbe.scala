package graft
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val files = operators.SnapshotLog.dataFiles(dir)
    println(s"files: ${files.size}")
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      files.foreach(f => operators.SnapshotLog.splitOffsetsOf(f))
      println(f"rep$r sequential: ${(System.nanoTime()-t0)/1e9}%.3f s")
      val t1 = System.nanoTime()
      operators.SnapshotLog.collectSplitOffsets(null, files)
      println(f"rep$r concurrent: ${(System.nanoTime()-t1)/1e9}%.3f s")
    }
  }
}
