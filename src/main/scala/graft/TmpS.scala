package graft
object TmpS {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val (n, t) = ScalingBench.timeAt(cores, "/root/testdata/sf0.1", 20)
    println(f"PROF cores=$cores pages=$n sec=$t%.2f thr=${n / t}%.0f")
  }
}
