package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** q54 (streaming near-dup)'s steady-state contract, the one property
  * its DuckDB oracle cannot see: a SECOND construction over the same
  * checkpoint must resume — identical rows out, and NOT ONE new file
  * appended to the external signature index (AvailableNow finds every
  * staged file committed and drains nothing; re-appending would mean
  * the "state lives in the index artifact" design re-ingests history
  * on every restart, which is exactly what a checkpoint exists to
  * prevent). */
class Q54ResumeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("second run resumes: same rows, no new index appends") {
    val q = SparkEntry.queries("q54_stream_neardup")
    val sf = "/root/testdata/sf0.001"
    val r1 = q(spark, sf).collect().toSeq
    assert(r1.nonEmpty, "the corpus has planted near-dups")

    // locate this JVM's replay root (graft_run_<pidHex>_q54_*)
    val pidHex = java.lang.Long.toHexString(ProcessHandle.current().pid())
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val root = {
      val l = Files.list(tmp)
      try l.filter(p =>
          p.getFileName.toString.startsWith(s"graft_run_${pidHex}_q54_"))
        .findFirst()
        .orElseThrow(() => new AssertionError("q54 run root not found"))
      finally l.close()
    }
    def indexFiles: Long = {
      val idx = root.resolve("out_index")
      val l = Files.walk(idx)
      try l.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
      finally l.close()
    }
    val filesAfterFirst = indexFiles
    assert(filesAfterFirst > 0, "the first run must have built the index")

    val r2 = q(spark, sf).collect().toSeq
    assert(r2 == r1, "a resumed run must return the identical result")
    assert(indexFiles == filesAfterFirst,
      "a resumed run must not re-append to the signature index")
  }
}
