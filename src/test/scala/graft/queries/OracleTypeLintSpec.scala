package graft.queries

import java.nio.charset.StandardCharsets

import scala.sys.process.{Process, ProcessIO}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Standing gate against the round-8/9 failure class: an oracle SQL whose
  * output column is a DuckDB HUGEINT (bare `sum(BIGINT)`) hashes as
  * float64 on the driver while Spark emits LongType, red-lining the query
  * even though every value matches. This spec DESCRIBEs every registered
  * oracle through tools/oracle_type_lint.py and fails the build if any
  * output column is HUGEINT/UHUGEINT — so the fix (CAST(... AS BIGINT))
  * can never regress silently.
  *
  * Cancels (does not fail) when python3+duckdb are unavailable, so the
  * suite stays portable off the driver container.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def duckdbAvailable: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).! == 0
    catch { case _: Exception => false }

  test("no registered oracle emits a HUGEINT column") {
    assume(duckdbAvailable, "python3+duckdb not on this machine")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")

    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (k, v) =>
      def esc(s: String) = s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c    => c.toString
      }
      s""""${esc(k)}": "${esc(v)}""""
    }.mkString("{", ",", "}")

    val out = new StringBuilder
    val io = new ProcessIO(
      in => {
        in.write(json.getBytes(StandardCharsets.UTF_8)); in.close()
      },
      o => {
        out.append(new String(o.readAllBytes(), StandardCharsets.UTF_8))
        o.close()
      },
      e => { e.readAllBytes(); e.close() }
    )
    val p = Process(
      Seq("python3", "tools/oracle_type_lint.py", sfDir),
      new java.io.File(sys.props.getOrElse("user.dir", "."))).run(io)
    val code = p.exitValue()
    assert(code == 0, s"oracle type lint failed:\n${out.result()}")
    assert(out.result().contains("0 offending"), out.result())
  }
}
