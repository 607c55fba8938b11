package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo-hygiene guard: no tracked text file may reference a URL host
  * outside the public allowlist. Everything in this repo derives from
  * public knowledge (the Spark API, the public reference repo, published
  * papers); a URL pointing anywhere else — a private mirror, an internal
  * artifact host — is a contamination bug whatever its content. This
  * pins the class of violation fixed in round 15 (an internal mirror URL
  * quoted into a committed doc) so it cannot recur silently.
  */
class LeakHygieneSpec extends AnyFunSuite {

  private val allowedHosts = Set(
    "github.com", "raw.githubusercontent.com",
    "spark.apache.org", "www.apache.org", "apache.org",
    "repo1.maven.org", "www.scala-lang.org", "scala-lang.org",
    "www.scala-sbt.org", "duckdb.org", "arxiv.org",
    "example.com", "localhost", "127.0.0.1")

  private val textExt =
    Set("scala", "sbt", "sh", "py", "md", "json", "yml", "yaml", "txt", "conf")

  test("tracked files reference only public allowlisted URL hosts") {
    import scala.sys.process._
    val files = Process(Seq("git", "ls-files"), new java.io.File("/root/repo"))
      .!!.linesIterator.toSeq
    assert(files.nonEmpty, "git ls-files returned nothing — guard can't run")
    val urlHost = "https?://([A-Za-z0-9._-]+)".r
    val offenders = files.flatMap { f =>
      val ext = f.substring(f.lastIndexOf('.') + 1).toLowerCase
      val p = java.nio.file.Paths.get("/root/repo", f)
      if (!textExt.contains(ext) || !java.nio.file.Files.isRegularFile(p)) Nil
      else {
        val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        urlHost.findAllMatchIn(body).map(_.group(1).toLowerCase).distinct
          .filterNot(allowedHosts.contains)
          .map(h => s"$f -> $h").toList
      }
    }
    assert(offenders.isEmpty,
      s"non-allowlisted URL hosts in tracked files:\n${offenders.mkString("\n")}")
  }
}
