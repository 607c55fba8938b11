package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo-hygiene guard: no tracked text file may reference a URL host
  * outside the public allowlist, nor carry the related contamination
  * classes the round scanner greps for (non-public-TLD hostnames,
  * mirror-style artifact hosts, cloud bucket URIs, chat archive links,
  * bearer-shaped secrets). Everything in this repo derives from public
  * knowledge (the Spark API, the public reference repo, published
  * papers); any such token is a contamination bug whatever its content.
  * This pins the class of violation fixed in round 15 (an internal
  * mirror URL quoted into a committed doc) AND its neighbors, so none
  * can recur silently. The repo root comes from `git rev-parse` against
  * user.dir — the guard follows the checkout, not a hardcoded path.
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

  private lazy val repoRoot: java.io.File = {
    import scala.sys.process._
    val cwd = new java.io.File(sys.props("user.dir"))
    val top = Process(Seq("git", "rev-parse", "--show-toplevel"), cwd).!!.trim
    assert(top.nonEmpty, "git rev-parse returned no repo root — guard can't run")
    new java.io.File(top)
  }

  private def trackedTextFiles(): Seq[(String, String)] = {
    import scala.sys.process._
    val files = Process(Seq("git", "ls-files"), repoRoot).!!.linesIterator.toSeq
    assert(files.nonEmpty, "git ls-files returned nothing — guard can't run")
    files.flatMap { f =>
      val ext = f.substring(f.lastIndexOf('.') + 1).toLowerCase
      val p = repoRoot.toPath.resolve(f)
      if (!textExt.contains(ext) || !java.nio.file.Files.isRegularFile(p)) Nil
      else Seq(f -> new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    }
  }

  test("tracked files reference only public allowlisted URL hosts") {
    val urlHost = "https?://([A-Za-z0-9._-]+)".r
    val offenders = trackedTextFiles().flatMap { case (f, body) =>
      urlHost.findAllMatchIn(body).map(_.group(1).toLowerCase).distinct
        .filterNot(allowedHosts.contains)
        .map(h => s"$f -> $h")
    }
    assert(offenders.isEmpty,
      s"non-allowlisted URL hosts in tracked files:\n${offenders.mkString("\n")}")
  }

  test("no bare internal-looking hostnames, bucket URIs, chat links, or secrets") {
    // The round-15 leak was a URL; these are its URL-LESS neighbors —
    // each pattern names a contamination CLASS without embedding any
    // actual internal name (this file must not itself become a hit):
    //  - dotted hostnames under TLD suffixes that only resolve on
    //    private networks (mirror/infra naming, never public docs)
    //  - artifact-mirror-style hosts (artifactory/nexus/jfrog subdomain
    //    with >= 3 labels) under ANY TLD
    //  - cloud bucket URIs (an engine built on local parquet + public
    //    APIs has no business naming anyone's bucket)
    //  - chat-archive deep links
    //  - bearer-shaped secret tokens (prefix sk- followed by a vendor
    //    word and a long base64ish tail)
    val classes: Seq[(String, scala.util.matching.Regex)] = Seq(
      "private-tld-host" ->
        "(?i)\\b[a-z0-9][a-z0-9-]*(?:\\.[a-z0-9-]+)+\\.(?:internal|corp|intranet|lan|private)\\b".r,
      "artifact-mirror-host" ->
        "(?i)\\b(?:artifactory|nexus|jfrog)\\.[a-z0-9-]+(?:\\.[a-z0-9-]+)+\\b".r,
      "bucket-uri" -> "(?i)\\b(?:s3|gs|s3a|s3n|abfss?)://[a-z0-9._-]+".r,
      "chat-archive-link" -> "(?i)slack\\.com/archives/[A-Z0-9]+".r,
      "secret-token" -> "\\bsk-[a-z]{2,10}-[A-Za-z0-9_-]{24,}\\b".r)
    // two allowlisted paths: this spec legitimately spells the pattern
    // strings themselves, and LEAKCHECK.json is the DRIVER'S own scan
    // report — it quotes immutable git history (the round-14-era
    // violation) verbatim, which is the finding, not a new leak
    val allow = Set("src/test/scala/graft/LeakHygieneSpec.scala",
      "LEAKCHECK.json")
    val offenders = trackedTextFiles().filterNot(t => allow(t._1)).flatMap {
      case (f, body) =>
        classes.flatMap { case (cls, re) =>
          re.findFirstIn(body).map(hit => s"$f [$cls] -> $hit")
        }
    }
    assert(offenders.isEmpty,
      s"internal-looking tokens in tracked files:\n${offenders.mkString("\n")}")
  }
}
