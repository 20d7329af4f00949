package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ScrubSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a", "reach me at jo.doe+x@mail.example.org or 555-867-5309 x2"),
      (2L, "a", "ssn 123-45-6789 appears once; card 4111111111111111 too"),
      (3L, "b", "server at 10.0.42.7 and 192.168.1.250 — two addresses"),
      (4L, "b", "perfectly clean text with no sensitive content at all"),
      (5L, "b", "two mails: a@b.io c@d.co plus phone 212 555 0187 end"))
      .toDF("doc_id", "src", "text")
  }

  test("redact counts on the original text and replaces every class") {
    val got = Scrub.redact(corpus, col("text"))
      .orderBy("doc_id").collect()
    // doc 1: one email, one phone (555-867-5309)
    assert(got(0).getAs[Int]("hits_email") === 1)
    assert(got(0).getAs[Int]("hits_phone") === 1)
    assert(got(0).getAs[String]("scrubbed_text")
      === "reach me at <EMAIL> or <PHONE> x2")
    // doc 2: ssn + card; the ssn class claims 123-45-6789 BEFORE the
    // card run could (declaration order), card gets the 16-digit run
    assert(got(1).getAs[Int]("hits_ssn") === 1)
    assert(got(1).getAs[Int]("hits_card") === 1)
    assert(got(1).getAs[String]("scrubbed_text")
      === "ssn <SSN> appears once; card <CARD> too")
    // doc 3: two IPv4s
    assert(got(2).getAs[Int]("hits_ipv4") === 2)
    assert(got(2).getAs[String]("scrubbed_text")
      === "server at <IP> and <IP> — two addresses")
    // doc 4: untouched — zero hits, text byte-identical
    assert(Scrub.PiiDefaults.forall(p =>
      got(3).getAs[Int](s"hits_${p.name}") === 0))
    assert(got(3).getAs[String]("scrubbed_text")
      === "perfectly clean text with no sensitive content at all")
    // doc 5: two emails, one space-separated phone
    assert(got(4).getAs[Int]("hits_email") === 2)
    assert(got(4).getAs[Int]("hits_phone") === 1)
  }

  test("scrubReport rolls up per group with docs_affected and a stable hash") {
    val rep = Scrub.scrubReport(corpus, col("src"), col("text"))
      .collect()
    assert(rep.length === 2)
    val a = rep(0); val b = rep(1)
    assert(a.getAs[String]("grp") === "a")
    assert(a.getAs[Long]("n_docs") === 2L)
    assert(a.getAs[Long]("docs_affected") === 2L)
    assert(a.getAs[Long]("hits_email") === 1L)
    assert(a.getAs[Long]("hits_ssn") === 1L)
    assert(b.getAs[Long]("n_docs") === 3L)
    // group b: docs 3 and 5 hit, doc 4 is clean
    assert(b.getAs[Long]("docs_affected") === 2L)
    assert(b.getAs[Long]("hits_ipv4") === 2L)
    // hash is deterministic: same input, same fold
    val again = Scrub.scrubReport(corpus, col("src"), col("text"))
      .collect()(0).getAs[Long]("scrubbed_hash_sum")
    assert(a.getAs[Long]("scrubbed_hash_sum") === again)
  }

  test("denylist term class composes with the PII defaults") {
    val rep = Scrub.scrubReport(corpus, col("src"), col("text"),
      Scrub.PiiDefaults :+ Scrub.ScrubPattern("term", "\\bclean\\b", "<T>"))
      .collect()
    val b = rep(1)
    assert(b.getAs[Long]("hits_term") === 1L)
    // the term hit makes doc 4 affected too
    assert(b.getAs[Long]("docs_affected") === 3L)
  }

  test("duplicate pattern names are rejected") {
    intercept[IllegalArgumentException] {
      Scrub.redact(corpus, col("text"),
        Seq(Scrub.ScrubPattern("x", "a", "<A>"),
          Scrub.ScrubPattern("x", "b", "<B>")))
    }
  }

  test("separator-grouped cards and parenthesized phones hit the defaults") {
    import spark.implicits._
    val df = Seq(
      (1L, "pay with 4111-1111-1111-1111 thanks"),
      (2L, "or spaced 5500 0000 0000 0004 form"),
      (3L, "bare 4111111111111111 run still caught"),
      (4L, "call (212) 555-0187 or (646)555-0199 today"),
      (5L, "digits 12345678901234567 are 17 long: no class claims them"))
      .toDF("doc_id", "text")
    val got = Scrub.redact(df, col("text")).orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("hits_card") === 1)
    assert(got(0).getAs[String]("scrubbed_text") === "pay with <CARD> thanks")
    assert(got(1).getAs[Int]("hits_card") === 1)
    assert(got(1).getAs[String]("scrubbed_text") === "or spaced <CARD> form")
    assert(got(2).getAs[Int]("hits_card") === 1)
    // both paren forms (with and without the space) are one phone class
    assert(got(3).getAs[Int]("hits_phone") === 2)
    assert(got(3).getAs[String]("scrubbed_text")
      === "call <PHONE> or <PHONE> today")
    // documented residue: 17+-digit runs match nothing
    assert(Scrub.PiiDefaults.forall(p =>
      got(4).getAs[Int](s"hits_${p.name}") === 0))
  }

  test("placeholders with Java replacement metacharacters are rejected") {
    intercept[IllegalArgumentException] {
      Scrub.redact(corpus, col("text"),
        Seq(Scrub.ScrubPattern("x", "a+", "<$1>")))
    }
    intercept[IllegalArgumentException] {
      Scrub.redact(corpus, col("text"),
        Seq(Scrub.ScrubPattern("x", "a+", "\\REDACTED")))
    }
  }

  test("input columns colliding with generated names are rejected") {
    val withClash = corpus.withColumn("scrubbed_text", col("text"))
    val e = intercept[IllegalArgumentException] {
      Scrub.redact(withClash, col("text"))
    }
    assert(e.getMessage.contains("scrubbed_text"))
    intercept[IllegalArgumentException] {
      Scrub.redact(corpus.withColumn("hits_email", col("doc_id")), col("text"))
    }
  }
}
