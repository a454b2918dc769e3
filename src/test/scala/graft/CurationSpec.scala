package graft

import graft.functions.TextOps
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Properties of the curation pack (q83–q86): redaction completeness,
  * quota-sampling guarantees, hash-gram vs string-gram decontamination
  * parity, and packing-offset invariants. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = Curation.queries(name).fn(spark, sf)

  test("q83: no email/phone pattern survives redaction; counts follow the seed rule") {
    val rows = q("q83_pii_scrub").collect()
    assert(rows.nonEmpty)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val phone = "\\b555-[0-9]{4}\\b".r
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val clean = r.getAs[String]("clean_text")
      assert(email.findFirstIn(clean).isEmpty, s"doc $id leaks an email")
      assert(phone.findFirstIn(clean).isEmpty, s"doc $id leaks a phone")
      // the synthetic grafts are the only PII: fixture text is word salad
      assert(r.getAs[Int]("n_emails") == (if (id % 3 > 0) 1 else 0))
      assert(r.getAs[Int]("n_phones") == (if (id % 4 > 0) 1 else 0))
      assert(clean.contains("<EMAIL>") == (id % 3 > 0))
      assert(clean.contains("<PHONE>") == (id % 4 > 0))
    }
  }

  test("q84: strata at/below the 50-doc target are kept whole; none oversampled") {
    val perLang = Tables.documents(spark, sf)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("q84_quota_sample")
      .groupBy($"lang").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L)
      if (n <= 50) assert(k == n, s"$lang: small stratum must be kept whole")
      else assert(k <= n, s"$lang: sampled more than the stratum")
    }
    // deterministic: a second evaluation yields the same sample
    val a = q("q84_quota_sample").collect().map(_.getLong(0)).sorted.toSeq
    val b = q("q84_quota_sample").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("q85: hash-gram overlap counts equal string-gram overlap counts") {
    // recompute with STRING 3-grams (TextOps.shingles) — the hashed form
    // in the operator must agree exactly on this corpus
    val grams = Tables.documents(spark, sf).select($"doc_id",
      explode(array_distinct(TextOps.shingles($"text", 3))).as("g"))
    val ev = grams.filter($"doc_id" % 19 === 0).select($"g").distinct()
    val expect = grams.filter($"doc_id" % 19 =!= 0)
      .join(ev, "g").groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = q("q85_decontaminate")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got.keys.forall(_ % 19 != 0), "eval docs must not be flagged")
  }

  test("q96: bloom-prefiltered result is row-identical to exact q85") {
    val exact = q("q85_decontaminate")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = q("q96_bloom_decontaminate")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // confirm join drops every false positive; no false negatives exist —
    // any diff means the prune dropped a true match
    assert(bloomed == exact)
  }

  test("bloom prune: no false negatives, and non-members pass at ~fpp") {
    import graft.operators.Curation.{longBloom, mightContain}
    val members = spark.range(0, 5000).select(($"id" * 2).as("g"))
    val bloom = longBloom(members, "g", 5000L, fpp = 0.01)
    val memberPass = members.filter(mightContain(bloom, $"g")).count()
    assert(memberPass == 5000L, "a Bloom filter must never drop a member")
    // odd values were never inserted: pass rate must be ≈ fpp (generous
    // 5× bound so the assert can't flake on hash luck)
    val nonMembers = spark.range(0, 20000).select(($"id" * 2 + 1).as("g"))
    val fpPass = nonMembers.filter(mightContain(bloom, $"g")).count()
    assert(fpPass <= 20000 * 0.05,
      s"false-positive rate ${fpPass / 20000.0} far above the 1% build fpp")
  }

  test("q87: positions are a 1..N permutation matching the (hash, id) sort order") {
    val rows = q("q87_corpus_shuffle").collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n)
    val byPos = rows.sortBy(_.getAs[Long]("train_pos"))
    assert(byPos.map(_.getAs[Long]("train_pos")).toSeq == (1L to n).toSeq,
      "positions must be a dense 1..N permutation")
    val sorted = rows.sortBy(r =>
      (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
    assert(byPos.map(_.getAs[Long]("doc_id")).toSeq ==
      sorted.map(_.getAs[Long]("doc_id")).toSeq,
      "position order must equal the (hash, doc_id) sort order")
  }

  test("q89: verdicts are consistent and the rule chain is exercised") {
    val rows = q("q89_quality_filter").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val reasons = rows.map(_.getAs[String]("drop_reason")).toSet
    assert(reasons.subsetOf(
      Set("ok", "too_short", "repetitive", "low_stopword")))
    assert(reasons.contains("ok") && reasons.size >= 2,
      s"filter must actually split the corpus, got $reasons")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[String]("drop_reason") == "ok"))
      if (r.getAs[String]("drop_reason") == "too_short")
        assert(r.getAs[Int]("n_words") < 20)
    }
  }

  test("q86: offsets stay inside the window and docs tile each shard end-to-end") {
    val rows = q("q86_sequence_pack").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Long]("pack_offset")
      assert(off >= 0 && off < 512, s"offset $off outside [0,512)")
    }
    // within a shard, replaying docs in doc_id order reproduces every
    // (pack_id, pack_offset) from the cumulative token count
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("pack_id") ==
          (shard.toLong << Curation.PackBits) + cum / 512,
          s"shard $shard doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("pack_offset") == cum % 512)
        cum += r.getAs[Int]("n_tokens")
      }
    }
  }

  test("q86: pack namespace holds at the per-shard boundary without collisions") {
    // the former shard·10⁶ namespace overflowed at >512M tokens/shard;
    // the 2^40 namespace must keep neighboring shards disjoint right up
    // to the last pack number a shard can hold
    val lastPack = (1L << Curation.PackBits) - 1
    def packId(shard: Long, packNo: Long): Long = (shard << Curation.PackBits) + packNo
    // shard 3's final pack < shard 4's first pack: no overlap at the seam
    assert(packId(3, lastPack) < packId(4, 0))
    assert(packId(3, lastPack) == packId(4, 0) - 1)
    // 32 shards of full namespaces stay positive (no sign-bit wrap)
    assert(packId(31, lastPack) > 0 && packId(31, lastPack) == (1L << 45) - 1)
    // and the id round-trips: shard and pack number recover exactly
    assert(packId(7, 12345) >> Curation.PackBits == 7)
    assert((packId(7, 12345) & lastPack) == 12345)
  }

  test("q94: written shards match the manifest row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Curation.writeSharded(Tables.documents(spark, sf), dir)
    val back = spark.read.parquet(dir)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"),
        min($"doc_id").as("min_doc_id"), max($"doc_id").as("max_doc_id"))
    val manifest = q("q94_shard_manifest")
    assert(back.collect().map(_.toString).sorted.toSeq
      == manifest.collect().map(_.toString).sorted.toSeq)
    assert(manifest.count() == Curation.NShards)
    // every shard dir exists on disk and no doc crossed shards
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == Curation.NShards, dirs.mkString(","))
  }

  test("q94: sub-split sharded write spreads each shard over k files, manifest intact") {
    // TB-sized shards need >1 writer task: filesPerShard=k must yield
    // exactly k data files per shard dir (k parallel writers, no combo
    // collisions) while the on-disk rows still match the manifest
    val k = 3
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_k").toString
    Curation.writeSharded(Tables.documents(spark, sf), dir, filesPerShard = k)
    val back = spark.read.parquet(dir)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"),
        min($"doc_id").as("min_doc_id"), max($"doc_id").as("max_doc_id"))
    val manifest = q("q94_shard_manifest")
    assert(back.collect().map(_.toString).sorted.toSeq
      == manifest.collect().map(_.toString).sorted.toSeq)
    new java.io.File(dir).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard=")).foreach { d =>
        val files = d.listFiles().map(_.getName)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        assert(files.length == k, s"${d.getName}: ${files.length} files, want $k")
      }
  }

  test("q93: kept sizes follow sqrt shares; the smallest source is kept whole") {
    val perSource = Tables.documents(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("q93_temperature_mix")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    val nMin = perSource.values.min
    perSource.foreach { case (src, n) =>
      val k = kept.getOrElse(src, 0L)
      assert(k <= n, s"$src oversampled")
      // expectation is n·sqrt(nMin/n) = sqrt(n·nMin); the Knuth-bucket
      // sample deviates like a uniform draw — allow ±25% + small-n slack
      val expect = math.sqrt(n.toDouble * nMin)
      assert(math.abs(k - expect) <= expect * 0.25 + 10,
        s"$src kept $k vs expected ~${expect.round}")
      if (n == nMin)
        assert(k == n, s"smallest source $src must be kept whole (rate 1)")
    }
  }

  test("q109: one disposition per doc; split iff kept; eval carve-out exact") {
    val rows = q("q109_curation_pipeline").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val allowed = Set("eval", "too_short", "repetitive", "low_stopword",
      "duplicate", "contaminated", "kept")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val disp = r.getAs[String]("disposition")
      val split = Option(r.getAs[String]("split"))
      assert(allowed(disp), s"doc $id: unknown disposition $disp")
      assert((id % 19 == 0) == (disp == "eval"),
        s"doc $id: eval carve-out must be exactly doc_id % 19 == 0")
      if (disp == "kept")
        assert(split.exists(Set("train", "val", "test")),
          s"doc $id: kept doc needs a split, got $split")
      else
        assert(split.isEmpty, s"doc $id: non-kept doc carries split $split")
    }
  }
}
