package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, SimilarityOps, TextOps}

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables(spark, sf, "documents")
  private lazy val emb = Tables(spark, sf, "embeddings")

  test("chunkDocs: full coverage, exact overlap, tail preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a" * 1000), // multi-chunk
      (2L, "b" * 256),  // exactly one chunk
      (3L, "c" * 10),   // shorter than overlap
      (4L, ""),         // empty
      (5L, "d" * 257)   // one char past a chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, "text", 256, 64)
      .select("doc_id", "chunk_id", "chunk_text")
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq }
    val texts = Map(1L -> "a" * 1000, 2L -> "b" * 256, 3L -> "c" * 10,
      4L -> "", 5L -> "d" * 257)
    texts.foreach { case (id, t) =>
      val chunks = out(id)
      // reconstruction: first chunk + each later chunk minus overlap
      val rebuilt = chunks.head +
        chunks.tail.map(_.drop(64)).mkString
      assert(rebuilt == t, s"doc $id reconstruction")
      // every chunk but the last is full-width
      chunks.dropRight(1).foreach(c => assert(c.length == 256))
      // consecutive chunks share exactly `overlap` characters
      chunks.sliding(2).foreach {
        case Seq(a, b) => assert(a.takeRight(64) == b.take(64))
        case _ =>
      }
    }
    assert(out(2L).length == 1 && out(4L).length == 1 &&
      out(5L).length == 2)
  }

  test("minhash LSH finds every exact-jaccard pair >= 0.9") {
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).size} / extra ${(lsh -- exact).size}")
  }

  test("winnowing: shared >= w+k-1 word passage guarantees a match") {
    import spark.implicits._
    // SIGMOD'03 §4 detection guarantee: with k=4, w=4 any common
    // passage of >= 7 words must share a selected fingerprint
    val passage = "the quick brown fox jumps over seven lazy dogs"
    val d = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, s"$passage unrelated trailing words here entirely"),
      (3L, "completely different text with no overlap at all " +
        "whatsoever in any window of words")).toDF("doc_id", "text")
    val fps = DedupOps.winnowFingerprints(d, "doc_id", "text", 4, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "docs sharing a 9-word passage must share a fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // density: winnowing keeps a strict subset of the gram hashes
    val grams1 = d.filter($"doc_id" === 1L)
      .select(graft.ops.TextOps.ngrams(col("text"), 4)).head.getSeq[String](0)
    assert(fps(1L).size < grams1.size)
    // pair join surfaces exactly the overlapping pair
    val pairs = DedupOps.winnowingPairs(d, "doc_id", "text", 4, 4,
      minShared = 1, maxFpDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // short documents (< w+k-1 words) fingerprint to the empty set
    val short = Seq((9L, "only five words right here")).toDF("doc_id", "text")
    val sfp = DedupOps.winnowFingerprints(short, "doc_id", "text", 4, 4)
      .head.getSeq[String](1)
    assert(sfp.isEmpty)
  }

  test("simhash: near-dup docs land closer in hamming space than random") {
    val fp = TextOps.simhash(docs, "doc_id", col("text"))
    val nearDups = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
    val nd = nearDups
      .join(fp.select(col("doc_id").as("id_a"), col("simhash").as("ha")), "id_a")
      .join(fp.select(col("doc_id").as("id_b"), col("simhash").as("hb")), "id_b")
      .select(avg(TextOps.hamming(col("ha"), col("hb"))))
      .head.getDouble(0)
    // random-pair expectation is ~SimHashBits/2 = 24
    val rnd = fp.as("x").crossJoin(fp.as("y"))
      .filter(col("x.doc_id") + 7 === col("y.doc_id"))
      .select(avg(TextOps.hamming(col("x.simhash"), col("y.simhash"))))
      .head.getDouble(0)
    // All docs draw from one small vocabulary, so even unrelated pairs are
    // correlated (mean ~14, not the 24 of independent 48-bit prints); the
    // discriminating signal is the gap between near-dups and the rest.
    assert(nd < 8, s"near-dup mean hamming was $nd")
    assert(rnd > nd + 5, s"random-pair mean hamming $rnd vs near-dup $nd")
  }

  test("LSH ANN returns a subset of true vectors with usable recall") {
    val queries = emb.filter(col("vec_id") < 5)
    val brute = SimilarityOps.bruteForceTopK(queries, emb, "vec_id",
      "embedding", 10).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimilarityOps.lshTopK(queries, emb, "vec_id", "embedding",
      10, planes = 4).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    assert(ann.nonEmpty)
    assert(recall >= 0.25, s"ANN recall $recall vs brute force")
    // every ANN hit is a real vector in the same bucket, ranked correctly
    assert(ann.forall { case (q, c) => q != c })
  }

  test("IVF ANN probes a fraction of lists yet beats random recall") {
    val queries = emb.filter(col("vec_id") < 5)
    val brute = SimilarityOps.bruteForceTopK(queries, emb, "vec_id",
      "embedding", 10).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(queries, emb, "vec_id", "embedding",
      10, nlist = 8, nprobe = 3).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (q, c) => q != c })
    // random vectors: recall tracks the scan fraction; the quantizer
    // must still beat it (and be deterministic across runs)
    assert(recall >= 0.3, s"IVF recall $recall vs brute force")
    val again = SimilarityOps.ivfTopK(queries, emb, "vec_id", "embedding",
      10, nlist = 8, nprobe = 3).select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == ivf, "IVF index must be deterministic")
  }

  test("langid predicts real languages on real sentences") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and it is warm in that house"),
      (2L, "der Hund ist nicht mit der Katze und das ist ein Problem"),
      (3L, "el perro y la casa es una historia que los vecinos saben"),
      (4L, "le chien est dans la maison et les enfants pour une heure"),
      (5L, "中文文本")).toDF("doc_id", "text")
    val out = TextOps.withLangId(samples, col("text"))
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "es"); assert(out(4L) == "fr")
    assert(out(5L) == "zh")
  }

  test("multimodal plumbing: features flow through mapPartitions batches") {
    val media = graft.ops.Multimodal.mediaFromDocuments(docs)
    val feats = graft.ops.Multimodal.extractFeatures(media, featureDim = 8)
    assert(feats.count() == docs.count())
    val r = feats.orderBy("media_id").head
    assert(r.getAs[Long]("byte_len") > 0)
    // histogram features sum to payload length
    val sums = feats.select(col("byte_len"),
      aggregate(col("feature"), lit(0.0f),
        (acc, x) => acc + x).as("fsum"))
      .filter(col("fsum").cast("long") =!= col("byte_len")).count()
    assert(sums == 0)
  }

  test("frame sampling and resize keep the multimodal batch shape") {
    val media = graft.ops.Multimodal.mediaFromDocuments(docs)
    val frames = graft.ops.Multimodal.sampleFrames(media, everyN = 10)
    // every media row contributes ceil(n_frames/10) frame rows
    val bad = frames.groupBy("media_id")
      .agg(max("n_frames").as("nf"), count(lit(1)).as("c"))
      .filter(col("c") =!= floor((col("nf") + 9) / 10).cast("long"))
    assert(bad.count() == 0)
    val feats = graft.ops.Multimodal.extractFeatures(media)
    val resized = graft.ops.Multimodal.resizeDims(feats, 256, 256)
    val wrong = resized.filter(col("out_width") > 256 ||
      col("out_height") > 256 ||
      (col("width") <= 256 && col("height") <= 256 &&
        (col("out_width") =!= col("width") ||
         col("out_height") =!= col("height")))).count()
    assert(wrong == 0)
  }

  test("contamination prefix index excludes hot train shingles") {
    import spark.implicits._
    // every train doc opens with the same stop-gram "alpha beta gamma";
    // the rest of each doc is unique filler
    val train = (0 until 40).map { i =>
      (i.toLong, ("alpha beta gamma" +: (0 until 10).map(j => s"w$i$j"))
        .mkString(" "))
    }.toDF("doc_id", "text")
    // eval 100 is a verbatim copy of train doc 5 (contaminated, c=1.0);
    // eval 101 shares ONLY the hot stop-gram (clean, c=1/12)
    val evalDocs = Seq(
      (100L, ("alpha beta gamma" +: (0 until 10).map(j => s"w5$j"))
        .mkString(" ")),
      (101L, ("alpha beta gamma" +: (0 until 10).map(j => s"z$j"))
        .mkString(" "))).toDF("doc_id", "text")
    val tDf = DedupOps.shingleIndex(train, "doc_id", "text", 3)
      .groupBy("_g").agg(count(lit(1)).as("_df"))
    val eSets = DedupOps.shingleSets(evalDocs, "doc_id", "text", 3)
      .filter(size(col("_set")) > 0)
    val prefix = DedupOps.evalPrefixIndex(tDf, eSets, 0.8).collect()
    // each eval doc has 12 shingles -> prefix length 12 - ceil(9.6) + 1 = 3
    assert(prefix.count(_.getLong(0) == 100L) == 3)
    assert(prefix.count(_.getLong(0) == 101L) == 3)
    // the hot shingle (train df = 40) must never enter the candidate index
    assert(!prefix.exists(_.getString(1) == "alpha beta gamma"))

    val out = DedupOps.contamination(train, "doc_id", "text",
      evalDocs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((100L, 5L, 1.0)))
    // the shuffle-join fallback (broadcast fenced off) agrees exactly
    val noBc = DedupOps.contamination(train, "doc_id", "text",
      evalDocs, "doc_id", "text", 3, 0.8, maxEvalBroadcastRows = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(noBc.toSeq == Seq((100L, 5L, 1.0)))
  }

  test("contamination matches brute-force containment on sf docs") {
    val d = docs
    val train = d.filter(col("doc_id") % 7 =!= 0)
    val ev = d.filter(col("doc_id") % 7 === 0)
    val got = DedupOps.contamination(train, "doc_id", "text",
        ev, "doc_id", "text", 3, 0.8)
      .select("eval_id", "train_id", "n_common").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: full-set intersect over the raw (unfiltered) index
    val tS = DedupOps.shingleSets(train, "doc_id", "text", 3)
      .select(col("_id").as("_tid"), col("_set").as("_ts"))
    val eS = DedupOps.shingleSets(ev, "doc_id", "text", 3)
      .filter(size(col("_set")) > 0)
      .select(col("_id").as("_eid"), col("_set").as("_es"))
    val want = tS.crossJoin(eS)
      .filter(col("_tid") =!= col("_eid"))
      .select(col("_eid"), col("_tid"),
        size(array_intersect(col("_ts"), col("_es"))).as("_c"),
        size(col("_es")).as("_en"))
      .filter(col("_c").cast("double") / col("_en") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet
    assert(want.nonEmpty, "sf corpus should contain planted contamination")
    assert(got == want)
  }

  test("stratified sample: deterministic, rate-accurate, salt-varying") {
    import graft.ops.SampleOps
    val d = docs
    val a = SampleOps.stratifiedSample(d, "doc_id", "source",
      Map("src0" -> 1.0), defaultRate = 0.5)
    val b = SampleOps.stratifiedSample(d, "doc_id", "source",
      Map("src0" -> 1.0), defaultRate = 0.5)
    // identical input + salt -> byte-identical selection
    assert(a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      b.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // rate 1.0 keeps every src0 row
    val n0 = d.filter(col("source") === "src0").count()
    assert(a.filter(col("source") === "src0").count() == n0)
    // default 0.5 keeps roughly half of the rest (binomial 3-sigma)
    val rest = d.filter(col("source") =!= "src0").count().toDouble
    val kept = a.filter(col("source") =!= "src0").count().toDouble
    assert(math.abs(kept - rest / 2) < 3 * math.sqrt(rest / 4) + 1,
      s"kept $kept of $rest at rate 0.5")
    // a different salt draws a different (but same-law) sample
    val c = SampleOps.stratifiedSample(d, "doc_id", "source",
      Map("src0" -> 1.0), defaultRate = 0.5, salt = "other")
    assert(c.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq !=
      a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // threshold encoding: boundaries are exact
    assert(SampleOps.thresholdHex(0.0) == "00000000")
    assert(SampleOps.thresholdHex(1.0) == "g")
    assert(SampleOps.thresholdHex(0.5) == "80000000")
  }

  test("dup clusters: transitivity across chained pairs, min keeper") {
    import spark.implicits._
    // two components: a 4-chain 1-2-3-4 (no direct 1-4 pair) and an
    // isolated pair 10-11; doc 99 is in no pair -> not emitted
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = DedupOps.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
    // non-convergence fails loudly instead of emitting partial labels
    intercept[IllegalArgumentException] {
      DedupOps.dupClusters(
        (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
          .toDF("id_a", "id_b"), maxIter = 1)
    }
  }

  test("exact dedup keeps one id per canonical text") {
    val d2 = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 100000, upper(col("text"))))
    val out = DedupOps.exact(d2, "doc_id", "text")
    assert(out.count() == docs.count()) // case-folded copies collapse
    assert(out.agg(sum("n_copies")).head.getLong(0) == 2 * docs.count())
  }

  test("repetition metrics: hand-computed document") {
    import spark.implicits._
    // words: a b a b c  -> 5 words, 3 distinct; 2-grams: "a b"x2,
    // "b a", "b c"; 3-grams all unique -> dup3 = 0
    // normalized chars = 9; top 2-gram "a b" covers 2*3=6 chars
    val d = Seq((1L, "a b a b c"), (2L, "x x x x")).toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(d, "doc_id", col("text"))
      .orderBy("doc_id").collect()
    assert(m(0).getLong(1) == 5)
    assert(math.abs(m(0).getDouble(2) - (1.0 - 3.0 / 5)) < 1e-6)
    assert(math.abs(m(0).getDouble(3) - 6.0 / 9) < 1e-6)
    assert(m(0).getDouble(4) == 0.0)
    // "x x x x": 2-gram "x x"x3 covers 9/7 (>1 by construction: the
    // occurrences overlap, Gopher counts each occurrence's chars);
    // 3-gram "x x x"x2 -> 10/7
    assert(math.abs(m(1).getDouble(3) - 9.0 / 7) < 1e-6)
    assert(math.abs(m(1).getDouble(4) - 10.0 / 7) < 1e-6)
  }

  test("semantic pairs: exact-verified subset, probed recall, loud fence") {
    val e = emb.filter(col("vec_id") < 500)
    val exact = DedupOps.embeddingCosinePairs(e, "vec_id", "embedding",
        0.45, 500L).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = DedupOps.semanticPairs(e, "vec_id", "embedding",
        0.45, nlist = 8, nprobe = 3).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((sem -- exact).isEmpty, "every semantic pair must verify")
    assert(exact.nonEmpty &&
      (sem & exact).size.toDouble / exact.size >= 0.7)
    val again = DedupOps.semanticPairs(e, "vec_id", "embedding",
        0.45, nlist = 8, nprobe = 3).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == sem, "codebook + probe must be deterministic")
    intercept[IllegalArgumentException] {
      DedupOps.semanticPairs(e, "vec_id", "embedding", 0.45,
        nlist = 2, nprobe = 1, maxClusterSize = 10L)
    }
  }

  test("next-fit packing: budget boundary, oversized doc, group reset") {
    import spark.implicits._
    // budget 200: (100,100) fill bin 0 exactly (cum+tok > b is strict);
    // 60 overflows to bin 1; the 500-token doc takes bin 2 alone; the
    // next doc then overflows again; a new group resets to bin 0
    val d = Seq(("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 60L),
      ("a", 4L, 500L), ("a", 5L, 10L), ("b", 9L, 50L))
      .toDF("g", "id", "tok")
    val out = graft.ops.PackOps
      .nextFitPack(d, "g", "id", col("tok"), 200)
      .orderBy("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(out == Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("a", 4L, 2L), ("a", 5L, 3L), ("b", 9L, 0L)))
  }

  test("exact mix draws the spec'd counts exactly, deterministically") {
    val props = Map("src0" -> 0.2, "src1" -> 0.1, "src2" -> 0.05)
    val frac = 0.5
    val nBySrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTot = nBySrc.values.sum
    def expectK(s: String): Long = math.min(
      math.round(frac * nTot * props.getOrElse(s, 0.025)), nBySrc(s))
    val out = graft.ops.SampleOps.exactMix(docs, "doc_id", "source",
      props, defaultProp = 0.025, frac = frac)
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    nBySrc.keys.foreach { s =>
      assert(got.getOrElse(s, 0L) == expectK(s),
        s"stratum $s: got ${got.getOrElse(s, 0L)}, want ${expectK(s)}")
    }
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = graft.ops.SampleOps.exactMix(docs, "doc_id", "source",
        props, defaultProp = 0.025, frac = frac)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "exact mix must be deterministic")
  }

  test("pii redaction replaces every kind and counts on the original") {
    import spark.implicits._
    val d = Seq((1L,
      "mail a.b@x.org or b@y.io, call 555-123-4567, host 10.0.0.1 end"))
      .toDF("id", "t")
    val out = d.select(
        Seq(col("id")) ++ TextOps.piiCounts(col("t")) :+
          TextOps.redactPii(col("t")).as("r"): _*).head
    assert(out.getLong(1) == 2 && out.getLong(2) == 1 && out.getLong(3) == 1)
    assert(out.getString(4) ==
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP> end")
  }
}
