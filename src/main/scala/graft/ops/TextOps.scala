package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for training-data pipelines: language ID
  * (lexicon scoring), quality scoring, token counting, document
  * fingerprinting, SimHash. All pure `functions._` compositions — fully
  * codegen'd, shuffle-free per document, linear in corpus size.
  */
object TextOps {

  /** Lowercased, whitespace-collapsed canonical form. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Scale-adaptive scan fan-out for compute-heavy map work (regex
    * normalization, shingling, minhash, langid scoring): when the
    * input arrives in fewer partitions than the session has cores —
    * the single-row-group/small-file layout, where every per-document
    * expression would otherwise run inside ONE scan task while the
    * rest of the machine idles — round-robin it across the default
    * parallelism first. At real scale a corpus scan already carries
    * (many) more splits than cores, the condition is false and the
    * plan is untouched, so this never inserts a corpus-wide shuffle
    * where the data layout already provides parallelism. The shuffle
    * it does insert moves only the raw input bytes of an
    * under-partitioned (i.e. small) scan — strictly cheaper than the
    * serial compute it unlocks.
    *
    * The partition probe reads the PLAN, not `df.rdd`: materializing
    * the RDD of an AQE plan eagerly EXECUTES every upstream exchange
    * (the broadcast id-prune join in minhashLshPairs, the langid hub's
    * scans) at DataFrame-construction time, and that work is thrown
    * away — the r21 plan goldens recorded the duplicated subtrees as
    * FileScan 8→11 / Generate 8→14 growth. The estimate mirrors
    * Spark's own FilePartition.maxSplitBytes split math over the file
    * leaves, so the decision matches what the scan would produce
    * without running anything. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = scanPartitionEstimate(df)
      // no file leaf visible (in-memory test frames): the RDD probe is
      // safe there — nothing upstream to execute eagerly
      .getOrElse(df.rdd.getNumPartitions.toLong)
    if (parts < target) df.repartition(target) else df
  }

  /** Estimated scan-task count of the plan's LARGEST file-source leaf
    * (broadcast joins keep the stream side's partitioning, so the
    * biggest scan drives the operator's parallelism). Mirrors
    * `FilePartition.maxSplitBytes`: split = min(maxPartitionBytes,
    * max(openCost, bytes/minPartitionNum)), tasks ≈ ⌈bytes/split⌉.
    * None when the plan has no file-source leaf. */
  private def scanPartitionEstimate(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
      LogicalRelation}
    val conf = df.sparkSession.sessionState.conf
    val defaultPar = df.sparkSession.sparkContext.defaultParallelism
    val openCost = conf.filesOpenCostInBytes
    val maxSplit = conf.filesMaxPartitionBytes
    val minPartNum = conf.filesMinPartitionNum.getOrElse(defaultPar)
    val ests = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        val fs = l.relation.asInstanceOf[HadoopFsRelation]
        val files = fs.location.inputFiles.length.toLong
        val bytes = fs.location.sizeInBytes + files * openCost
        val split = math.min(maxSplit,
          math.max(openCost, bytes / math.max(1, minPartNum)))
        math.max(1L, (bytes + split - 1) / math.max(1L, split))
    }
    if (ests.isEmpty) None else Some(ests.max)
  }

  /** Fixed-size character chunking with overlap (training-data prep:
    * context-window corpora feed on uniform chunks; `doc_id` + the
    * chunk index keep provenance). Chunk i covers
    * [i·step, i·step + size) with step = size − overlap;
    * nChunks = max(1, ⌈(len − overlap) / step⌉), so the tail is
    * always covered and a short document yields exactly one chunk.
    * Pure per-row explode — shuffle-free, codegen'd, linear at any
    * corpus scale; chunk width bounds per-row memory.
    * Appends `chunk_id` (LONG) and `chunk_text`. */
  def chunkDocs(df: DataFrame, textCol: String, size: Int,
      overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0,
      s"chunkDocs needs size > overlap >= 0, got ($size, $overlap)")
    val step = size - overlap
    val starts = s"sequence(0L, greatest(1L, " +
      s"CAST(length($textCol) - $overlap + ${step - 1} AS BIGINT) " +
      s"DIV $step) - 1L)"
    df.select(col("*"), posexplode(expr(
        s"transform($starts, i -> " +
          s"substring($textCol, CAST(i * $step AS INT) + 1, $size))"))
      .as(Seq("chunk_id", "chunk_text")))
      .withColumn("chunk_id", col("chunk_id").cast(LongType))
  }

  def words(text: Column): Column = split(normalize(text), " ")

  /** Word k-shingles (distinct), the dedup unit. Built by zipping k
    * shifted slices of the word array rather than `element_at` inside a
    * `transform` lambda: higher-order-function lambdas are interpreted
    * with no common-subexpression elimination, so an `element_at(w, i)`
    * body would re-run the split+regex normalization once per *element*
    * (quadratic in document length). Slices evaluate `w` a constant
    * number of times per row. Empty when the document has < k words. */
  def shingles(text: Column, k: Int = 3): Column = {
    val w = words(text)
    val len = greatest(size(w) - lit(k - 1), lit(0))
    def part(j: Int) = slice(w, lit(j + 1), len)
    array_distinct((1 until k).foldLeft(part(0))((acc, j) =>
      zip_with(acc, part(j), (a, b) => concat(a, lit(" "), b))))
  }

  /** Word n-grams WITH duplicates (same slice/zip_with builder as
    * [[shingles]] minus the distinct) — repetition metrics need the
    * multiplicity. Empty when the document has < n words. */
  def ngrams(text: Column, n: Int): Column =
    ngramsFromWords(words(text), n)

  // ---------------------------------------------------------------------
  // Repetition metrics (the Gopher-style quality rules, Rae et al. 2021
  // §A1.1, restated over the word stream since the corpus has no line
  // structure): fraction of repeated words, fraction of characters in
  // the single most frequent 2-gram, and fraction of characters covered
  // by duplicated 3-grams. High values flag boilerplate/spam documents
  // a training pipeline should drop.
  // ---------------------------------------------------------------------

  /** Per-document repetition metrics over `text`. Returns
    * (idCol, n_words, dup_word_frac, top2gram_frac, dup3gram_frac).
    *
    * Shape at scale: ONE corpus scan — the 2- and 3-grams ride a single
    * tagged explode, so the normalize+split work runs once per document
    * (a per-branch scan would re-run it 3×). Frequency counting is a
    * per-(doc, n, gram) partial-agg'd groupBy — linear, map-side
    * combined, keys carry the doc id so no skew. The per-doc reduction
    * is conditional aggregation in one more groupBy: top-1 2-gram via
    * `min(struct(-cnt, gram))` (no window), duplicated-3-gram chars via
    * a filtered sum. A sentinel element keeps sub-2-word documents in
    * the output. */
  def repetitionMetrics(df: DataFrame, idCol: String,
      text: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    // word-positional stream + codegen'd lead() grams, NOT per-element
    // array lambdas: the interpreted struct-transform form cost 3-5 s
    // on 5k docs (see PERFNOTES r13 projection-collapse trap)
    // no fanOut: the posexplode feeds a keyed window exchange one
    // operator later, which is already the parallelism boundary — the
    // extra round-robin exchange measured ~1.7x slower on the tokenize
    // stage at sf0.1
    val tok = df
      .select(id, words(text).as("_w"),
        length(normalize(text)).cast("double").as("_nc"))
      .select(id, col("_nc"), posexplode(col("_w")).as(Seq("_i", "_g1")))
    val seqw = Window.partitionBy(id).orderBy("_i")
    val w2 = lead(col("_g1"), 1).over(seqw)
    val w3 = lead(col("_g1"), 2).over(seqw)
    val tagged = tok
      .withColumn("_g2",
        when(w2.isNotNull, concat_ws(" ", col("_g1"), w2)))
      .withColumn("_g3",
        when(w3.isNotNull, concat_ws(" ", col("_g1"), w2, w3)))
      .select(id, col("_nc"), explode(array(
        struct(lit(1).as("n"), col("_g1").as("g")),
        struct(lit(2).as("n"), col("_g2").as("g")),
        struct(lit(3).as("n"), col("_g3").as("g")))).as("_e"))
      .filter(col("_e.g").isNotNull)
    val counts = tagged
      .groupBy(id, col("_e.n").as("_n"), col("_e.g").as("_g"))
      .agg(count(lit(1)).as("_c"), min(col("_nc")).as("_ncg"))
    counts.groupBy(id)
      .agg(
        min(col("_ncg")).as("_nc"),
        sum(when(col("_n") === 1, col("_c"))).cast("long")
          .as("n_words"),
        sum(when(col("_n") === 1, 1L)).cast("double").as("_ndw"),
        min(when(col("_n") === 2,
          struct((-col("_c")).as("nc"), col("_g").as("g")))).as("_top"),
        sum(when(col("_n") === 3 && col("_c") > 1,
          col("_c") * length(col("_g")))).cast("double").as("_dup3"))
      .select(id, col("n_words"),
        round(lit(1.0) - col("_ndw") /
          greatest(col("n_words").cast("double"), lit(1.0)), 6)
          .as("dup_word_frac"),
        round(coalesce((-col("_top.nc")) * length(col("_top.g")),
          lit(0)).cast("double") /
          greatest(col("_nc"), lit(1.0)), 6).as("top2gram_frac"),
        round(coalesce(col("_dup3"), lit(0.0)) /
          greatest(col("_nc"), lit(1.0)), 6).as("dup3gram_frac"))
  }

  /** n-gram builders over an already-materialized word array (keeps the
    * split from re-running once per slice). */
  private def ngramsFromWords(w: Column, n: Int): Column = {
    val len = greatest(size(w) - lit(n - 1), lit(0))
    def part(j: Int) = slice(w, lit(j + 1), len)
    (1 until n).foldLeft(part(0))((acc, j) =>
      zip_with(acc, part(j), (a, b) => concat(a, lit(" "), b)))
  }
  private def ngrams2(w: Column): Column = ngramsFromWords(w, 2)
  private def ngrams3(w: Column): Column = ngramsFromWords(w, 3)

  // ---------------------------------------------------------------------
  // PII redaction: the scrub pass a corpus runs before training. Plain
  // regexp_replace chains — codegen'd, shuffle-free; counts are taken on
  // the ORIGINAL text so the audit trail survives the scrub.
  // ---------------------------------------------------------------------
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace emails, then phone numbers, then IPv4 literals with typed
    * placeholder tags. Email runs first: its pattern is a superset
    * context for dotted tokens, and the later passes never match inside
    * an already-emitted tag (tags carry no digits). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-kind match counts on the un-redacted text. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailRe)).cast(LongType).as("n_email"),
    regexp_count(text, lit(PhoneRe)).cast(LongType).as("n_phone"),
    regexp_count(text, lit(Ipv4Re)).cast(LongType).as("n_ip"))

  // ---------------------------------------------------------------------
  // Language ID: tiny per-language lexicons of high-frequency function
  // words (the classic cheap n-gram/stopword heuristic). Deterministic:
  // ratio of lexicon hits per language, argmax with (score desc, lang asc).
  // ---------------------------------------------------------------------
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour"))

  /** Adds per-language `score_*` columns + `lang_pred`. CJK scripts are
    * detected by codepoint range first (no useful word lexicon).
    *
    * Staged through materialized columns on purpose: the word array is
    * aliased once (`_w`, referenced 5×, so CollapseProject keeps it)
    * and the argmax when-chain references score COLUMNS, not score
    * expressions — inlining the expressions would re-run the
    * split+filter up to 2^|langs| times per row (measured 3-4× on the
    * corpus bench). */
  def withLangId(df: DataFrame, text: Column): DataFrame = {
    val d1 = df.withColumn("_w", words(text))
      .withColumn("_nw", greatest(size(col("_w")), lit(1)).cast("double"))
    val d2 = lexicons.foldLeft(d1) { case (d, (lang, lex)) =>
      d.withColumn(s"score_$lang",
        (size(filter(col("_w"), t => t.isInCollection(lex))) / col("_nw"))
          .cast("double"))
    }
    val cjk =
      size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val best = lexicons.map { case (lang, _) =>
      struct(col(s"score_$lang").as("s"), lit(lang).as("l"))
    }.reduce((a, b) =>
      when(b.getField("s") > a.getField("s"), b).otherwise(a))
    d2.withColumn("lang_pred",
        when(cjk > 0, lit("zh"))
          .when(best.getField("s") > 0, best.getField("l"))
          .otherwise(lit("und")))
      .drop("_w", "_nw")
  }

  /** Column names produced by [[withLangId]]. */
  def langIdCols: Seq[String] = lexicons.map(l => s"score_${l._1}") :+
    "lang_pred"

  // ---------------------------------------------------------------------
  // Quality scoring: cheap per-document heuristics.
  // ---------------------------------------------------------------------
  def qualityColumns(text: Column): Seq[Column] = {
    val w = words(text)
    val nChars = length(text).cast("double")
    val nWords = size(w).cast("double")
    val stop = Seq("the", "and", "of", "to", "a", "in")
    val stopHits = size(filter(w, t => t.isInCollection(stop))).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    Seq(
      nWords.cast(LongType).as("n_words"),
      round(nChars / greatest(nWords, lit(1.0)), 6).as("mean_word_len"),
      round(stopHits / greatest(nWords, lit(1.0)), 6).as("stopword_ratio"),
      round(digits / greatest(nChars, lit(1.0)), 6).as("digit_ratio"),
      round(punct / greatest(nChars, lit(1.0)), 6).as("punct_ratio"))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars). */
  def tokenCounts(text: Column): Seq[Column] = Seq(
    size(words(text)).cast(LongType).as("ws_tokens"),
    size(regexp_extract_all(normalize(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast(LongType)
      .as("regex_tokens"))

  /** Content-defined fingerprint: md5 of the canonical form (md5 rather
    * than xxhash so any engine reproduces it). */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  // ---------------------------------------------------------------------
  // SimHash (48-bit): per-token hashes vote on each bit, weighted by
  // token frequency; the fingerprint packs the positive-vote bits.
  // Hamming distance <= k on the fingerprints approximates token-set
  // similarity. The per-token hash is the first 12 hex chars of md5 —
  // 48 engine-reproducible bits (any SQL engine computes the same md5,
  // so the fingerprint is oracle-checkable), clear of the sign bit.
  // ---------------------------------------------------------------------
  val SimHashBits = 48

  /** df must carry `idCol` and a text column; returns (idCol, simhash).
    * One map-side pass per document (graft.functions.SimHashFingerprint
    * — bit-identical to [[simhashViaExplode]], asserted in spec);
    * token-less documents drop out, matching the exploded form. */
  def simhash(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.select(col(idCol),
        graft.functions.NativeExpressions
          .simhashFp(words(text), SimHashBits).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The original shuffle-based lowering (explode → per-token md5 →
    * 48-way bit vote). Kept as the cross-check reference for the native
    * expression; three shuffles and a 48× row blowup make it the slow
    * path. */
  def simhashViaExplode(df: DataFrame, idCol: String,
      text: Column): DataFrame = {
    val toks = df.select(col(idCol), explode(words(text)).as("_tok"))
      .groupBy(col(idCol), col("_tok")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_h",
        conv(substring(md5(col("_tok").cast("binary")), 1, 12), 16, 10)
          .cast(LongType))
    val bits = toks.select(col(idCol), col("_h"), col("_cnt"),
        explode(sequence(lit(0), lit(SimHashBits - 1))).as("_b"))
      .withColumn("_vote",
        when(expr("shiftright(_h, CAST(_b AS INT)) & 1") === 1,
          col("_cnt")).otherwise(-col("_cnt")))
      .groupBy(col(idCol), col("_b"))
      .agg(sum(col("_vote")).as("_v"))
    bits.groupBy(col(idCol))
      .agg(sum(when(col("_v") > 0,
        expr("shiftleft(1L, CAST(_b AS INT))")).otherwise(0L))
        .as("simhash"))
  }

  /** Hamming distance between two packed fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
