package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard (exact pairwise via inverted index), MinHash+LSH
  * (banded candidate generation + exact verification), and
  * embedding-cosine near-duplicates.
  *
  * Scale design: everything that can be computed per-document is a
  * map-side array expression (shingle sets, minhash signatures, LSH band
  * hashes, quantized vectors) — zero shuffle, fully codegen'd. The only
  * shuffles are the bucket groupBys, whose keys are bounded (shingles,
  * band hashes). Hot buckets are the standard risk at 100 TB; the
  * `maxShingleDf` cap drops stop-shingles, and MinHash+LSH replaces the
  * quadratic verify set with banded buckets, which is the scale path.
  */
object DedupOps {

  /** Exact dedup on the canonical text: keeps the smallest id per group.
    * No fanOut here: the normalize+partial-agg is light enough that the
    * extra round-robin exchange measured SLOWER warm (0.4-0.5 s raw vs
    * 0.75-0.9 s fanned at sf0.1) — the groupBy's own exchange is the
    * parallelism boundary. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.normalize(col(textCol)).as("_canon"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("_canon")

  /** Map-side (id, distinct k-shingle set). Documents with fewer than k
    * words get an empty set — downstream explodes drop them, and a
    * `filter(size > 0)` here would be pushed below the projection and
    * make every scan evaluate the shingle expression twice. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    TextOps.fanOut(docs)
      .select(col(idCol).as("_id"), TextOps.shingles(col(textCol), k).as("_set"))

  /** Exploded inverted index of (id, shingle) rows — already distinct
    * because the per-doc shingle array is. Optionally drops shingles
    * occurring in more than `maxShingleDf` documents (hot-key cap). */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, k)
      .select(col("_id"), explode(col("_set")).as("_g"))
    maxShingleDf match {
      case Some(cap) =>
        val hot = sh.groupBy("_g").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > cap).select("_g")
        sh.join(hot, Seq("_g"), "left_anti")
      case None => sh
    }
  }

  /** All ordered pairs (ids(i), ids(j)), i < j, from a sorted id array —
    * the bucket-local pair expansion used instead of a self-join. */
  private[ops] def pairCombos(ids: Column): Column =
    flatten(transform(sequence(lit(1), size(ids) - 1), i =>
      transform(slice(ids, i + 1, size(ids) - i),
        b => struct(element_at(ids, i).as("id_a"), b.as("id_b")))))

  /** Exact n-gram Jaccard similarity for all pairs meeting `threshold`,
    * via prefix filtering (the PPJoin family's candidate bound): a pair
    * with J(A,B) >= t must share a shingle among the first
    * `|X| - ceil(t*|X|) + 1` shingles of each side under ANY global
    * total order. Ordering rarest-first (document frequency asc) makes
    * the indexed buckets the RARE shingles — stop-shingle buckets,
    * which hold ~every document and made the old full-index pair
    * expansion quadratic in corpus size, never enter the index. Exact:
    * candidate generation can only over-approximate; every candidate
    * pair is verified against its true shingle sets. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // sets feed the prefix index AND the verify join — persist, or the
    // shingle split re-runs per consumer (same contract as the LSH path:
    // lives until session end / LRU eviction)
    val sets = shingleSets(docs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = sets.filter(size(col("_set")) > 0)
      .select(col("_id"), size(col("_set")).as("_n"),
        explode(col("_set")).as("_g"))
    // global shingle document frequency: partial-agg'd map-side, output
    // is one row per DISTINCT shingle
    val dfreq = idx.groupBy("_g").agg(count(lit(1)).as("_df"))
    // rarest-first rank within each document; (_df, _g) is a total order
    val prefixLen = col("_n") - ceil(col("_n") * threshold) + 1
    val ranked = idx.join(dfreq, "_g")
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_id")).orderBy(col("_df"), col("_g"))))
      .filter(col("_r") <= prefixLen)
    // bucket members carry their set size so the PPJoin LENGTH filter
    // prunes before verification: J(A,B) >= t forces
    // least(|A|,|B|) / greatest(|A|,|B|) >= t. The division mirrors the
    // verify arithmetic exactly, so the bound is a true superset.
    //
    // They also carry the token's global-order rank `_r` for the PPJoin
    // POSITIONAL filter: J(A,B) >= t forces the overlap
    // o >= ceil(t/(1+t) * (|A|+|B|)), and at the pair's SMALLEST common
    // token g0 every common token ranks >= r(g0) on both sides, so
    // o <= 1 + min(|A|-r_a, |B|-r_b). g0 itself is guaranteed inside
    // both prefixes (o >= t*|A| by the length filter, so the common
    // tokens cannot all hide in the last ceil(t*|A|)-1 positions), so
    // the surviving-in-any-bucket rule keeps every true pair while the
    // bound prunes single-shared-rare-shingle coincidences — measured
    // 43,543 -> 12,784 candidate pairs at sf0.1/t=0.8 before the exact
    // verify. The 1e-9 slack guards the double ceil against FP
    // round-up; candidates only over-approximate, the verify is exact.
    val minOverlap = ceil((col("_na") + col("_nb")).cast("double") *
      lit(threshold / (1.0 + threshold)) - lit(1e-9))
    val cands = ranked.groupBy("_g")
      .agg(sort_array(collect_list(struct(col("_id"), col("_n"),
        col("_r")))).as("_members"))
      .filter(size(col("_members")) > 1)
      .select(explode(pairCombos(col("_members"))).as("_p"))
      .select(col("_p.id_a").getField("_id").as("id_a"),
        col("_p.id_a").getField("_n").as("_na"),
        col("_p.id_a").getField("_r").as("_ra"),
        col("_p.id_b").getField("_id").as("id_b"),
        col("_p.id_b").getField("_n").as("_nb"),
        col("_p.id_b").getField("_r").as("_rb"))
      .filter(least(col("_na"), col("_nb")).cast("double") /
        greatest(col("_na"), col("_nb")) >= threshold)
      .filter(lit(1) + least(col("_na") - col("_ra"),
        col("_nb") - col("_rb")) >= minOverlap)
      .select(col("id_a"), col("id_b"))
      .distinct()
    verifyJaccard(cands, sets, threshold)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003
    * §4 — the MOSS local fingerprinting algorithm): hash every
    * positional word k-gram, slide a window of `w` consecutive
    * hashes, keep each window's minimum — any shared passage of
    * `w + k - 1` or more words is GUARANTEED to share a fingerprint,
    * with ~2/(w+1) of the grams retained. The hash is md5 compared
    * lexicographically (order is all winnowing needs, and md5 exists
    * verbatim in the oracle engine). Map-side per document: the gram
    * hashes materialize once per row, windows slice that array —
    * zero shuffles until the fingerprint index aggregates. Documents
    * shorter than w+k-1 words fingerprint to the empty set. */
  def winnowFingerprints(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 4, w: Int = 4): DataFrame =
    winnowingIndex(docs, idCol, textCol, k, w)
      .groupBy("_id").agg(collect_set(col("_fp")).as("_fps"))
      .join(docs.select(col(idCol).as("_id")), Seq("_id"), "right")
      .select(col("_id"),
        coalesce(col("_fps"), array().cast("array<string>")).as("_fps"))

  /** Distinct (doc, fingerprint) rows. The gram hashes explode to a
    * positional stream FIRST, then a codegen'd sliding-frame window
    * min selects each w-window's minimum — NOT a per-window array
    * slice: Catalyst's projection collapse would inline the whole
    * normalize→split→gram→md5 pipeline into every window element of
    * an array-lambda form, going quadratic in document length (the
    * r13 bench caught exactly that at 87 s on 5k docs). One shuffle
    * on the doc id, linear work per gram. */
  def winnowingIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    val grams = TextOps.fanOut(docs).select(col(idCol).as("_id"),
      posexplode(TextOps.ngrams(col(textCol), k)).as(Seq("_i", "_g")))
    val h = grams.select(col("_id"), col("_i"),
      md5(col("_g").cast("binary")).as("_h"))
    val sw = Window.partitionBy("_id").orderBy("_i")
      .rowsBetween(Window.currentRow, w - 1)
    val per = Window.partitionBy("_id")
    h.withColumn("_fp", min(col("_h")).over(sw))
      .withColumn("_mi", max(col("_i")).over(per))
      .filter(col("_i") <= col("_mi") - (w - 1))
      .select(col("_id"), col("_fp")).distinct()
  }

  /** Document pairs sharing at least `minShared` winnowing
    * fingerprints — the copy/plagiarism-detection join. One groupBy
    * on the fingerprint expands each bucket's sorted id list into
    * pairs; buckets larger than `maxFpDf` are boilerplate
    * fingerprints (present in ~every doc) and are dropped BEFORE
    * pair expansion, bounding any bucket's output at maxFpDf² — the
    * hot-key fence the 100 TB path needs. */
  def winnowingPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Int = 2,
      maxFpDf: Int = 50): DataFrame = {
    val idx = winnowingIndex(docs, idCol, textCol, k, w)
    idx.groupBy("_fp")
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")).between(2, maxFpDf))
      .select(explode(pairCombos(col("_ids"))).as("_p"))
      .groupBy(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** MinHash signatures as a map-side native expression (see
    * [[graft.functions.MinHashSignature]]): one pass over the word
    * array per document, zero shuffles, null when the document has
    * fewer than k words. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32): DataFrame =
    TextOps.fanOut(docs).select(col(idCol).as("_id"),
      graft.functions.NativeExpressions
        .minhashSig(TextOps.words(col(textCol)), k, numHashes).as("_sig"))

  /** LSH candidate pairs from (_id, _sig) rows: hash each band slice
    * map-side, then one groupBy on (band, bandHash) expands each bucket's
    * sorted id list into pairs. Null signatures drop out before the
    * explode. */
  def lshCandidates(sigs: DataFrame, numHashes: Int = 32,
      bands: Int = 16): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — a zero or " +
        "truncated band width would collide everything into one bucket")
    val rows = numHashes / bands
    val banded = sigs.select(col("_id"),
        explode(when(col("_sig").isNotNull,
          transform(sequence(lit(0), lit(bands - 1)), b =>
            struct(b.as("_band"),
              hash(b, slice(col("_sig"), b * rows + 1, lit(rows)))
                .as("_bh"))))).as("_bb"))
      .select(col("_id"), col("_bb._band").as("_band"), col("_bb._bh").as("_bh"))
    banded.groupBy("_band", "_bh")
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")) > 1)
      .select(explode(pairCombos(col("_ids"))).as("_p"))
      .select(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against the map-side
    * shingle sets (callers should pass sets pruned to the candidate ids
    * — see [[minhashLshPairs]] — so shingles are only rebuilt for the
    * tiny near-dup subset, not the whole corpus). */
  def verifyJaccard(cands: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(sets.select(col("_id").as("id_a"), col("_set").as("_sa")), "id_a")
      .join(sets.select(col("_id").as("id_b"), col("_set").as("_sb")), "id_b")
      .withColumn("_c", size(array_intersect(col("_sa"), col("_sb"))))
      .withColumn("jaccard", col("_c").cast("double") /
        (size(col("_sa")) + size(col("_sb")) - col("_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Eval-side prefix index for [[contamination]]: for each eval doc,
    * the `|E| - ceil(t*|E|) + 1` shingles that are RAREST in the train
    * corpus (train document frequency asc, shingle asc as tiebreak;
    * shingles absent from train rank first — they generate zero
    * candidates and only tighten the bound). Soundness is the PPJoin
    * pigeonhole: a train doc with containment >= t misses at most
    * `|E| - ceil(t*|E|)` of E's shingles, so it shares at least one
    * shingle with ANY subset of that size + 1 — in particular this
    * prefix. Choosing the train-rarest shingles keeps hot stop-grams
    * (present in ~every train doc, the 100 TB join-blowup key) out of
    * the candidate join entirely unless an eval doc is made of almost
    * nothing else. `tDf` is the train shingle document-frequency table
    * (`_g`, `_df`); the join on `_g` reuses its groupBy partitioning,
    * so only the tiny eval index shuffles. */
  private[graft] def evalPrefixIndex(tDf: DataFrame, eSets: DataFrame,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eIdx = eSets.select(col("_id").as("_eid"),
      size(col("_set")).as("_en"), explode(col("_set")).as("_g"))
    val prefixLen = col("_en") - ceil(col("_en") * threshold) + 1
    eIdx.join(tDf, Seq("_g"), "left")
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_eid"))
          .orderBy(coalesce(col("_df"), lit(0L)), col("_g"))))
      .filter(col("_r") <= prefixLen)
      .select(col("_eid"), col("_g"))
  }

  /** Train/eval decontamination (the GPT-3-style n-gram overlap
    * check a training pipeline runs before holding out an eval set):
    * for each eval document, every train document whose word-k-gram
    * set covers >= `threshold` of the eval doc's k-grams.
    * Containment `|T ∩ E| / |E|` is asymmetric by design: a 100-word
    * eval prompt quoted inside a 10k-word train doc must flag.
    *
    * Scale shape: the train side stays an exploded map-side inverted
    * index (never collected, never crossed). Candidates come from
    * joining it against only the [[evalPrefixIndex]] — the
    * train-RAREST fraction of each eval doc's shingles — so a hot
    * stop-gram shared by ~every train doc never becomes a join key;
    * without the prefix the per-shingle intermediate is
    * |train ∋ g| × |eval ∋ g| rows, a many-trillion-row skewed
    * exchange at 100 TB. Exactness is preserved because candidates
    * only over-approximate (PPJoin pigeonhole, see
    * [[evalPrefixIndex]]) and every candidate verifies `n_common`
    * against the FULL shingle sets — fetched for the candidate train
    * docs only. The eval side broadcasts when its exploded
    * index is small (auto-falls back to a shuffle join above
    * `maxEvalBroadcastRows` — an eval suite is tiny next to a 100 TB
    * corpus, but a mis-sized one must not broadcast-OOM). */
  /** `excludeSameId` drops (train, eval) pairs with EQUAL ids — the
    * self-match guard for decontaminating a corpus against a held-out
    * slice of ITSELF (an eval doc must not flag its own train copy of
    * the same row). Set it false when train and eval are distinct
    * corpora whose id spaces may collide: there, train id 7 quoting
    * eval id 7 is true contamination, not a self-match. */
  def contamination(train: DataFrame, trainId: String, trainText: String,
      evalDocs: DataFrame, evalId: String, evalText: String,
      k: Int = 3, threshold: Double = 0.8,
      broadcastEval: Boolean = true,
      maxEvalBroadcastRows: Long = 4000000L,
      excludeSameId: Boolean = true): DataFrame = {
    // train sets feed the inverted index (twice: document frequency +
    // candidate join) AND the exact verify — persist so the text is
    // shingled once, not three times (same lifecycle contract as the
    // other dedup ops: session end / LRU, spills to disk at scale)
    val tSets = shingleSets(train, trainId, trainText, k)
      .filter(size(col("_set")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tIdx = tSets.select(col("_id"), explode(col("_set")).as("_g"))
    // eval sets feed the prefix index AND the exact verify — persist,
    // same lifecycle contract as the other dedup ops (session end / LRU)
    val eSets = shingleSets(evalDocs, evalId, evalText, k)
      .filter(size(col("_set")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalIdxRows = eSets
      .agg(coalesce(sum(size(col("_set"))), lit(0L))).first().getLong(0)
    val bcast = broadcastEval && evalIdxRows <= maxEvalBroadcastRows
    val hint: DataFrame => DataFrame = d => if (bcast) broadcast(d) else d
    // train shingle document frequency: partial-agg'd, one row per
    // DISTINCT shingle; downstream joins on _g reuse its partitioning
    val tDf = tIdx.groupBy("_g").agg(count(lit(1)).as("_df"))
    val cands0 = tIdx.join(hint(evalPrefixIndex(tDf, eSets, threshold)),
        Seq("_g"))
    val cands = (if (excludeSameId)
        cands0.filter(col("_id") =!= col("_eid")) else cands0)
      .select(col("_eid"), col("_id")).distinct()
    // exact verify: pull full shingle sets ONLY for candidate train docs
    // (broadcast the tiny id set so the persisted sets are filtered, not
    // shuffled)
    val candTrainIds = cands.select(col("_id")).distinct()
    val tCand = tSets.join(broadcast(candTrainIds), Seq("_id"))
    cands
      .join(tCand.select(col("_id"), col("_set").as("_ts")), Seq("_id"))
      .join(hint(eSets.select(col("_id").as("_eid"),
        col("_set").as("_es"), size(col("_set")).as("_en"))), Seq("_eid"))
      .withColumn("n_common",
        size(array_intersect(col("_ts"), col("_es"))).cast(LongType))
      .withColumn("containment",
        round(col("n_common").cast("double") / col("_en"), 6))
      .filter(col("containment") >= threshold)
      .select(col("_eid").as("eval_id"), col("_id").as("train_id"),
        col("n_common"), col("containment"))
  }

  /** Full MinHash+LSH near-dup pipeline: banded candidates, then exact
    * Jaccard verification at `threshold`. With 32 hashes / 16 bands the
    * probability of missing a pair at j>=0.9 is ~(1-j^2)^16 ≈ 1e-11. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.9, numHashes: Int = 32,
      bands: Int = 16): DataFrame = {
    // persist the (tiny) candidate set: it feeds both the id-prune branch
    // and the verify join, and without materialization each branch would
    // recompute the whole signature pipeline. The cache lives until
    // session end / LRU eviction — callers running many corpora per
    // session should unpersist via their own handle on the result.
    val cands = lshCandidates(
      minhashSignatures(docs, idCol, textCol, k, numHashes), numHashes,
      bands).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // re-shingle only the docs named by some candidate pair: filter the
    // raw docs by id first (broadcast the tiny id set, so the corpus is
    // NOT shuffled — size estimation can't see through the persist, and
    // an unhinted plan sort-merge-joins the whole corpus), then shingle.
    // candSets feeds verifyJaccard TWICE (the id_a and id_b joins);
    // without its own persist each reference re-filters + re-shingles —
    // a THIRD full corpus scan. With both persists the corpus is read
    // exactly twice: signatures, and the candidate re-shingle.
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    val candSets = shingleSets(docs.join(broadcast(candIds), idCol),
        idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifyJaccard(cands, candSets, threshold)
  }

  /** Connected components over near-duplicate pairs — the step that
    * turns a pair list (from [[ngramJaccardPairs]] /
    * [[minhashLshPairs]]) into an actionable keeper decision:
    * transitive near-dups form one cluster, and every member maps to
    * the cluster's smallest id (`keep_id`). A doc in no pair keeps
    * itself and is not emitted.
    *
    * Hash-to-min label propagation, ONE hop per materialized round:
    * each round every node adopts the minimum label among (self,
    * neighbours), so diameter+1 rounds — and near-dup clusters are
    * shallow (a verbatim-copy cluster has diameter 1-2, so 2-3 rounds
    * total). A two-hop variant was tried and reverted: its
    * intermediate frame is referenced twice in the round's plan, so
    * without an extra materialization the edges join+agg subtree
    * evaluates ~3x per round — costlier than the extra shallow round
    * it saves. Scale shape: the edge list is the PAIR set, orders of
    * magnitude smaller than the corpus; each round is one partial-
    * agg'd shuffle join on it, a single materializing job; the driver
    * sees one changed-count per round, never rows. Bounded by
    * `maxIter` with a loud error, not a silent partial answer. */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // ONE scan of the pair lineage: a union of (fwd, reversed) branches
    // would evaluate the upstream pair GENERATION twice per
    // materialization — for ngramJaccardPairs input that is the whole
    // PPJoin candidate+verify stage re-run (r14 driver flagged exactly
    // this as the dedup_clusters regression). explode emits both
    // directions from a single pass instead.
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .persist(lvl)
    // Eager localCheckpoint per round, NOT persist: persist caches
    // blocks but the logical plan still accumulates one join+agg layer
    // per iteration, so analysis/AQE overhead grows superlinearly with
    // rounds. Checkpointing truncates lineage — every round plans
    // against a constant-size tree. Superseded checkpoint blocks are
    // reclaimed by the ContextCleaner once the frame is unreferenced.
    var labels = edges.select(col("src").as("_id")).distinct()
      .withColumn("_lab", col("_id"))
      .localCheckpoint()
    try {
      val labType = labels.schema("_lab").dataType
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        // one min-propagation hop: neighbour messages from a single
        // edges join against the checkpointed labels (constant-size
        // plan every round)
        val msgs = edges
          .join(labels.withColumnRenamed("_id", "src"), Seq("src"))
          .select(col("dst").as("_id"), col("_lab"))
        // one aggregation yields BOTH the new label (min of self and
        // neighbour messages) and the previous one (each id
        // contributes exactly one non-null _cur row), so convergence
        // needs no second join — and the checkpoint is LAZY so the
        // changed-count action below is the round's ONLY job: it
        // computes the aggregation once, caches the blocks under the
        // localCheckpoint contract (lineage still truncated for the
        // next round's plan), and returns the count. The eager form
        // cost a second driver job per round just to rescan the
        // freshly cached blocks.
        val next = labels
          .select(col("_id"), col("_lab"), col("_lab").as("_cur"))
          .union(msgs.select(col("_id"), col("_lab"),
            lit(null).cast(labType).as("_cur")))
          .groupBy("_id")
          .agg(min(col("_lab")).as("_lab"), max(col("_cur")).as("_old"))
          .localCheckpoint(eager = false)
        val changed = next.filter(col("_lab") =!= col("_old")).count()
        labels = next.select(col("_id"), col("_lab"))
        converged = changed == 0
        iter += 1
      }
      if (!converged)
        throw new IllegalArgumentException(
          s"dupClusters did not converge in $maxIter rounds — " +
            "component diameter exceeds the bound; raise maxIter")
      labels.select(col("_id").as("doc_id"), col("_lab").as("keep_id"))
    } finally edges.unpersist()
  }

  // -------------------------------------------------------------------
  // Embedding near-dup: exact integer dot products, fully map-side.
  // -------------------------------------------------------------------

  /** Long-quantized vector: component → DECIMAL(12,6) → 1e6-scaled Long.
    * Dot products become exact integer arithmetic: for unit-ish 64-dim
    * vectors the accumulated sum stays below 2^45 — far inside both Long
    * range and double-exactness (2^53) — so `microDot` reproduces the
    * oracle's exact-decimal sum bit-for-bit on any engine. */
  def microVec(vec: Column): Column =
    transform(vec, x =>
      (x.cast("double").cast(DecimalType(12, 6)) * lit(1000000)).cast(LongType))

  /** Exact dot product of two micro-vectors, rescaled to double. The
    * kernel is a native codegen'd Catalyst expression — the interpreted
    * `aggregate(zip_with(...))` higher-order form costs ~10× more in
    * the brute-force scoring loop. */
  def microDot(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.longDot(a, b).cast("double") / lit(1e12)

  /** Embedding near-duplicate pairs via multi-table sign-LSH: vectors
    * bucket map-side (graft.functions.LshBuckets, `tables` independent
    * tables), each bucket's sorted id list expands to candidate pairs,
    * and candidates verify with the exact quantized cosine — so every
    * emitted pair is a TRUE >= `threshold` pair (precision 1, recall
    * < 1 by LSH contract). This is the sub-quadratic scale route the
    * exact [[embeddingCosinePairs]] baseline documents: candidate
    * volume is bounded per bucket, and `planes` grows with corpus size
    * to keep buckets bounded. */
  def embeddingLshPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 4, tables: Int = 4): DataFrame = {
    val bucketed = emb.select(col(idCol).as("_id"),
        explode(graft.functions.NativeExpressions
          .lshBuckets(col(vecCol), planes, tables)).as("_bkt"))
    val cands = bucketed.groupBy("_bkt")
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")) > 1)
      .select(explode(pairCombos(col("_ids"))).as("_p"))
      .select(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"))
      .distinct()
    val vec = emb.select(col(idCol).as("_vid"),
        microVec(col(vecCol)).as("_vm"))
      .withColumn("_vn2", microDot(col("_vm"), col("_vm")))
      .filter(col("_vn2") > 0)
    cands
      .join(vec.select(col("_vid").as("id_a"), col("_vm").as("_ma"),
        col("_vn2").as("_na")), Seq("id_a"))
      .join(vec.select(col("_vid").as("id_b"), col("_vm").as("_mb"),
        col("_vn2").as("_nb")), Seq("id_b"))
      .withColumn("cosine", microDot(col("_ma"), col("_mb")) /
        sqrt(col("_na") * col("_nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Cosine-similarity pairs >= `threshold` among ids < `maxId`: the
    * pairwise-exact form — a broadcast nested-loop over quantized
    * vectors, inherently QUADRATIC in `maxId`. This is the oracle-exact
    * baseline only; the mandatory `maxId` cap (enforced <= 100k, i.e.
    * <= 5e9 candidate pairs) keeps it off the 100 TB path by
    * construction. For corpus-scale near-dup detection use
    * [[SimilarityOps.lshTopK]] (bucketed, sub-quadratic) and verify the
    * candidates exactly, as [[minhashLshPairs]] does. */
  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the shared
    * spherical k-means codebook, then verify candidate pairs ONLY
    * within each cluster with the exact quantized cosine. Candidate
    * volume drops from N² to Σ m_c² — the codebook size controls
    * per-cluster mass, and a loud `require` fences a runaway cluster
    * instead of letting the self-join explode at 100 TB (sub-shard the
    * offending cluster or raise nlist). Precision 1 by exact verify;
    * recall < 1 when a true pair straddles clusters — the gate measures
    * it against the quadratic exact baseline. */
  def semanticPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 8, iters: Int = 2,
      nprobe: Int = 2, maxClusterSize: Long = 100000L): DataFrame = {
    val spark = emb.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // trainCodebook consumes cand iters+1 times (seed draw + one scan
    // per Lloyd round) — persist so the unit-normalization UDF runs
    // over the corpus once, not per round
    val cand = emb.select(col(idCol).as("_id"),
        SimilarityOps.unitVec(col(vecCol)).as("_v"))
      .persist(lvl)
    val codebook = SimilarityOps.trainCodebook(cand, nlist, iters)
    // multi-probe: each vector lands in its nprobe nearest cells, so a
    // true pair straddling one k-means boundary still co-occurs.
    // probed feeds THREE consumers (the mass fence and both sides of
    // the within-cell self-join) — unpersisted, the probe UDF re-runs
    // the corpus ~4x (the r13 1.9x-floor regression).
    val probed = emb.select(col(idCol).as("_id"),
        explode(SimilarityOps.probeCol(spark, codebook, col(vecCol),
          nprobe)).as("_c"))
      .persist(lvl)
    val big = probed.groupBy("_c").count()
      .filter(col("count") > maxClusterSize).limit(1).count()
    require(big == 0,
      s"semanticPairs: a probed cell exceeds $maxClusterSize vectors — " +
        "raise nlist (or sub-shard the cell) before the within-cell " +
        "self-join")
    val cands = probed.as("a").join(probed.as("b"),
        col("a._c") === col("b._c") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    val v = emb.select(col(idCol).as("_vid"),
        microVec(col(vecCol)).as("_m"))
      .withColumn("_n2", microDot(col("_m"), col("_m")))
      .filter(col("_n2") > 0)
    cands
      .join(v.select(col("_vid").as("id_a"), col("_m").as("_ma"),
        col("_n2").as("_na")), Seq("id_a"))
      .join(v.select(col("_vid").as("id_b"), col("_m").as("_mb"),
        col("_n2").as("_nb")), Seq("id_b"))
      .withColumn("cosine", microDot(col("_ma"), col("_mb")) /
        sqrt(col("_na") * col("_nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxId: Long): DataFrame = {
    require(maxId > 0 && maxId <= 100000L,
      s"embeddingCosinePairs is the quadratic exact baseline; cap the id " +
        s"range (got maxId=$maxId, limit 100000) or use " +
        s"SimilarityOps.lshTopK for the scale path")
    val v = emb.filter(col(idCol) < maxId)
      .select(col(idCol).as("_id"), microVec(col(vecCol)).as("_m"))
      .withColumn("_n2", microDot(col("_m"), col("_m")))
      // zero-norm vectors would make 0/0 = NaN, which Spark compares
      // as greater than any threshold
      .filter(col("_n2") > 0)
    v.as("a").join(v.as("b"), col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        (microDot(col("a._m"), col("b._m")) /
          sqrt(col("a._n2") * col("b._n2"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
