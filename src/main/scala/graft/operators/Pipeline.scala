package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{OracleGen, QueryPack, Tables}

/** Corpus-assembly operators a training-data pipeline runs AFTER
  * cleaning and dedup: packing documents into fixed-token-budget
  * training sequences, and screening the training split for benchmark
  * contamination. Both are driven by deterministic md5 bucketing (the
  * same scheme as q45's stratified sample), so results are identical
  * across engines, re-runs, and partitionings.
  */
object Pipeline extends QueryPack {

  /** Tokens per packed training sequence. */
  private[operators] val SeqLen = 4096L

  /** Parallel packing shards. Packing is inherently a sequential scan —
    * the position of every document depends on all documents before
    * it — so the scalable form shards the corpus deterministically and
    * packs within each shard (exactly how production pipelines pack:
    * shard, then concatenate per shard). 64 shards here; at 100 TB the
    * shard count scales with the cluster, not the data semantics.
    */
  private[operators] val PackShards = 64L

  // --- q54: pack documents into fixed-token-budget sequences --------------
  /** Greedy concatenation packing: within a shard, documents
    * concatenate in doc_id order and a document belongs to the sequence
    * where it STARTS (documents may straddle sequence boundaries —
    * standard for LLM pretraining, where attention masks handle the
    * joins). seq = floor(exclusive-running-token-sum / SeqLen).
    *
    * One exchange total: the shard hash partitioning feeds the window's
    * running sum AND the (shard, seq) aggregation (PlanSpec asserts).
    */
  def q54Pack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"doc_id",
        (conv(substring(md5($"doc_id".cast("string")), 1, 6), 16, 10)
          .cast("long") % PackShards).as("shard"),
        size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
      .withColumn("seq", floor($"cum_before" / SeqLen))
      .groupBy($"shard", $"seq")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("seq_tokens"),
        min($"doc_id").as("first_doc_id"))
  }

  // --- q55: benchmark-contamination screen (13-gram overlap) ---------------
  /** Train/eval overlap detection, GPT-3 appendix-C style: an eval
    * document is contaminated when it shares any 13-token n-gram with a
    * training document. The eval split is q45's deterministic 20%
    * md5-bucket sample; the train split is the complement — the screen
    * therefore needs no second corpus.
    *
    * Scale shape: shingles shuffle as md5 hashes; n-grams with training
    * df > 16 are dropped BEFORE the join (boilerplate n-grams carry no
    * contamination signal — production screens drop them for the same
    * reason Lee et al. drop common n-grams — and the cap bounds the
    * per-key join fan-out regardless of corpus size).
    */
  def q55Contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string")), 1, 6), 16, 10)
          .cast("long") % 100)
    // shingles come from the one-pass token_shingle_hashes expression:
    // a 13-token window joined by the split separator IS the original
    // substring between its first token's start and last token's end,
    // so every shingle hashes IN PLACE — no per-window string build,
    // no interpreted lambda (2.0s -> ~1s at sf0.1). Shingles shuffle
    // as md5-prefix longs; equality classes match the oracle's
    // md5(string) join up to the accepted ~2^-40 collision odds.
    val shingles = docs
      .select($"doc_id", $"bucket",
        explode(graft.functions.geo.token_shingle_hashes($"text", 13))
          .as("sh"))
    val eval_ = shingles.filter($"bucket" < 20).select($"doc_id".as("eval_id"), $"sh")
    val train = shingles.filter($"bucket" >= 20).select($"doc_id".as("train_id"), $"sh")
    val rare = train.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" <= 16).select($"sh")
    eval_.join(train.join(rare, "sh"), "sh")
      .select($"eval_id", $"train_id").distinct()
      .groupBy($"eval_id")
      .agg(count(lit(1)).as("n_train_overlaps"),
        min($"train_id").as("example_train_id"))
  }

  // --- q181: combined decontamination verdict (lexical + semantic) ---------
  /** The decontamination REPORT a training run actually gates on:
    * both screens — q55's lexical 13-gram overlap AND q177's semantic
    * nearest-train cosine — run over ONE shared FIXED-SIZE eval
    * sample (`Similarity.evalSampleIds`, the 256 smallest
    * md5(doc_id); the embedding side maps by the vec_id == doc_id
    * correspondence the RRF queries already use), joined into one row
    * per eval document with each signal, each flag, and the final
    * verdict: `drop` if EITHER fires. Lexical catches verbatim
    * leakage, semantic catches paraphrase — a production gate needs
    * the union, and needs it per document so flagged items can be
    * audited, not just counted.
    *
    * Exactness: the lexical leg is q55's machinery (same shingle
    * hashes, same df ≤ 16 rare filter); the semantic leg is q177's
    * (per-pair rounded cosines, undefined → −2, max over identical
    * doubles); the verdict is pure integer/threshold logic on those.
    *
    * Scale shape: each leg keeps its audited shape (shingle join with
    * the df ≤ 16 prefilter; fixed-size broadcast eval set ×
    * round-robin-spread train projection with a map-combined max —
    * linear in the corpus BECAUSE the sample is fixed); the final
    * assembly is two broadcast left joins onto the eval-id spine —
    * sample-sized, never corpus-sized.
    */
  def q181DecontamVerdict(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // ONE fixed-size eval sample shared by BOTH screens (the
    // vec_id == doc_id correspondence): a benchmark is O(hundreds) of
    // items by contract — a corpus-proportional eval split would make
    // the exact semantic screen quadratic in the corpus
    // five consumers (two joins, two anti-joins, the spine):
    // checkpoint the 256-row sample so the corpus id scan runs once
    val ids = broadcast(Similarity.evalSampleIds(
      docs.select($"doc_id"), Similarity.EvalSampleN)
      .localCheckpoint(false))
    // lexical leg — q55's machinery on the shared sample. The shingle
    // stream feeds THREE consumers (eval side, train side, rare-df
    // filter): checkpoint it so the corpus is tokenized once, not
    // three times (the stream is (doc_id, hash) longs, far narrower
    // than the corpus it derives from)
    val shingles = docs
      .select($"doc_id",
        explode(graft.functions.geo.token_shingle_hashes($"text", 13))
          .as("sh"))
      .localCheckpoint(false)
    val evalSh = shingles.join(ids, $"doc_id" === $"eval_id")
      .select($"eval_id", $"sh")
    val trainSh = shingles.join(ids, $"doc_id" === $"eval_id", "left_anti")
      .select($"doc_id".as("train_id"), $"sh")
    val rare = trainSh.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" <= 16).select($"sh")
    val lex = evalSh.join(trainSh.join(rare, "sh"), "sh")
      .select($"eval_id", $"train_id").distinct()
      .groupBy($"eval_id")
      .agg(count(lit(1)).as("n_lex_overlaps"))
    // semantic leg — q177's rules on the shared sample
    val emb = Tables.embeddings(s, dir)
    val vec = (c: Column) => c.cast("array<double>")
    val dot = (a: Column, b: Column) => graft.functions.geo.dot_product(a, b)
    val evalV = emb.join(ids, $"vec_id" === $"eval_id")
      .select($"eval_id", vec($"embedding").as("ev"))
      .withColumn("evn", sqrt(dot($"ev", $"ev")))
    val trainV = emb.join(ids, $"vec_id" === $"eval_id", "left_anti")
      .select(vec($"embedding").as("tv"))
      .withColumn("tvn", sqrt(dot($"tv", $"tv")))
    val sem = Similarity.maxCosPairs(trainV, evalV)
    // assembly: the eval-id spine left-joins both signals
    ids
      .join(broadcast(lex), Seq("eval_id"), "left")
      .join(broadcast(sem), Seq("eval_id"), "left")
      .select($"eval_id",
        coalesce($"n_lex_overlaps", lit(0L)).as("n_lex_overlaps"),
        $"max_cos",
        when(coalesce($"n_lex_overlaps", lit(0L)) > 0, 1L).otherwise(0L)
          .as("flag_lex"),
        when($"max_cos" >= 0.95, 1L).otherwise(0L).as("flag_sem"))
      .withColumn("verdict",
        when($"flag_lex" + $"flag_sem" > 0, lit("drop"))
          .otherwise(lit("keep")))
      .orderBy($"eval_id".asc)
  }

  // --- q183: mixture-budget solver (the recipe calculator) -----------------
  /** The planning row that runs BEFORE q56's sampler: given target
    * mixture shares (q56's weights — en 40%, others 15%) and the
    * corpus's ACTUAL per-language token mass, solve for the largest
    * assembled corpus that honors the shares without upsampling —
    * T* = min over languages of (mass·100)/share — and report, per
    * language, the take and the sampling rate. The language that
    * attains the min is the BINDING constraint (rate ≈ 1): the row a
    * data-acquisition team reads to learn which language to crawl
    * more of, and the budget every other language must downsample to.
    *
    * Exactness: pure integer arithmetic — masses are exact token
    * counts, T* and the takes use integer division (both engines'
    * `div`), only the final rate is a dround(6) ratio of integers.
    *
    * Scale shape: one corpus scan into a ≤|langs|-row aggregation;
    * the solver is arithmetic over that census row set (one broadcast
    * min). Nothing after the scan is data-sized.
    */
  def q183MixtureSolver(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mass = Tables.documents(s, dir)
      .select($"lang", size(split($"text", " ")).cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("m_tokens"))
      .withColumn("p_target",
        when($"lang" === "en", 40L).otherwise(15L))
      // consumed by the min AND the per-lang report: one scan
      .localCheckpoint(false)
    val tstar = broadcast(mass
      .select(min(expr("(m_tokens * 100) div p_target")).as("t_star")))
    mass.crossJoin(tstar)
      .withColumn("take_tokens", expr("(t_star * p_target) div 100"))
      .select($"lang", $"m_tokens", $"p_target", $"t_star", $"take_tokens",
        graft.core.Exact.dround(
          $"take_tokens".cast("double") / $"m_tokens".cast("double"), 6)
          .as("rate"))
      .orderBy($"lang".asc)
  }

  // --- q184: SCD2 temporal versioning ----------------------------------------
  /** Slowly-changing-dimension (type 2) history from a versioned CDC
    * feed — the temporal-table shape every warehouse keeps for
    * dimensions and every training-data audit wants for "what did the
    * corpus say at version v": base snapshot = version 0, each delta
    * batch carries a version, and the history row for an upsert is
    * valid [ver, next event's ver) — a delete closes its
    * predecessor's interval without opening one, and a later upsert
    * resurrects the key. The current state at ANY version is then one
    * predicate (`ver_from <= v < coalesce(ver_to, ∞)`), which is what
    * makes the as-of read (q36's family) a filter instead of a replay
    * — PipelineOpsSpec pins history-sliced-at-v == the q125
    * mergeApply chain prefix, tying the temporal table to the CDC
    * machinery it summarizes.
    *
    * Scale shape: one union + ONE per-key window over (base ∪ deltas)
    * ordered by version — a single doc_id shuffle; versions-per-key
    * is bounded by feed cadence, never corpus size.
    */
  def scd2History(base: DataFrame, deltas: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val raw = base.select($"doc_id", $"lang", lit(0L).as("ver"),
        lit("upsert").as("op"))
      .unionByName(deltas.select($"doc_id", $"lang", $"ver", $"op"))
    // a real CDC feed can carry two events at one (doc_id, ver) —
    // without this fold the lead() window's interval assignment is
    // nondeterministic. Collapse to ONE winner per version with a
    // total order (upsert beats delete, then max lang) so history is
    // a function of the event SET, not of shuffle order; a feed with
    // unique versions (the q184 fixture) is untouched. One extra
    // map-side-combinable aggregation, versions-per-key bounded.
    val ev = raw.groupBy($"doc_id", $"ver")
      .agg(max(struct($"op", $"lang")).as("w"))
      .select($"doc_id", $"w.lang".as("lang"), $"ver", $"w.op".as("op"))
    val w = Window.partitionBy($"doc_id").orderBy($"ver".asc)
    ev.withColumn("ver_to", lead($"ver", 1).over(w))
      .filter($"op" === "upsert")
      .select($"doc_id", $"lang", $"ver".as("ver_from"), $"ver_to",
        when($"ver_to".isNull, 1L).otherwise(0L).as("is_current"))
  }

  def q184Scd2History(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"lang")
      // three delta generations derive from one scored frame: scan once
      .localCheckpoint(false)
    val deltas = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"lang", lit(1L).as("ver"), lit("upsert").as("op"))
      .unionByName(docs.filter($"doc_id" % 7 === 0)
        .select($"doc_id", $"lang", lit(2L).as("ver"),
          lit("delete").as("op")))
      .unionByName(docs.filter($"doc_id" % 3 === 0)
        .select($"doc_id", $"lang", lit(3L).as("ver"),
          lit("upsert").as("op")))
    scd2History(docs, deltas)
      .orderBy($"doc_id".asc, $"ver_from".asc)
  }

  // --- q56: mixture-weight token-budget sampling ---------------------------
  /** Data-mixing stage: select documents per language against fixed
    * mixture weights (en 40%, others 15% of a 1000-token budget) in a
    * deterministic pseudo-random order (md5 of doc_id). A document is
    * selected iff the tokens of every document BEFORE it in that order
    * still leave room for it — a pure per-document predicate, no
    * sequential keep/skip dependence.
    *
    * Scale shape: the naive spelling windows over lang — five reducers
    * own the whole corpus (classic skew). Instead the global running
    * sum DECOMPOSES: per-(lang, bucket) token sums aggregate into a
    * tiny bounded table whose bucket-prefix sums broadcast back, and
    * the within-bucket remainder is a window over (lang, bucket) —
    * 5x1024 balanced partitions. cum_before(doc) = broadcast prefix +
    * local window, exactly the number the one-reducer form computes.
    */
  private[operators] val MixBuckets = 1024L

  def q56Mixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n"),
        md5($"doc_id".cast("string")).as("h"))
      .withColumn("bucket",
        conv(substring($"h", 1, 6), 16, 10).cast("long") % MixBuckets)
    // phase A: bounded (lang, bucket) token sums -> bucket-prefix sums
    val wPrefix = Window.partitionBy($"lang").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = d.groupBy($"lang", $"bucket").agg(sum($"n").as("bs"))
      .withColumn("prefix", coalesce(sum($"bs").over(wPrefix), lit(0L)))
      .select($"lang", $"bucket", $"prefix")
    // phase B: within-bucket running sum + the broadcast global prefix
    val wLocal = Window.partitionBy($"lang", $"bucket")
      .orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(prefixes), Seq("lang", "bucket"))
      .withColumn("cum_before",
        $"prefix" + coalesce(sum($"n").over(wLocal), lit(0L)))
      .withColumn("quota",
        when($"lang" === "en", 400L).otherwise(150L))
      .groupBy($"lang")
      .agg(max($"quota").as("quota"),
        sum(when($"cum_before" + $"n" <= $"quota", 1).otherwise(0))
          .as("n_sel"),
        sum(when($"cum_before" + $"n" <= $"quota", $"n").otherwise(0L))
          .as("tok_sel"),
        min(when($"cum_before" + $"n" <= $"quota", $"doc_id"))
          .as("first_doc_id"))
  }

  // --- q116: temperature-scaled mixture quotas ------------------------------
  /** Temperature sampling over sources — the multilingual-pretraining
    * device (p_l ∝ n_l^(1/T); T=2 ⇒ sqrt) that upweights tail
    * languages relative to proportional sampling without q56's
    * hand-fixed quotas: quotas are COMPUTED from the corpus's own
    * per-language token mass, then the same deterministic hash-order
    * greedy fill as q56 selects documents. The census shows the
    * flattening directly: the head language's quota/token-mass ratio
    * must come out strictly below every tail language's (spec-pinned).
    *
    * Exactness device for the weights: w_l = floor(sqrt(n_l)·10^6) as
    * BIGINT — sqrt is correctly-rounded IEEE in both engines and floor
    * of an identical double is exact, so the weight, the integer-sum
    * total, and the integer-division quota replay bit-identically in
    * SQL with no float accumulation anywhere.
    *
    * Scale shape: q56's two-phase prefix decomposition (bounded
    * (lang, bucket) aggregate + within-bucket window) — no global
    * one-reducer cumsum; the quota table is langs-sized and
    * broadcasts.
    */
  private val TempBudget = 2000L

  def q116TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n"),
        md5($"doc_id".cast("string")).as("h"))
      .withColumn("bucket",
        conv(substring($"h", 1, 6), 16, 10).cast("long") % MixBuckets)
      .cache()
    val lt = d.groupBy($"lang").agg(sum($"n").as("n_tok"))
      .withColumn("w",
        floor(sqrt($"n_tok".cast("double")) * lit(1000000.0)).cast("long"))
    val quotas = lt.crossJoin(lt.agg(sum($"w").as("wt")))
      .withColumn("quota", expr(s"($TempBudget * w) div wt"))
      .select($"lang", $"n_tok", $"quota")
    val wPrefix = Window.partitionBy($"lang").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = d.groupBy($"lang", $"bucket").agg(sum($"n").as("bs"))
      .withColumn("prefix", coalesce(sum($"bs").over(wPrefix), lit(0L)))
      .select($"lang", $"bucket", $"prefix")
    val wLocal = Window.partitionBy($"lang", $"bucket")
      .orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(prefixes), Seq("lang", "bucket"))
      .join(broadcast(quotas), Seq("lang"))
      .withColumn("cum_before",
        $"prefix" + coalesce(sum($"n").over(wLocal), lit(0L)))
      .groupBy($"lang")
      .agg(max($"n_tok").as("n_tok"), max($"quota").as("quota"),
        sum(when($"cum_before" + $"n" <= $"quota", 1).otherwise(0))
          .as("n_sel"),
        sum(when($"cum_before" + $"n" <= $"quota", $"n").otherwise(0L))
          .as("tok_sel"),
        min(when($"cum_before" + $"n" <= $"quota", $"doc_id"))
          .as("first_doc_id"))
  }

  /** Output shards for q94's shuffle census. Like [[PackShards]], the
    * count scales with the cluster at 100 TB, not with semantics.
    */
  private[operators] val ShuffleShardCount = 16L

  // --- q94: deterministic global shuffle -> training shards ----------------
  /** The LAST corpus-assembly step before writing training shards: give
    * every document a pseudo-random but DETERMINISTIC position — shard
    * + within-shard rank — so data loaders read a globally shuffled
    * corpus, and a re-run (or a resumed job) reproduces byte-identical
    * shard files. Order key = md5(seed # doc_id): reshuffling is a seed
    * change, not a new random state, and the shard of an existing
    * document never changes when documents are appended (the q72 split
    * stability argument applied to shard assignment).
    *
    * Scale shape: a GLOBAL row_number would serialize the corpus
    * through one reducer; instead the hash prefix assigns the shard
    * (embarrassingly parallel) and the rank is per-shard — each shard
    * is corpus/nShards, sorted by Spark's spilling external sorter,
    * which is exactly the work writing an ordered shard file requires
    * anyway. One exchange: the window's hash partitioning on `shard`
    * is the aggregation's partitioning too.
    *
    * Returns the input columns + (h, shard, pos); pos is 1-based and
    * contiguous within each shard (PipelineOpsSpec asserts).
    */
  def shuffleShards(docs: DataFrame, nShards: Long, seed: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
    docs
      .withColumn("h", md5(concat(lit(seed + "#"), $"doc_id".cast("string"))))
      .withColumn("shard",
        conv(substring($"h", 1, 6), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(w))
  }

  /** [[shuffleShards]] with the shard count DERIVED from corpus size.
    *
    * Parameter policy (the 100 TB contract): the per-shard rank window
    * means ONE reducer sorts each shard, so nShards — not the cluster
    * size — decides both parallelism and per-task sort volume. A fixed
    * count that is fine at one scale pins reducers at another (16
    * shards over a 100 TB corpus = 6 TB per sort). Deriving
    * nShards = ceil(rows / targetRowsPerShard) keeps every per-shard
    * sort at a size one task spills comfortably (the 1M-row default is
    * low-GB at typical document sizes) and scales reducer count
    * linearly with the corpus. Costs one count() pass — corpus
    * assembly runs once per corpus, and on parquet the count is
    * metadata-only.
    *
    * Census invariance (PipelineOpsSpec): nShards only re-PARTITIONS
    * the single global md5 order — corpus totals are preserved and
    * each shard's internal order is the restriction of that global
    * order — so re-sizing shards never re-shuffles documents relative
    * to each other.
    */
  def shuffleShardsAuto(docs: DataFrame, seed: String,
      targetRowsPerShard: Long = 1000000L): DataFrame = {
    require(targetRowsPerShard > 0, "targetRowsPerShard must be positive")
    val rows = docs.count()
    val shards = math.max(1L,
      (rows + targetRowsPerShard - 1) / targetRowsPerShard)
    shuffleShards(docs, shards, seed)
  }

  /** Per-shard census over [[shuffleShards]]: doc/char totals plus the
    * first and last document in shuffle order — the bounded fingerprint
    * a pipeline records next to each written shard (the full order is
    * the shard file itself; first/last + counts pin it for audit
    * without an O(shard) driver artifact).
    */
  def q94ShuffleShard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    shuffleShards(
      Tables.documents(s, dir).select($"doc_id", $"n_chars"),
      ShuffleShardCount, "s42")
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("n_chars_total"),
        min_by($"doc_id", $"pos").as("first_doc_id"),
        max_by($"doc_id", $"pos").as("last_doc_id"))
  }

  // --- q96: z-order (Morton) layout audit ----------------------------------
  /** Two-dimensional data clustering for scan pruning — Delta/Iceberg
    * `Z-ORDER BY` semantics over (user, value) on the events table.
    * Each row's 16-bit dimension keys interleave into a z-value
    * (codegen'd [[graft.functions.geo.z_order16]]); `z >> 8` names the
    * 16x16 tile containing the row. The query reports, per tile, the
    * observed min/max of BOTH dimensions — the audit that the layout
    * key actually delivers bounded per-file ranges (every tile's
    * u-span and v-span is <= 15, asserted by PipelineOpsSpec), which is
    * what makes file-level min/max pruning effective on either column.
    *
    * Scale shape: the z-value is a per-row codegen'd map (no shuffle);
    * the audit is ONE aggregation exchange on the tile key. The write
    * path this audits is `df.repartitionByRange(col("z"))` +
    * sortWithinPartitions — same cost as any ordered write. At 100 TB
    * the tile histogram is bounded by the key space (2^24 tiles max),
    * not the data.
    */
  def q96ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.geo
    Tables.events(s, dir)
      .select($"user_id".bitwiseAND(lit(65535L)).as("u"),
        floor($"value").cast("long").bitwiseAND(lit(65535L)).as("v"))
      .withColumn("z", geo.z_order16($"u", $"v"))
      .groupBy(shiftright($"z", 8).as("tile"))
      .agg(count(lit(1)).as("n"),
        min($"u").as("u_min"), max($"u").as("u_max"),
        min($"v").as("v_min"), max($"v").as("v_max"))
  }

  /** DuckDB replica of the 16-bit Morton interleave over columns
    * `u`, `v` — 32 mechanical shift-and-mask terms OR'd together.
    */
  private[operators] val ZOrderSqlExpr: String =
    (0 until 16).map(i =>
      s"(((u >> $i) & 1) << ${2 * i}) | (((v >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** The write path q96 audits: cluster `df` on the Morton interleave
    * of two 16-bit dimension keys and write `nFiles` parquet files,
    * each covering a contiguous z range — so every file's min/max
    * footer stats bound BOTH dimensions and a reader filtering on
    * either column skips most files (Delta/Iceberg `Z-ORDER BY`
    * semantics, composed from stock Spark: range-partition by z +
    * in-partition sort; the z column itself is dropped before write).
    *
    * Scale shape: one range exchange (sampled boundaries) + local
    * sort — the same cost as any globally-ordered write; no driver
    * materialization. PipelineOpsSpec demonstrates the effect on real
    * files: a narrow filter on either dimension intersects a bounded
    * fraction of z-ordered files, where a row-major layout degrades to
    * reading every file for the second dimension.
    */
  def zorderWrite(df: DataFrame, xCol: Column, yCol: Column,
      path: String, nFiles: Int): Unit = {
    import graft.functions.geo
    // pick a scratch column name the input does NOT already use —
    // withColumn silently REPLACES an existing column, and drop would
    // then delete the caller's data from the written files
    val z = Iterator.from(0).map(i => s"__z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(z, geo.z_order16(xCol, yCol))
      .repartitionByRange(nFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }

  // --- q104: URL canonicalization (web-corpus hygiene) ---------------------
  /** Canonical form of an absolute URL (`scheme://host[/path][?q][#f]`)
    * — the normalization every web-scale pipeline runs BEFORE exact
    * URL dedup, since a crawl sees the same page under case variants,
    * www prefixes, default ports, tracking params, shuffled query
    * order, and fragments:
    *
    *   - scheme and host lowercased; a leading `www.` and an explicit
    *     `:443` default port dropped from the host
    *   - fragment dropped; trailing slash dropped (empty path → `/`)
    *   - tracking params removed (`utm_*`, `fbclid=`, `gclid=`,
    *     `ref=`), the surviving params SORTED so order is canonical
    *
    * Entirely codegen-friendly built-ins (split_part/filter/
    * array_sort — no UDF, no regex), so canonicalization is per-row
    * projection work with zero exchanges at any corpus size; the
    * 100 TB dedup that follows is a hash groupBy on the canonical
    * string (q25's shape). split_part returns '' on a missing part in
    * BOTH engines, which the empty-param filter absorbs — so
    * query-less and fragment-less URLs flow through one spelling.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = split_part(u, lit("#"), lit(1))
    val base = split_part(noFrag, lit("?"), lit(1))
    val qs = split_part(noFrag, lit("?"), lit(2))
    val scheme = lower(split_part(base, lit("://"), lit(1)))
    val rest = split_part(base, lit("://"), lit(2))
    val hostPort = lower(split_part(rest, lit("/"), lit(1)))
    val path0 = rest.substr(length(hostPort) + 1, length(rest))
    val h1 = when(endswith(hostPort, lit(":443")),
      hostPort.substr(lit(1), length(hostPort) - 4)).otherwise(hostPort)
    val host = when(startswith(h1, lit("www.")),
      h1.substr(lit(5), length(h1))).otherwise(h1)
    val path = when(path0 === "", lit("/"))
      .when(length(path0) > 1 && endswith(path0, lit("/")),
        path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    val kept = array_join(array_sort(filter(split(qs, "&"), p =>
      p =!= "" && !startswith(p, lit("utm_")) &&
        !startswith(p, lit("fbclid=")) && !startswith(p, lit("gclid=")) &&
        !startswith(p, lit("ref=")))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Host of an already-canonical URL. */
  def urlHost(canonical: Column): Column =
    split_part(split_part(canonical, lit("://"), lit(2)), lit("/"), lit(1))

  /** Per-domain URL dedup census over a deterministically messy URL
    * family: each document synthesizes a raw URL whose case, www
    * prefix, `:443`, trailing slash, tracking params, param ORDER and
    * fragment all vary by doc_id residues while groups of 16 docs
    * share the same logical page (`id = doc_id div 16`) — so
    * canonicalization must collapse every variant family to one
    * string. Output: per canonical domain, distinct raw vs distinct
    * canonical URLs and the collapse ratio. The oracle rebuilds the
    * same raw family and replays the same canonicalization in SQL, so
    * every branch of [[canonicalizeUrl]] is hash-checked.
    */
  def q104UrlCanonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = expr("doc_id div 16").cast("string")
    // page identity = (site g%20, page g): every 16-doc group shares
    // BOTH, so its raw variants MUST collapse to one canonical string
    // — the census proves the collapse (ratio ≫ 1), not just the
    // string transforms
    val site = concat(lit("site"), (expr("doc_id div 16") % 20).cast("string"))
    val raw = concat(
      when($"doc_id" % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
      lit("://"),
      when($"doc_id" % 3 === 0, lit("WWW.")).otherwise(lit("")),
      when($"doc_id" % 4 === 0, upper(site)).otherwise(site),
      lit(".example.com"),
      when($"doc_id" % 5 === 0, lit(":443")).otherwise(lit("")),
      lit("/docs/item"),
      when($"doc_id" % 7 === 0, lit("/")).otherwise(lit("")),
      lit("?"),
      when($"doc_id" % 2 === 0, concat(lit("id="), g, lit("&utm_source=feed")))
        .otherwise(concat(lit("utm_campaign=x&id="), g)),
      when($"doc_id" % 11 === 0, lit("#sec")).otherwise(lit("")))
    Tables.documents(s, dir)
      .select(raw.as("url"))
      .withColumn("curl", canonicalizeUrl($"url"))
      .groupBy(urlHost($"curl").as("domain"))
      .agg(countDistinct($"url").as("n_raw"),
        countDistinct($"curl").as("n_canonical"))
      .withColumn("dedup_ratio", graft.core.Exact.dround(
        $"n_raw".cast("double") / $"n_canonical".cast("double"), 4))
  }

  // --- q106: fixed-iteration PageRank (web-graph quality signal) -----------
  /** Power-iteration PageRank with EXACT cross-engine determinism: the
    * per-edge contribution rank(src)/outdeg snaps to round(·2^20)
    * integers before the per-destination sum (q77's rule — integer
    * sums are associative, so partitioning cannot perturb the result),
    * and the damping update is a fixed double expression — so the
    * whole trajectory replays bit-identically in SQL, like q51's CC
    * closure and q102's k-means. No dangling-mass redistribution
    * (leaked mass is the documented simplification; both engines leak
    * identically).
    *
    * Scale shape (per round): ranks⨝edges on src (one hash exchange
    * pair) + a per-dst aggregation (one more) — the canonical
    * distributed PR round; nodes without in-links keep the (1−d) base
    * via the left join back to the node set. Rounds are jobs (q51's
    * loop rule: checkpoint between rounds at depth; 2 rounds here).
    *
    * nodes: (id LONG); edges: (src LONG, dst LONG) — a MULTIGRAPH
    * (duplicate edges each carry mass, outdeg counts them).
    *
    * Unlike [[Similarity.kmeansFixed]] (whose per-round state is k
    * centroid rows), the rank frame here is NODE-sized, so a deep run
    * nests N-row joins `iters` levels deep: `checkpointEvery` breaks
    * the lineage with a lazy localCheckpoint every that-many rounds
    * (q51's loop rule; on a cluster, checkpoint(dir) is the
    * executor-loss-safe spelling). Values are unchanged — the specs
    * pin a checkpointed deep run against the pure-plan shallow
    * composition.
    */
  def pagerankFixed(nodes: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 4): DataFrame = {
    import nodes.sparkSession.implicits._
    // lazy localCheckpoints (the iterative-graph rule GraphX calls
    // caching the graph): the weighted edge frame is consumed once PER
    // ITERATION and the node frame once per iteration plus the seed —
    // uncheckpointed, every iteration re-derives both from the raw
    // corpus (ScanAudit read 11 documents scans for 2 rounds of q106;
    // 3 after). Both frames are narrow graph-key columns.
    val n = nodes.localCheckpoint(false)
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("od"))
    val e = edges.join(outdeg, "src").localCheckpoint(false)
    (1 to iters).foldLeft(
      n.select($"id", lit(1.0).as("rank"))) { (r, round0) =>
      val contrib = e.join(r, e("src") === r("id"))
        .select($"dst",
          round($"rank" / $"od" * 1048576.0).cast("long").as("q"))
        .groupBy($"dst").agg(sum($"q").as("qs"))
      val next = n.join(contrib, n("id") === contrib("dst"), "left")
        .select(n("id"),
          (lit(1.0 - damping) + lit(damping) *
            (coalesce($"qs", lit(0L)).cast("double") / 1048576.0))
            .as("rank"))
      if (round0 % checkpointEvery == 0 && round0 < iters)
        next.localCheckpoint(false)
      else next
    }
  }

  /** Top-10 PageRank census over a deterministic SKEWED citation
    * graph rebuilt from doc_id alone (no stored edge list): every doc
    * i ≥ 1 links to i div 2 (a chain funnel) and to the hub
    * i % (1 + (i % 97)) — the varying modulus makes hub in-degree
    * ~harmonically DECREASING in hub id, so the top ranks form a
    * strict hierarchy the oracle must reproduce value by value (a
    * degree-regular graph would rank everything equal and the census
    * couldn't discriminate). 2 power iterations at d = 0.85. The
    * page-importance signal CommonCrawl-derived corpora filter on,
    * as a first-class operator.
    */
  def q106Pagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.documents(s, dir).select($"doc_id".as("id"))
    val edges = nodes.filter($"id" >= 1L)
      .select($"id".as("src"), expr("id div 2").as("dst"))
      .unionAll(nodes.filter($"id" >= 1L)
        .select($"id".as("src"), expr("id % (1 + (id % 97))").as("dst")))
    pagerankFixed(nodes, edges, iters = 2)
      .select($"id".as("doc_id"), graft.core.Exact.dround($"rank", 6).as("rank"))
      .orderBy(graft.core.Exact.dround($"rank", 6).desc, $"doc_id".asc)
      .limit(10)
  }

  // --- q143: triangle census / local clustering coefficient ----------------
  /** Per-node triangle participation over an undirected graph given as
    * distinct (a, b) edge rows with a < b — the third web-graph quality
    * signal after PageRank (q106, importance) and connected components
    * (q51, duplication): a node's TRIANGLE density separates genuinely
    * interlinked communities from link farms and star spam, which have
    * high degree but near-zero closure (Newman 2003's clustering
    * coefficient; the standard spam/community feature CommonCrawl-class
    * corpus curation computes).
    *
    * Algorithm: degree-ordered orientation (Cohen 2009 / the
    * MapReduce-standard "node-iterator++") — orient every edge from its
    * (degree, id)-smaller endpoint; each triangle then has exactly ONE
    * apex (its order-minimal vertex) whose two out-edges span it, so
    * wedges built per apex + ONE semi-join against the oriented edge
    * set count each triangle exactly once, and out-degrees are bounded
    * by O(√m), which bounds the wedge fanout — the reason this shape
    * survives skewed degree distributions where naive neighborhood
    * joins explode.
    *
    * Scale shape: two edge⨝degree joins (degree is node-sized, so
    * these stay SHUFFLE joins — a node-sized broadcast would be the
    * 100 TB mistake; at test scale AQE broadcasts it on its own), the
    * wedge self-join keyed on the apex, one edge-keyed semi-join, one
    * node-keyed rollup. Everything hash-partitions on graph keys;
    * nothing is driver-side.
    */
  def triangleNodes(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    // lazy localCheckpoints (the q28/q154 multiply-consumed-subtree
    // rule): the caller's edge frame feeds degree (twice) + the
    // orientation join, and the oriented edge set feeds BOTH wedge
    // sides + the closing semi-join — uncheckpointed, each reference
    // re-derives edges from the raw corpus (ScanAudit read 34
    // documents scans for q143; 2 after). Both frames are narrow
    // graph-key columns, edge-scale.
    val ec = edges.localCheckpoint(false)
    val deg = ec.select($"a".as("v")).unionAll(ec.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("d"))
      .localCheckpoint(false)
    val lowFirst = $"da" < $"db" || ($"da" === $"db" && $"a" < $"b")
    val oe = ec
      .join(deg.toDF("a", "da"), "a").join(deg.toDF("b", "db"), "b")
      .select(
        when(lowFirst, $"a").otherwise($"b").as("u"),
        when(lowFirst, $"b").otherwise($"a").as("w"),
        when(lowFirst, $"db").otherwise($"da").as("dw"))
      .localCheckpoint(false)
    val w1 = oe.toDF("u", "v1", "dx1")
    val w2 = oe.toDF("u", "v2", "dx2")
    val tri = w1.join(w2, "u")
      .filter($"dx1" < $"dx2" || ($"dx1" === $"dx2" && $"v1" < $"v2"))
      .join(oe.select($"u".as("v1"), $"w".as("v2")),
        Seq("v1", "v2"), "left_semi")
      .select($"u", $"v1", $"v2")
    tri.select(explode(array($"u", $"v1", $"v2")).as("v"))
      .groupBy($"v").agg(count(lit(1)).as("tri_cnt"))
      .join(deg, "v")
  }

  /** Top-5 triangle-dense nodes of a deterministic citation graph
    * rebuilt from doc_id alone (q106's device): every doc i links to
    * i div 2 AND i div 4 — so (i, i div 2, i div 4) closes a triangle
    * for every i ≥ 4 and the census has real mass to rank (496
    * triangles at sf0.01), with local clustering coefficient
    * tri / C(deg, 2) as the quality signal.
    */
  def q143Triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.documents(s, dir).select($"doc_id".as("id"))
    val e = nodes.filter($"id" >= 2)
      .select(least($"id", expr("id div 2")).as("a"),
        greatest($"id", expr("id div 2")).as("b"))
      .unionAll(nodes.filter($"id" >= 4)
        .select(least($"id", expr("id div 4")).as("a"),
          greatest($"id", expr("id div 4")).as("b")))
      .filter($"a" =!= $"b").distinct()
    triangleNodes(e)
      .select($"v".as("doc_id"), $"tri_cnt",
        graft.core.Exact.dround($"tri_cnt".cast("double")
          / (($"d" * ($"d" - 1)).cast("double") / 2.0), 6).as("local_cc"))
      .orderBy($"tri_cnt".desc, $"doc_id".asc).limit(5)
  }

  // --- q111: corpus snapshot diff (crawl-refresh delta census) -------------
  /** Content-level diff between two corpus snapshots — the census an
    * incremental crawl pipeline runs before deciding what to
    * re-process (q61 dedups a NEW batch against an index; this
    * classifies a FULL refresh): full-outer join on the document key,
    * change detection by content fingerprint,
    * status ∈ {added, removed, modified, unchanged}.
    *
    * Scale shape: ONE full-outer hash join on doc_id + md5 per side
    * computed in the scan projection + one small census aggregation.
    * At 100 TB both snapshots are doc_id-bucketed so the join is
    * co-located (the bucketed-join PlanSpec case); the fingerprint
    * means text ships nowhere — each side carries (doc_id, lang,
    * 32-char md5).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    import a.sparkSession.implicits._
    val fa = a.select($"doc_id", $"lang".as("lang_a"),
      md5($"text").as("fp_a"))
    val fb = b.select($"doc_id", $"lang".as("lang_b"),
      md5($"text").as("fp_b"))
    fa.join(fb, Seq("doc_id"), "full_outer")
      .select($"doc_id", coalesce($"lang_a", $"lang_b").as("lang"),
        when($"fp_a".isNull, "added")
          .when($"fp_b".isNull, "removed")
          .when($"fp_a" =!= $"fp_b", "modified")
          .otherwise("unchanged").as("status"))
  }

  /** Census over a deterministic snapshot-B family: every 7th doc
    * dropped, every remaining 5th modified (text suffixed), every 11th
    * spawning an added doc at a fresh negative key — so all four
    * statuses are live and the oracle replays the same family.
    */
  def q111SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docsA = Tables.documents(s, dir)
    val b = docsA.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", $"lang",
        when($"doc_id" % 5 === 0, concat($"text", lit(" updated")))
          .otherwise($"text").as("text"))
      .unionByName(docsA.filter($"doc_id" % 11 === 0)
        .select((-$"doc_id" - 1).as("doc_id"), $"lang",
          concat($"text", lit(" new")).as("text")))
    snapshotDiff(docsA, b)
      .groupBy($"lang", $"status").agg(count(lit(1)).as("n"))
  }

  // --- q125: CDC merge apply (the write side of q111) -----------------------
  /** Apply an upsert/delete delta batch to a corpus snapshot — MERGE
    * INTO semantics as one full-outer join: deletes drop the key,
    * upserts override or insert, untouched rows pass through. q111
    * DIAGNOSES a refresh (what changed between snapshots); this
    * EXECUTES one (a CDC feed applied to the stored corpus) — the two
    * halves of an incremental pipeline's state maintenance.
    *
    * Scale shape: one full-outer hash join on doc_id (both sides
    * doc_id-bucketed at 100 TB, co-located like q111; a typically
    * small delta broadcasts instead). The census checksums the merged
    * content with a sum of 32-bit md5 prefixes — order-independent
    * integer arithmetic, so the MERGED STATE itself is under the
    * exact gate, not just the row counts.
    */
  def mergeApply(snap: DataFrame, delta: DataFrame): DataFrame = {
    import snap.sparkSession.implicits._
    snap.select($"doc_id", $"lang".as("sl"), $"text".as("st"))
      .join(delta.select($"doc_id", $"op", $"lang".as("dl"),
        $"text".as("dt")), Seq("doc_id"), "full_outer")
      .filter(!($"op" <=> lit("delete")))
      .select($"doc_id", coalesce($"dl", $"sl").as("lang"),
        coalesce($"dt", $"st").as("text"),
        when($"op".isNull, "kept")
          .when($"sl".isNull, "inserted")
          .otherwise("updated").as("change"))
  }

  /** Last-wins resolution of two SEQUENTIAL delta batches into one:
    * a key touched by both takes δ2's op; keys touched once pass
    * through. Contract (the CDC-feed shape, same as [[mergeApply]]'s):
    * each batch carries at most one op per doc_id.
    *
    * This is what makes multi-batch CDC associative —
    * merge(merge(A, δ1), δ2) == merge(A, resolve(δ1, δ2)) on content
    * (PipelineOpsSpec pins the law; `change` labels legitimately
    * differ: a δ1-delete + δ2-upsert reads "inserted" in the chain but
    * "updated" against the original snapshot) — so a backlogged feed
    * can be compacted before one apply instead of replayed batch by
    * batch.
    *
    * Scale shape: one left-anti join on doc_id (both deltas are feed
    * batches — typically broadcastable; co-located under doc_id
    * bucketing otherwise) + a union. No wide aggregation.
    */
  def resolveDeltas(d1: DataFrame, d2: DataFrame): DataFrame = {
    import d1.sparkSession.implicits._
    d1.join(d2.select($"doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(d2)
  }

  /** Deterministic delta family over the corpus (the q111 pattern):
    * every 7th doc deleted, every remaining 5th upserted with new
    * text, every 11th spawning an insert at a fresh negative key.
    */
  def q125MergeApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val delta = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id", lit("delete").as("op"), $"lang", $"text")
      .unionByName(docs.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 5 === 0)
        .select($"doc_id", lit("upsert").as("op"), $"lang",
          concat($"text", lit(" v2")).as("text")))
      .unionByName(docs.filter($"doc_id" % 11 === 0)
        .select((-$"doc_id" - 1).as("doc_id"), lit("upsert").as("op"),
          $"lang", concat($"text", lit(" ins")).as("text")))
    mergeApply(docs, delta)
      .groupBy($"change")
      .agg(count(lit(1)).as("n"),
        sum(conv(substring(md5($"text"), 1, 8), 16, 10).cast("long"))
          .as("checksum"),
        min($"doc_id").as("first_doc_id"))
  }

  // --- q132: weighted reservoir sample (Efraimidis–Spirakis A-ES) ----------
  /** Weight-proportional sampling WITHOUT replacement in one pass —
    * the A-ES scheme (Efraimidis & Spirakis 2006): each row draws
    * u ∈ (0,1] and keeps key = ln(u)/w; the top-k keys ARE a
    * weight-proportional sample (P(i in sample) ∝ wᵢ marginally).
    * This is the principled upgrade of q81's threshold sampling: q81's
    * keep-probability is per-row independent (sample size varies);
    * A-ES draws an EXACT-size sample, and at 100 TB it is the
    * standard one-pass distributed design — per-partition top-k heaps
    * merge map-side (TakeOrdered), no global sort, no second pass.
    *
    * Determinism: u derives from md5(doc_id) (13 hex chars → 52 bits,
    * +1 so u > 0, over 2^52), so the "random" draw replays in SQL;
    * ln(u) is the q95 LN class; selection and ordering compare the
    * ROUNDED key (10 decimals) with doc_id tie-break — a total order.
    * Weight = n_chars (long docs upweighted; the spec pins the bias
    * law: the weighted sample's mean length exceeds the corpus mean).
    */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"lang", $"n_chars",
        ((conv(substring(md5($"doc_id".cast("string")), 1, 13), 16, 10)
          .cast("long") + lit(1L)).cast("double")
          / lit(4503599627370496.0)).as("u"))
      .withColumn("key", graft.core.Exact.dround(
        log($"u") / $"n_chars".cast("double"), 10))
      .select($"doc_id", $"lang", $"n_chars", $"key")
      .orderBy($"key".desc, $"doc_id".asc)
      .limit(k)
  }

  def q132WeightedSample(s: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(s, dir), k = 50)

  // --- q135: stratified (per-language) A-ES weighted sample ----------------
  /** q132 per stratum: an exact-size weight-proportional sample from
    * EVERY language in one aggregation — the shape a multilingual
    * pretraining mix actually needs (q116 sets per-language token
    * QUOTAS; this draws the weighted documents inside each). The
    * per-group top-k rides the bounded-heap TypedImperativeAggregate
    * (q48/q129's device): O(k) state per language, partial heaps merge
    * map-side, no per-language sort, no window over the doc stream.
    *
    * The heap keeps the k largest (ord, payload-asc) entries, so ord
    * is the ROUNDED A-ES key and the payload leads with the
    * zero-padded doc_id — payload-asc = smallest id — matching the
    * (key desc, doc_id asc) total order the q132 oracle spells.
    * Output re-expands rank/doc/meta from the heap's sorted array
    * with posexplode, rank = position in the per-language order.
    */
  def q135StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.geo.top_k_by
    val keyed = Tables.documents(s, dir)
      .select($"lang", $"doc_id", $"n_chars",
        ((conv(substring(md5($"doc_id".cast("string")), 1, 13), 16, 10)
          .cast("long") + lit(1L)).cast("double")
          / lit(4503599627370496.0)).as("u"))
      .withColumn("key", graft.core.Exact.dround(
        log($"u") / $"n_chars".cast("double"), 10))
      .withColumn("payload", concat(
        lpad($"doc_id".cast("string"), 12, "0"), lit("|"),
        $"n_chars".cast("string")))
    keyed.groupBy($"lang")
      .agg(top_k_by($"key", $"payload", 20).as("top"))
      .select($"lang", posexplode($"top").as(Seq("pos", "e")))
      .select($"lang", ($"pos" + 1).cast("long").as("rank"),
        split($"e.payload", "\\|").getItem(0).cast("long").as("doc_id"),
        split($"e.payload", "\\|").getItem(1).cast("long").as("n_chars"),
        $"e.ord".as("key"))
  }

  // --- q57: end-to-end corpus recipe (compose the library's own ops) ------
  /** The full clean-corpus pass a pipeline user actually runs, composed
    * from this library's operators rather than re-implemented: exact
    * dedup survivors (md5 canonical min-id) ∩ quality filter
    * (q22's score ≥ 0.5) ∩ repetition filter (q52's keep) → per-lang
    * corpus stats. Every stage joins on doc_id, so after the first
    * exchange the joins reuse the same hash partitioning; the final
    * per-lang rollup is a 5-row aggregate.
    */
  def q57CorpusRecipe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val keepExact = docs.groupBy(md5($"text").as("fp"))
      .agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val quality = TextAnalysis.q22Quality(s, dir).select($"doc_id", $"quality")
    // persist() is an OPTIMIZER BARRIER here, not a speed hack: the
    // keep filter below would otherwise be alias-substituted through
    // q52's projection layers (PushDownPredicates), re-inlining the
    // n-gram sort/aggregate expressions into an interpreted predicate
    // that re-splits the text per element — measured 0.8s -> 8.8s for
    // the rep branch alone. The materialized (doc_id, keep) frame is
    // two narrow columns; the harness unpersists after each run (same
    // scoped-cache rule as q26/q28/q49).
    val rep = TextAnalysis.q52Repetition(s, dir)
      .select($"doc_id", $"keep").persist()
    docs.select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tok"))
      .join(keepExact, Seq("doc_id"), "left_semi")
      .join(quality, "doc_id").filter($"quality" >= 0.5)
      .join(rep, "doc_id").filter($"keep")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        min($"doc_id").as("first_kept"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_pack"          -> (q54Pack _),
    "q55_contamination" -> (q55Contamination _),
    "q181_decontam_verdict" -> (q181DecontamVerdict _),
    "q183_mixture_solver" -> (q183MixtureSolver _),
    "q184_scd2_history" -> (q184Scd2History _),
    "q56_mixture"       -> (q56Mixture _),
    "q116_temperature_mix" -> (q116TemperatureMix _),
    "q57_corpus_recipe" -> (q57CorpusRecipe _),
    "q94_shuffle_shard" -> (q94ShuffleShard _),
    "q96_zorder_layout" -> (q96ZorderLayout _),
    "q104_url_canonical" -> (q104UrlCanonical _),
    "q106_pagerank"     -> (q106Pagerank _),
    "q143_triangles"    -> (q143Triangles _),
    "q111_snapshot_diff" -> (q111SnapshotDiff _),
    "q125_merge_apply"   -> (q125MergeApply _),
    "q132_weighted_sample" -> (q132WeightedSample _),
    "q135_stratified_sample" -> (q135StratifiedSample _),
  )

  override def oracleSql: Map[String, String] = Map(
    "q135_stratified_sample" ->
      // the same draw and key, ranked per language by the window
      // spelling of the heap's retained order
      """WITH s AS (SELECT lang, doc_id, n_chars,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |    AS BIGINT) + 1 AS DOUBLE) / 4503599627370496.0 AS u
        | FROM documents),
        |k AS (SELECT lang, doc_id, n_chars,
        |  CAST(ROUND(CAST(LN(u) / CAST(n_chars AS DOUBLE)
        |    AS DECIMAL(28,10)), 10) AS DOUBLE) AS key
        | FROM s),
        |r AS (SELECT lang, doc_id, n_chars, key,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY key DESC, doc_id ASC) AS BIGINT) AS rank
        | FROM k)
        |SELECT lang, rank, doc_id, n_chars, key
        |FROM r WHERE rank <= 20""".stripMargin,
    "q132_weighted_sample" ->
      // the same deterministic u (52-bit md5 slice + 1 over 2^52),
      // same ln(u)/w key, ranked on the ROUNDED key with doc_id
      // tie-break
      """WITH s AS (SELECT doc_id, lang, n_chars,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |    AS BIGINT) + 1 AS DOUBLE) / 4503599627370496.0 AS u
        | FROM documents),
        |k AS (SELECT doc_id, lang, n_chars,
        |  CAST(ROUND(CAST(LN(u) / CAST(n_chars AS DOUBLE)
        |    AS DECIMAL(28,10)), 10) AS DOUBLE) AS key
        | FROM s)
        |SELECT doc_id, lang, n_chars, key FROM k
        |ORDER BY key DESC, doc_id ASC LIMIT 50""".stripMargin,
    "q125_merge_apply" ->
      // the same delta family replayed; checksum = sum of 32-bit md5
      // prefixes of the merged text (order-independent integers)
      """WITH docs AS (SELECT doc_id, lang, text FROM documents),
        |delta AS (
        | SELECT doc_id, 'delete' AS op, lang, text FROM docs
        |  WHERE doc_id % 7 = 0
        | UNION ALL
        | SELECT doc_id, 'upsert', lang, text || ' v2' FROM docs
        |  WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
        | UNION ALL
        | SELECT -doc_id - 1, 'upsert', lang, text || ' ins' FROM docs
        |  WHERE doc_id % 11 = 0),
        |m AS (SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
        |  COALESCE(d.lang, s.lang) AS lang,
        |  COALESCE(d.text, s.text) AS text,
        |  CASE WHEN d.op IS NULL THEN 'kept'
        |   WHEN s.lang IS NULL THEN 'inserted'
        |   ELSE 'updated' END AS change
        | FROM docs s FULL OUTER JOIN delta d ON s.doc_id = d.doc_id
        | WHERE d.op IS NULL OR d.op <> 'delete')
        |SELECT change, COUNT(*) AS n,
        | CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT)
        |   AS checksum,
        | MIN(doc_id) AS first_doc_id
        |FROM m GROUP BY change""".stripMargin,
    "q111_snapshot_diff" ->
      s"""WITH a AS (SELECT doc_id, lang, md5(text) AS fp FROM documents),
         |b0 AS (SELECT doc_id, lang,
         |  CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
         |   ELSE text END AS text
         | FROM documents WHERE doc_id % 7 <> 0),
         |badd AS (SELECT -doc_id - 1 AS doc_id, lang,
         |  text || ' new' AS text
         | FROM documents WHERE doc_id % 11 = 0),
         |b AS (SELECT doc_id, lang, md5(text) AS fp FROM
         |  (SELECT * FROM b0 UNION ALL SELECT * FROM badd)),
         |d AS (SELECT COALESCE(a.lang, b.lang) AS lang,
         |  CASE WHEN a.fp IS NULL THEN 'added'
         |   WHEN b.fp IS NULL THEN 'removed'
         |   WHEN a.fp <> b.fp THEN 'modified'
         |   ELSE 'unchanged' END AS status
         | FROM a FULL OUTER JOIN b USING (doc_id))
         |SELECT lang, status, COUNT(*) AS n FROM d GROUP BY 1, 2""".stripMargin,
    "q143_triangles" ->
      // same deterministic citation graph; the degree-ordered
      // orientation replayed relationally — each triangle has exactly
      // one (degree, id)-minimal apex, so the wedge join + EXISTS
      // closure counts it once
      """WITH nodes AS (SELECT doc_id AS id FROM documents),
        |e0 AS (
        |  SELECT DISTINCT LEAST(id, id // 2) AS a,
        |    GREATEST(id, id // 2) AS b FROM nodes
        |   WHERE id >= 2 AND LEAST(id, id // 2) <> GREATEST(id, id // 2)
        |  UNION
        |  SELECT DISTINCT LEAST(id, id // 4) AS a,
        |    GREATEST(id, id // 4) AS b FROM nodes
        |   WHERE id >= 4 AND LEAST(id, id // 4) <> GREATEST(id, id // 4)),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
        |  SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0) GROUP BY 1),
        |oe AS (SELECT
        |  CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
        |    THEN e0.a ELSE e0.b END AS u,
        |  CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
        |    THEN e0.b ELSE e0.a END AS w,
        |  CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
        |    THEN db.d ELSE da.d END AS dw
        | FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        |tri AS (SELECT w1.u, w1.w AS v1, w2.w AS v2
        |  FROM oe w1 JOIN oe w2 ON w1.u = w2.u
        |   AND (w1.dw < w2.dw OR (w1.dw = w2.dw AND w1.w < w2.w))
        |  WHERE EXISTS (SELECT 1 FROM oe c WHERE c.u = w1.w AND c.w = w2.w)),
        |tn AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tri_cnt FROM (
        |  SELECT u AS v FROM tri UNION ALL SELECT v1 AS v FROM tri
        |  UNION ALL SELECT v2 AS v FROM tri) GROUP BY 1)
        |SELECT tn.v AS doc_id, tn.tri_cnt,
        | CAST(ROUND(CAST(CAST(tn.tri_cnt AS DOUBLE)
        |   / (CAST(deg.d * (deg.d - 1) AS DOUBLE) / 2.0)
        |   AS DECIMAL(28,10)), 6) AS DOUBLE) AS local_cc
        |FROM tn JOIN deg ON deg.v = tn.v
        |ORDER BY tn.tri_cnt DESC, doc_id ASC LIMIT 5""".stripMargin,
    "q106_pagerank" ->
      // two unrolled power iterations; contributions snapped to
      // round(rank/od * 2^20) BIGINTs before the per-dst sum (exact/
      // associative), damping spelled (1.0 - 0.85) — NOT the literal
      // 0.15, which is a DIFFERENT double — so every rank double is
      // bit-identical to the engine's
      s"""WITH n AS (SELECT doc_id AS id FROM documents),
         |e AS (SELECT id AS src, id // 2 AS dst FROM n WHERE id >= 1
         |  UNION ALL SELECT id, id % (1 + (id % 97)) FROM n WHERE id >= 1),
         |od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY 1),
         |e2 AS (SELECT e.src, e.dst, od.od FROM e JOIN od USING (src)),
         |c1 AS (SELECT dst,
         |  SUM(CAST(ROUND(1.0 / od * 1048576.0) AS BIGINT)) AS qs
         | FROM e2 GROUP BY 1),
         |r1 AS (SELECT n.id, (1.0 - 0.85) + 0.85 *
         |  (CAST(COALESCE(c1.qs, 0) AS DOUBLE) / 1048576.0) AS rank
         | FROM n LEFT JOIN c1 ON n.id = c1.dst),
         |c2 AS (SELECT e2.dst,
         |  SUM(CAST(ROUND(r1.rank / e2.od * 1048576.0) AS BIGINT)) AS qs
         | FROM e2 JOIN r1 ON e2.src = r1.id GROUP BY 1),
         |r2 AS (SELECT n.id, (1.0 - 0.85) + 0.85 *
         |  (CAST(COALESCE(c2.qs, 0) AS DOUBLE) / 1048576.0) AS rank
         | FROM n LEFT JOIN c2 ON n.id = c2.dst)
         |SELECT id AS doc_id,
         | ${graft.core.Exact.sqlDround("rank", 6)} AS rank
         |FROM r2
         |ORDER BY ${graft.core.Exact.sqlDround("rank", 6)} DESC, id ASC
         |LIMIT 10""".stripMargin,
    "q104_url_canonical" ->
      // same raw family, same canonicalization replayed step by step
      // (lower → :443 strip → www strip; empty-param filter absorbs
      // the missing-query '' from split_part, both engines)
      s"""WITH r0 AS (SELECT doc_id,
         |  'site' || CAST((doc_id // 16) % 20 AS VARCHAR) AS site
         | FROM documents),
         |r AS (SELECT
         |  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
         |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
         |  (CASE WHEN doc_id % 4 = 0 THEN upper(site) ELSE site END) ||
         |  '.example.com' ||
         |  (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
         |  '/docs/item' ||
         |  (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) || '?' ||
         |  (CASE WHEN doc_id % 2 = 0
         |    THEN 'id=' || CAST(doc_id // 16 AS VARCHAR) || '&utm_source=feed'
         |    ELSE 'utm_campaign=x&id=' || CAST(doc_id // 16 AS VARCHAR) END) ||
         |  (CASE WHEN doc_id % 11 = 0 THEN '#sec' ELSE '' END) AS url
         | FROM r0),
         |s1 AS (SELECT url, split_part(url, '#', 1) AS nofrag FROM r),
         |s2 AS (SELECT url,
         |  split_part(nofrag, '?', 1) AS base,
         |  split_part(nofrag, '?', 2) AS qs FROM s1),
         |s3 AS (SELECT url, qs,
         |  lower(split_part(base, '://', 1)) AS sch,
         |  split_part(base, '://', 2) AS rest FROM s2),
         |s4 AS (SELECT url, qs, sch,
         |  lower(split_part(rest, '/', 1)) AS hp,
         |  substring(rest, length(split_part(rest, '/', 1)) + 1,
         |    length(rest)) AS path0 FROM s3),
         |s5 AS (SELECT url, qs, sch, path0,
         |  CASE WHEN ends_with(hp, ':443')
         |   THEN substring(hp, 1, length(hp) - 4) ELSE hp END AS h1 FROM s4),
         |s6 AS (SELECT url, qs, sch, path0,
         |  CASE WHEN starts_with(h1, 'www.')
         |   THEN substring(h1, 5, length(h1)) ELSE h1 END AS host FROM s5),
         |s7 AS (SELECT url, sch, host,
         |  CASE WHEN path0 = '' THEN '/'
         |   WHEN length(path0) > 1 AND ends_with(path0, '/')
         |    THEN substring(path0, 1, length(path0) - 1)
         |   ELSE path0 END AS path,
         |  array_to_string(list_sort(list_filter(string_split(qs, '&'),
         |    p -> p <> '' AND NOT starts_with(p, 'utm_')
         |     AND NOT starts_with(p, 'fbclid=')
         |     AND NOT starts_with(p, 'gclid=')
         |     AND NOT starts_with(p, 'ref='))), '&') AS kept FROM s6),
         |c AS (SELECT url, host,
         |  sch || '://' || host || path ||
         |   (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS curl
         | FROM s7)
         |SELECT host AS domain,
         | COUNT(DISTINCT url) AS n_raw,
         | COUNT(DISTINCT curl) AS n_canonical,
         | ${graft.core.Exact.sqlDround(
             "CAST(COUNT(DISTINCT url) AS DOUBLE) / CAST(COUNT(DISTINCT curl) AS DOUBLE)", 4)}
         |   AS dedup_ratio
         |FROM c GROUP BY 1""".stripMargin,
    "q96_zorder_layout" ->
      s"""WITH d AS (SELECT (user_id & 65535) AS u,
        |  (CAST(FLOOR(value) AS BIGINT) & 65535) AS v FROM events),
        |z AS (SELECT u, v, ($ZOrderSqlExpr) AS z FROM d)
        |SELECT (z >> 8) AS tile, COUNT(*) AS n,
        | MIN(u) AS u_min, MAX(u) AS u_max,
        | MIN(v) AS v_min, MAX(v) AS v_max
        |FROM z GROUP BY 1""".stripMargin,
    "q94_shuffle_shard" ->
      s"""WITH d AS (SELECT doc_id, n_chars,
        |  md5('s42#' || CAST(doc_id AS VARCHAR)) AS h,
        |  CAST(('0x' || substr(md5('s42#' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
        |    % $ShuffleShardCount AS shard
        | FROM documents),
        |p AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
        | FROM d)
        |SELECT shard, COUNT(*) AS n_docs,
        | CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
        | arg_min(doc_id, pos) AS first_doc_id,
        | arg_max(doc_id, pos) AS last_doc_id
        |FROM p GROUP BY shard""".stripMargin,
    "q57_corpus_recipe" ->
      s"""WITH ke AS (SELECT MIN(doc_id) doc_id FROM documents GROUP BY md5(text)),
        |q AS (SELECT doc_id,
        |  CAST(ROUND(CAST((LEAST(CAST(1.0 AS DOUBLE), n_chars / CAST(400.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE) +
        |    (CAST(1.0 AS DOUBLE) - len(list_filter(string_split(text, ' '),
        |      x -> x IN (${TextAnalysis.stopListSql})))
        |     / len(string_split(text, ' '))) * CAST(0.5 AS DOUBLE)) AS DECIMAL(28,10)), 4) AS DOUBLE) AS quality
        | FROM documents),
        |wx AS (SELECT doc_id, string_split(text, ' ') ws,
        |  len(string_split(text, ' ')) nw FROM documents),
        |words AS (SELECT doc_id, unnest(ws) tok FROM wx),
        |big AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] bg
        |  FROM wx, generate_series(1, ${OracleGen.MaxDocSeries}) t(i) WHERE i <= nw - 1),
        |tri AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] tg
        |  FROM wx, generate_series(1, ${OracleGen.MaxDocSeries}) t(i) WHERE i <= nw - 2),
        |wstat AS (SELECT doc_id, MAX(c) topw FROM
        |  (SELECT doc_id, tok, COUNT(*) c FROM words GROUP BY 1, 2) GROUP BY 1),
        |bstat AS (SELECT doc_id, MAX(c) topb, CAST(SUM(c) AS BIGINT) nb FROM
        |  (SELECT doc_id, bg, COUNT(*) c FROM big GROUP BY 1, 2) GROUP BY 1),
        |tstat AS (SELECT doc_id, COUNT(*) nt, COUNT(DISTINCT tg) dt FROM tri GROUP BY 1),
        |rep AS (SELECT wx.doc_id,
        |  (topw / nw <= 0.20 AND COALESCE(topb / nb, 0) <= 0.18
        |    AND COALESCE((nt - dt) / nt, 0) <= 0.30) AS keep
        | FROM wx JOIN wstat USING (doc_id) LEFT JOIN bstat USING (doc_id)
        | LEFT JOIN tstat USING (doc_id))
        |SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        | MIN(doc_id) AS first_kept
        |FROM documents JOIN ke USING (doc_id) JOIN q USING (doc_id)
        |JOIN rep USING (doc_id)
        |WHERE quality >= 0.5 AND keep
        |GROUP BY lang""".stripMargin,
    "q54_pack" ->
      s"""WITH d AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 64 AS shard,
        |  len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, shard, n_tok,
        |  COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_before
        | FROM d)
        |SELECT shard, CAST(FLOOR(cum_before / $SeqLen) AS BIGINT) AS seq,
        | COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
        | MIN(doc_id) AS first_doc_id
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q116_temperature_mix" ->
      // q56's one-reducer cumsum spelling plus the computed quotas:
      // integer weights floor(sqrt(n_tok)*1e6), integer-division quota
      """WITH d AS (SELECT doc_id, lang,
        |  len(string_split(text, ' ')) n,
        |  md5(CAST(doc_id AS VARCHAR)) h,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1024 AS bucket
        | FROM documents),
        |lt AS (SELECT lang, CAST(SUM(n) AS BIGINT) n_tok FROM d GROUP BY 1),
        |wq AS (SELECT lang, n_tok,
        |  CAST(FLOOR(SQRT(CAST(n_tok AS DOUBLE)) * 1000000.0) AS BIGINT) w
        | FROM lt),
        |qt AS (SELECT lang, n_tok,
        |  CAST((2000 * w) // (SELECT CAST(SUM(w) AS BIGINT) FROM wq) AS BIGINT) quota
        | FROM wq),
        |c AS (SELECT *, COALESCE(SUM(n) OVER (PARTITION BY lang
        |    ORDER BY bucket, h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_before
        | FROM d),
        |j AS (SELECT c.doc_id, c.lang, c.n, c.cum_before, qt.n_tok, qt.quota
        | FROM c JOIN qt USING (lang))
        |SELECT lang, CAST(MAX(n_tok) AS BIGINT) AS n_tok,
        | CAST(MAX(quota) AS BIGINT) AS quota,
        | CAST(SUM(CASE WHEN cum_before + n <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
        | CAST(SUM(CASE WHEN cum_before + n <= quota THEN n ELSE 0 END) AS BIGINT) AS tok_sel,
        | MIN(CASE WHEN cum_before + n <= quota THEN doc_id END) AS first_doc_id
        |FROM j GROUP BY lang""".stripMargin,
    "q56_mixture" ->
      // the one-reducer spelling: a single per-lang cumsum over the
      // SAME total order (bucket, h, doc_id) the two-phase Spark form
      // decomposes — identical cum_before, identical selection
      """WITH d AS (SELECT doc_id, lang,
        |  len(string_split(text, ' ')) n,
        |  md5(CAST(doc_id AS VARCHAR)) h,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1024 AS bucket
        | FROM documents),
        |c AS (SELECT *, COALESCE(SUM(n) OVER (PARTITION BY lang
        |    ORDER BY bucket, h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_before
        | FROM d),
        |q AS (SELECT *, CASE WHEN lang = 'en' THEN 400 ELSE 150 END quota FROM c)
        |SELECT lang, CAST(MAX(quota) AS BIGINT) AS quota,
        | CAST(SUM(CASE WHEN cum_before + n <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
        | CAST(SUM(CASE WHEN cum_before + n <= quota THEN n ELSE 0 END) AS BIGINT) AS tok_sel,
        | MIN(CASE WHEN cum_before + n <= quota THEN doc_id END) AS first_doc_id
        |FROM q GROUP BY lang""".stripMargin,
    "q184_scd2_history" ->
      // identical event union + one lead() window per key; deletes
      // close intervals without opening
      """WITH ev AS (
        |  SELECT doc_id, lang, CAST(0 AS BIGINT) AS ver, 'upsert' AS op
        |   FROM documents
        |  UNION ALL SELECT doc_id, lang, 1, 'upsert' FROM documents
        |   WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id, lang, 2, 'delete' FROM documents
        |   WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, lang, 3, 'upsert' FROM documents
        |   WHERE doc_id % 3 = 0),
        |h AS (SELECT doc_id, lang, op, ver,
        |  lead(ver) OVER (PARTITION BY doc_id ORDER BY ver) AS ver_to
        | FROM ev)
        |SELECT doc_id, lang, ver AS ver_from, CAST(ver_to AS BIGINT) AS ver_to,
        | CAST(CASE WHEN ver_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |   AS is_current
        |FROM h WHERE op = 'upsert'
        |ORDER BY doc_id ASC, ver_from ASC""".stripMargin,
    "q183_mixture_solver" ->
      // exact integer masses, integer-division solver, dround(6) rate
      s"""WITH m AS (SELECT lang,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS m_tokens
        | FROM documents GROUP BY 1),
        |w AS (SELECT lang, m_tokens,
        |  CAST(CASE WHEN lang = 'en' THEN 40 ELSE 15 END AS BIGINT)
        |    AS p_target FROM m),
        |t AS (SELECT MIN((m_tokens * 100) // p_target) AS t_star FROM w)
        |SELECT lang, m_tokens, p_target, t_star,
        | CAST((t_star * p_target) // 100 AS BIGINT) AS take_tokens,
        | ${graft.core.Exact.sqlDround(
            "CAST((t_star * p_target) // 100 AS DOUBLE)" +
            " / CAST(m_tokens AS DOUBLE)", 6)} AS rate
        |FROM w CROSS JOIN t
        |ORDER BY lang ASC""".stripMargin,
    "q181_decontam_verdict" ->
      // q55's lexical CTEs + q177's semantic rules on ONE shared
      // fixed-size smallest-md5 sample; verdict = either flag fires
      s"""WITH ids AS (SELECT doc_id AS eval_id FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
        |  LIMIT ${graft.operators.Similarity.EvalSampleN}),
        |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |  md5(array_to_string(w[i:i+12], ' ')) AS sh
        | FROM ws, generate_series(1, ${OracleGen.MaxDocSeries}) t(i) WHERE i <= len(w) - 12),
        |ev AS (SELECT eval_id, sh FROM sh JOIN ids ON doc_id = eval_id),
        |tr AS (SELECT doc_id train_id, sh FROM sh
        |  WHERE doc_id NOT IN (SELECT eval_id FROM ids)),
        |rare AS (SELECT sh FROM tr GROUP BY sh HAVING COUNT(*) <= 16),
        |pairs AS (SELECT DISTINCT eval_id, train_id
        | FROM ev JOIN tr USING (sh) JOIN rare USING (sh)),
        |lex AS (SELECT eval_id, COUNT(*) AS n_lex FROM pairs GROUP BY 1),
        |evv AS (SELECT eval_id, embedding AS evv FROM embeddings
        |  JOIN ids ON vec_id = eval_id),
        |trv AS (SELECT embedding FROM embeddings
        |  WHERE vec_id NOT IN (SELECT eval_id FROM ids)),
        |sem AS (SELECT eval_id,
        |  MAX(COALESCE(ROUND(
        |    list_dot_product(CAST(trv.embedding AS DOUBLE[]), CAST(evv.evv AS DOUBLE[]))
        |    / (SQRT(list_dot_product(CAST(trv.embedding AS DOUBLE[]), CAST(trv.embedding AS DOUBLE[])))
        |      * SQRT(list_dot_product(CAST(evv.evv AS DOUBLE[]), CAST(evv.evv AS DOUBLE[])))), 6),
        |    -2.0)) AS max_cos
        | FROM trv CROSS JOIN evv GROUP BY 1),
        |spine AS (SELECT eval_id FROM ids)
        |SELECT s.eval_id,
        | CAST(COALESCE(lex.n_lex, 0) AS BIGINT) AS n_lex_overlaps,
        | sem.max_cos,
        | CAST(CASE WHEN COALESCE(lex.n_lex, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS flag_lex,
        | CAST(CASE WHEN sem.max_cos >= 0.95 THEN 1 ELSE 0 END AS BIGINT) AS flag_sem,
        | CASE WHEN COALESCE(lex.n_lex, 0) > 0 OR sem.max_cos >= 0.95
        |   THEN 'drop' ELSE 'keep' END AS verdict
        |FROM spine s LEFT JOIN lex USING (eval_id)
        |LEFT JOIN sem USING (eval_id)
        |ORDER BY s.eval_id ASC""".stripMargin,
    "q55_contamination" ->
      s"""WITH ws AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS bucket,
        |  string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, bucket,
        |  md5(array_to_string(w[i:i+12], ' ')) AS sh
        | FROM ws, generate_series(1, ${OracleGen.MaxDocSeries}) t(i) WHERE i <= len(w) - 12),
        |ev AS (SELECT doc_id eval_id, sh FROM sh WHERE bucket < 20),
        |tr AS (SELECT doc_id train_id, sh FROM sh WHERE bucket >= 20),
        |rare AS (SELECT sh FROM tr GROUP BY sh HAVING COUNT(*) <= 16),
        |pairs AS (SELECT DISTINCT eval_id, train_id
        | FROM ev JOIN tr USING (sh) JOIN rare USING (sh))
        |SELECT eval_id, COUNT(*) AS n_train_overlaps,
        | MIN(train_id) AS example_train_id
        |FROM pairs GROUP BY 1""".stripMargin,
  )
}
