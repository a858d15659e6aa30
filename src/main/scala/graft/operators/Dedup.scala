package graft.operators

import graft.functions.{hamming64, minhash_sig, simhash64}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design notes (the 100 TB shapes):
  *  - exact: one hash-partitioned groupBy on the text (or its 64-bit hash) —
  *    the minimum possible plan; min(id) survivorship is deterministic.
  *  - minhash/simhash/cosine LSH: candidate generation is an equi join on
  *    a band/bucket key, so Catalyst plans a shuffle-hash join keyed by the
  *    bucket; hot buckets (boilerplate shingles) are capped with a
  *    frequency filter before the self-join — the skew knob.
  *  - pairs are emitted once with idA < idB; "dedup" = drop the larger id
  *    of every verified pair (greedy single-pass survivorship), or the
  *    transitive-closure option: keep only each connected component's min
  *    id ([[connectedComponents]] — union-find below `driverMaxEdges`,
  *    distributed pointer-jumping hash-min above).
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text.
    *
    * Scale shape: the shuffle KEY is `xxhash64(text)` — 8 bytes — not the
    * multi-KB document text; the surviving text rides as the `min_by`
    * aggregation payload, so map-side partial aggregation collapses
    * duplicates to one text per distinct hash per partition before anything
    * crosses the wire. Collision risk (two texts, one 64-bit hash) is the
    * same class MinHash banding already accepts; swap `xxhash64` for
    * `sha2(text, 256)` if 2^-64 per-pair is not acceptable.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("_text_hash"))
      .agg(min(col(idCol)).as(idCol),
        min_by(col(textCol), col(idCol)).as(textCol),
        count(lit(1)).as("dup_count"))
      .select(idCol, textCol, "dup_count")

  /** Incremental dedup of a new `batch` against an existing `archive`
    * (the daily-crawl-vs-corpus shape): keep exactly the batch rows whose
    * text does not appear in the archive.
    *
    * Scale shape: a Bloom filter over the archive's 8-byte text hashes is
    * built with one treeAggregate and broadcast; batch rows that test
    * NEGATIVE are definitely new and never enter a join, so the exact
    * confirmation anti-join (which repairs the filter's false positives)
    * processes only `true_dupes + fpp * |batch|` rows. The archive itself
    * is scanned once for hashes and never shuffled against the batch.
    * At ~10^9 archive docs and fpp 1 % the filter is ~1.2 GB — fine to
    * broadcast; past that, shard the archive and apply per shard, or fall
    * back to the plain hash semi-join (the [[exact]] plan), which this
    * function equals semantically.
    */
  def dedupAgainstArchive(batch: DataFrame, archive: DataFrame,
                          textCol: String, expectedArchiveItems: Long = 1000000L,
                          fpp: Double = 0.01): DataFrame = {
    val archHash = archive.select(xxhash64(col(textCol)).as("_arch_hash"))
    val bloom = archHash.stat.bloomFilter("_arch_hash", expectedArchiveItems, fpp)
    val bloomBc = batch.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomBc.value.mightContainLong(h))
    val probed = batch
      .withColumn("_h", xxhash64(col(textCol)))
      .withColumn("_maybe_dup", mightContain(col("_h")))
    val definitelyNew = probed.filter(!col("_maybe_dup"))
    val confirmedNew = probed.filter(col("_maybe_dup"))
      .join(archHash.withColumnRenamed("_arch_hash", "_h"), Seq("_h"), "left_anti")
    definitelyNew.unionByName(confirmedNew).drop("_h", "_maybe_dup")
  }

  /** Banding parameters for a target Jaccard threshold: among (bands,
    * rows) factorizations of the signature length `k`, pick the pair
    * whose S-curve midpoint (1/b)^(1/r) sits closest to `threshold` —
    * the standard MMDS ch.3 heuristic (candidate probability for a pair
    * at similarity s is 1 - (1 - s^r)^b, steepest near the midpoint).
    * Returns (bands, rows).
    */
  def minhashParams(k: Int, threshold: Double): (Int, Int) = {
    require(k > 0 && threshold > 0 && threshold < 1, "need k > 0, 0 < threshold < 1")
    (1 to k).filter(k % _ == 0).map(b => (b, k / b))
      .minBy { case (b, r) => math.abs(math.pow(1.0 / b, 1.0 / r) - threshold) }
  }

  /** MinHash LSH candidate pairs: signatures banded; docs sharing any band
    * bucket become candidates; verified by estimated Jaccard (fraction of
    * equal signature positions) >= `threshold`. Returns (idA, idB, est_jaccard)
    * with idA < idB.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 64, shingle: Int = 5, bands: Int = 16,
                   threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame =
    minhashPairsFromSig(
      df.select(col(idCol).as("id"), minhash_sig(col(textCol), k, shingle).as("sig")),
      k, bands, threshold, maxBucketSize)

  /** Banding + bucket self-join + estimated-Jaccard verification over a
    * precomputed signature table (id, sig: array). Split out so the
    * scale-critical join machinery is DuckDB-oracle-checkable with
    * SQL-expressible synthetic signatures, independent of the hash
    * expression (which is golden-tested against brute force in DedupSpec).
    * The band bucket key is the signature slice itself (array equi-join
    * key) — semantically identical to hashing it, minus hash collisions.
    */
  def minhashPairsFromSig(sig: DataFrame, k: Int, bands: Int, threshold: Double,
                          maxBucketSize: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, lit(rows)))).as(Seq("band", "bucket")))

    // skew cap: drop pathological buckets (boilerplate) before the self-join
    val bucketCounts = banded.groupBy("band", "bucket").count()
      .filter(col("count") <= maxBucketSize).select("band", "bucket")
    val pruned = banded.join(bucketCounts, Seq("band", "bucket"))

    val a = pruned.select(col("band"), col("bucket"), col("id").as("idA"), col("sig").as("sigA"))
    val b = pruned.select(col("band"), col("bucket"), col("id").as("idB"), col("sig").as("sigB"))
    val est = aggregate(
      zip_with(col("sigA"), col("sigB"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k
    a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("idA", "idB").agg(first("est_jaccard").as("est_jaccard"))
  }

  /** Near-dup removal from verified pairs.
    *
    * Default (greedy, single anti-join pass): a doc survives unless a
    * smaller-id near-duplicate exists — i.e. drop every id that appears as
    * the larger side of any pair. One shuffle, no iteration.
    *
    * `transitive = true`: treat pairs as edges of a similarity graph and
    * keep exactly the min id of each CONNECTED COMPONENT (hash-min label
    * propagation, see [[connectedComponents]]). The two differ when two
    * surviving-under-greedy docs are linked only through a common larger-id
    * neighbour: pairs (1,3),(2,3) — greedy keeps {1,2}, closure keeps {1}.
    * Iterations = component diameter; the propagation runs over the pair
    * GRAPH only (verified near-dups, orders of magnitude smaller than the
    * corpus), never over the document table.
    */
  def dropDuplicatesByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                            transitive: Boolean = false): DataFrame =
    if (!transitive)
      df.join(pairs.select(col("idB").as(idCol)).distinct(), Seq(idCol), "left_anti")
    else {
      val dropIds = connectedComponents(pairs)
        .filter(col("label") =!= col("id"))
        .select(col("id").as(idCol))
      df.join(dropIds, Seq(idCol), "left_anti")
    }

  /** Connected components over an (idA, idB) pair table: returns
    * (id, label) where label = the smallest id reachable from `id`.
    *
    * VERIFIED near-dup pair tables are orders of magnitude smaller than
    * the corpus (they are the LSH join's survivors), so graphs up to
    * `driverMaxEdges` undirected edges are solved exactly with driver-side
    * union-find — O(E a(E)), one collect of bare id pairs (16 bytes/edge;
    * the 5M default is ~80 MB), zero iterative Spark jobs. Larger graphs
    * run the distributed hash-min loop: each round takes the min label
    * over {self, edge neighbours, the label's OWN label (pointer
    * jumping — label chains collapse doubly-exponentially, rounds ~
    * log2(diameter))}; convergence is read from sum(label) in the same
    * pass (labels only decrease, so an unchanged sum == fixpoint, no
    * comparison join); frames are cached per round and localCheckpointed
    * periodically to bound lineage.
    */
  def connectedComponents(pairs: DataFrame, driverMaxEdges: Long = 5000000L): DataFrame = {
    val spark = pairs.sparkSession
    // Size probe and edge fetch in ONE job (optimization round — the old
    // shape ran a distinct+count job over the doubled edge list and then
    // RE-COMPUTED the pair plan for the collect): pull at most
    // driverMaxEdges + 1 directed pairs; an overflow row means "too big,
    // go distributed". The doubled/distinct edge frame is only built (and
    // cached) on the distributed path.
    val probeCap = math.min(driverMaxEdges + 1, (Int.MaxValue - 8).toLong).toInt
    val es = pairs.select(col("idA").cast("long"), col("idB").cast("long"))
      .limit(probeCap).collect()
    if (es.length < probeCap || driverMaxEdges >= Int.MaxValue - 8) {
      // primitive open-addressed parent table (~16 B/slot at <=50% load vs
      // several hundred MB of boxed map entries at the 5M-edge ceiling)
      val parent = new LongLongMap(es.length * 2 + 16)
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent.put(c, r); c = n
        }
        r
      }
      es.foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        if (!parent.contains(a)) parent.put(a, a)
        if (!parent.contains(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) { // union by min: smaller root wins (the label semantics)
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      import spark.implicits._
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.foreachKey(id => out += ((id, find(id))))
      return out.toSeq.toDF("id", "label")
    }
    val edges = pairs.select(col("idA").as("src"), col("idB").as("dst"))
      .union(pairs.select(col("idB").as("src"), col("idA").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var prevSum = labels.agg(sum("label")).head().getLong(0)
    var done = false
    var round = 0
    while (!done) {
      val viaEdges = edges.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label"))
      // pointer jump: follow my label to ITS label
      val jump = labels.join(
        labels.select(col("id").as("label"), col("label").as("label2")), Seq("label"))
        .select(col("id"), col("label2").as("label"))
      val next0 = labels.select("id", "label").union(viaEdges).union(jump)
        .groupBy("id").agg(min("label").as("label"))
      val next = (if (round % 4 == 3) next0.localCheckpoint(false) else next0).cache()
      val s = next.agg(sum("label")).head().getLong(0)
      labels.unpersist()
      labels = next
      done = s == prevSum
      prevSum = s
      round += 1
    }
    edges.unpersist()
    labels
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming. Banding the
    * 64-bit signature into (maxHamming + 1) chunks guarantees (pigeonhole)
    * that every qualifying pair shares at least one exact chunk — candidate
    * generation is an equi join on (chunk index, chunk value).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame =
    simhashPairsFromSig(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig")),
      maxHamming, maxBucketSize)

  /** Banding + capped bucket self-join + Hamming verification over a
    * precomputed 64-bit signature column (id, sig) — split out so the join
    * machinery is DuckDB-oracle-checkable with SQL-expressible synthetic
    * signatures. `maxBucketSize` caps hot chunks (blank/boilerplate docs
    * all simhash to the same chunk values), keeping the self-join linear.
    */
  def simhashPairsFromSig(sig: DataFrame, maxHamming: Int,
                          maxBucketSize: Int): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val chunks = (0 until nBands).map(b =>
      pmod(shiftright(col("sig"), b * width), lit(1L << width)))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array(chunks: _*)).as(Seq("band", "chunk")))

    // skew cap: same knob as minhashPairs — hot chunk values are dropped
    // before the self-join (pairs in them are only found via other bands)
    val bucketCounts = banded.groupBy("band", "chunk").count()
      .filter(col("count") <= maxBucketSize).select("band", "chunk")
    val pruned = banded.join(bucketCounts, Seq("band", "chunk"))

    val a = pruned.select(col("band"), col("chunk"), col("id").as("idA"), col("sig").as("sigA"))
    val b = pruned.select(col("band"), col("chunk"), col("id").as("idB"), col("sig").as("sigB"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), hamming64(col("sigA"), col("sigB")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("idA", "idB").agg(first("hamming").as("hamming"))
  }

  /** Exact word n-gram Jaccard similarity for candidate pairs that share at
    * least one n-gram (inverted-index join). `maxNgramFreq` drops
    * stop-n-grams to bound the join fan-out (the skew knob).
    * Returns (idA, idB, jaccard) with idA < idB, jaccard >= threshold.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxNgramFreq: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    val toks0 = df.select(col(idCol).as("id"),
      split(trim(col(textCol)), "\\s+").as("toks"))
    // a small-file input arrives in fewer partitions than cores and would
    // serialize the gram fan-out on one task — widen ONLY under-parallel
    // inputs (guide §2.5; wide inputs pass through untouched)
    val toks =
      if (toks0.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        toks0.repartition(spark.sparkContext.defaultParallelism)
      else toks0
    // per-document gram dedup is per-ROW work (a gram only repeats within
    // one document's (id, gram) pairs) — array_distinct in the scan
    // stage instead of a corpus-wide distinct exchange. The gram table
    // feeds four consumers (sizes, frequency cap, both self-join sides);
    // the old plan shared it through the distinct's exchange files, so
    // materialize it ONCE via localCheckpoint (same disk-backed reuse,
    // no 256-way exchange of every gram).
    val grams = toks.select(col("id"),
      explode(array_distinct(transform(sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))).as("gram"))
      .localCheckpoint()
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("setSize"))

    val common = grams.join(grams.groupBy("gram").count()
        .filter(col("count") <= maxNgramFreq).select("gram"), Seq("gram"))
    val a = common.select(col("gram"), col("id").as("idA"))
    val b = common.select(col("gram"), col("id").as("idB"))
    val shared = a.join(b, Seq("gram")).filter(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("idA"), col("setSize").as("sizeA")), Seq("idA"))
      .join(sizes.select(col("id").as("idB"), col("setSize").as("sizeB")), Seq("idB"))
      .select(col("idA"), col("idB"),
        (col("shared").cast("double") / (col("sizeA") + col("sizeB") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Embedding near-dup pairs by cosine >= threshold. Candidates via
    * random-hyperplane LSH (deterministic planes from `seed`): vectors
    * sharing a sign-pattern bucket are compared exactly. `nPlanes` trades
    * recall for bucket size; `bucketGroups` buckets of fewer planes OR'd
    * raise recall (a pair is a candidate if any group matches).
    */
  def cosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, nPlanes: Int = 8,
                     bucketGroups: Int = 4, dim: Int = 64, seed: Long = 42,
                     maxBucketSize: Int = 1000): DataFrame = {
    val planes = lshPlanes(nPlanes, bucketGroups, dim, seed)
    val v = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
    // sign-pattern buckets via the HyperplaneLsh expression (compact plan;
    // the unrolled column form exceeded Janino's 64 KB codegen limit).
    // Vectors are NOT carried into the bucket self-join: candidate ids are
    // generated and deduped on (grp, bucket, id) keys only, then the two
    // vectors are equi-joined back for the exact-cosine verification — the
    // pair shuffle moves 16 bytes/row instead of 2 x dim doubles.
    val bucketed = v
      .withColumn("buckets", graft.functions.hyperplane_lsh(col("vec"), planes, nPlanes))
      .select(col("id"), posexplode(col("buckets")).as(Seq("grp", "bucket")))

    // skew cap: hot sign-pattern buckets (zero/boilerplate embeddings)
    // are dropped before the self-join
    val bucketCounts = bucketed.groupBy("grp", "bucket").count()
      .filter(col("count") <= maxBucketSize).select("grp", "bucket")
    val pruned = bucketed.join(bucketCounts, Seq("grp", "bucket"))

    val a = pruned.select(col("grp"), col("bucket"), col("id").as("idA"))
    val b = pruned.select(col("grp"), col("bucket"), col("id").as("idB"))
    val candidates = a.join(b, Seq("grp", "bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
    // exact verification as a typed kernel (optimization round): the
    // expression-fold cosine allocates per lambda step across every
    // candidate pair; the loop below replicates its evaluation order
    // (dot, then each norm, left-to-right) and Spark's NaN-as-largest
    // `>=` semantics bit for bit, in one narrow pass after the joins.
    val joined = candidates
      .join(v.select(col("id").as("idA"), col("vec").as("vecA")), Seq("idA"))
      .join(v.select(col("id").as("idB"), col("vec").as("vecB")), Seq("idB"))
      .select(col("idA"), col("idB"), col("vecA"), col("vecB"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      joined.schema.head, joined.schema(1),
      org.apache.spark.sql.types.StructField("cosine",
        org.apache.spark.sql.types.DoubleType)))
    val th = threshold
    joined.mapPartitions { rows =>
      rows.flatMap { r =>
        val av = r.getSeq[Double](2)
        val bv = r.getSeq[Double](3)
        // a length mismatch nulls the expression cosine, and null fails
        // the >= filter — replicate by dropping the pair
        if (av == null || bv == null || av.length != bv.length) None
        else {
          var dot = 0.0; var i = 0
          while (i < av.length) { dot += av(i) * bv(i); i += 1 }
          var na = 0.0; i = 0
          while (i < av.length) { na += av(i) * av(i); i += 1 }
          var nb = 0.0; i = 0
          while (i < bv.length) { nb += bv(i) * bv(i); i += 1 }
          val c = dot / (math.sqrt(na) * math.sqrt(nb))
          // Spark double `>=`: NaN is the largest value
          if ((c != c) || c >= th) Some(org.apache.spark.sql.Row(r.get(0), r.get(1), c))
          else None
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Deterministic random-hyperplane directions (plane p component j from a
    * splitmix-style mix of the seed) — shared by the operator and the
    * generated DuckDB oracle SQL.
    */
  def lshPlanes(nPlanes: Int, bucketGroups: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(bucketGroups * nPlanes) { p =>
      Array.tabulate(dim) { j =>
        (graft.functions.TextHash.mix64(seed + p * 1000003L + j) >>> 11).toDouble / (1L << 53).toDouble * 2 - 1
      }
    }

  /** Duplicated-passage statistics (substring-level exact dedup, the
    * Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    * Better" shape at word granularity): a token position is DUPLICATED
    * when any word `n`-gram covering it occurs at least `minCount` times
    * across the whole corpus. Returns one row per document with
    * `n_tokens`, `n_dup_tokens` (positions covered by at least one
    * duplicated n-gram, overlaps unioned), and `dup_frac` — the inputs a
    * pipeline needs to cut repeated boilerplate passages or drop
    * high-overlap documents entirely.
    *
    * Scale shape: each row computes its n-gram xxhash64 array with one
    * in-codegen `transform` (the text is never re-tokenized per gram);
    * the ONLY wide exchanges are keyed by the 8-byte gram hash — the
    * partial-aggregated occurrence count and the start-position join
    * back — and the per-document interval union runs as a declarative
    * `aggregate` over that document's (typically short) sorted
    * start-position array, not a window over the full token stream.
    * Gram survivors ship as bare (id, pos) pairs; document text crosses
    * the wire zero times.
    */
  def duplicatedPassageStats(df: DataFrame, idCol: String, textCol: String,
                             n: Int = 5, minCount: Long = 2L,
                             broadcastStarts: Boolean = true): DataFrame = {
    val (base, dupStarts0) = dupPassageStarts(df, idCol, textCol, n, minCount)
    // dupStarts holds only documents carrying duplicated grams — normally
    // far smaller than the corpus. Broadcast it EXPLICITLY so the join
    // back onto `base` cannot plan as a sort-merge that ships the __toks
    // token arrays (the "text never shuffles" claim); pass
    // broadcastStarts=false for a pathological corpus where most
    // documents are duplicated and the starts table is itself huge.
    val dupStarts = if (broadcastStarts) broadcast(dupStarts0) else dupStarts0
    // union of [p, p+n) intervals: one pass over the sorted starts
    val acc0 = struct(lit(-1L).as("lastEnd"), lit(0L).as("tot"))
    val covered = aggregate(col("__ps"), acc0,
      (acc, p0) => {
        val p = p0.cast("long")
        struct(
          greatest(acc.getField("lastEnd"), p + n).as("lastEnd"),
          (acc.getField("tot") +
            greatest(lit(0L), p + n - greatest(acc.getField("lastEnd"), p))).as("tot"))
      },
      _.getField("tot"))
    base.join(dupStarts, Seq(idCol), "left")
      .select(col(idCol), col("__nt").as("n_tokens"),
        coalesce(covered, lit(0L)).as("n_dup_tokens"))
      .withColumn("dup_frac",
        when(col("n_tokens") > 0,
          col("n_dup_tokens").cast("double") / col("n_tokens")).otherwise(lit(0.0)))
  }

  /** Shared candidate machinery for the duplicated-passage family:
    * returns (`base` = (id, __toks, __nt), `dupStarts` = (id, __ps) with
    * the sorted start positions of corpus-duplicated n-grams per doc).
    * See [[duplicatedPassageStats]] for the scale shape.
    */
  private def dupPassageStarts(df: DataFrame, idCol: String, textCol: String,
                               n: Int, minCount: Long): (DataFrame, DataFrame) = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val toks = split(trim(col(textCol)), "\\s+")
    val base = df.select(col(idCol), toks.as("__toks"))
      .withColumn("__nt", when(length(concat_ws("", col("__toks"))) === 0, 0)
        .otherwise(size(col("__toks"))).cast("long"))
    val grams = base.select(
      col(idCol), col("__nt"),
      when(col("__nt") >= n,
        transform(sequence(lit(0), col("__nt").cast("int") - n),
          i => xxhash64(concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))))
        .otherwise(array().cast("array<bigint>")).as("__ghs"))
    val gramStream = grams
      .select(col(idCol), posexplode(col("__ghs")).as(Seq("pos", "gh")))
    val dupGrams = gramStream.groupBy("gh")
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= minCount).select("gh")
    val dupStarts = gramStream.join(dupGrams, Seq("gh"))
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("pos"))).as("__ps"))
    (base, dupStarts)
  }

  /** Cut duplicated passages OUT of the text (the destructive half of
    * [[duplicatedPassageStats]]): every token position covered by a
    * corpus-duplicated n-gram is removed and the survivors are re-joined
    * with single spaces into `text_deduped` (empty string when the whole
    * document was duplicated passages). Same candidate plan as the stats
    * variant — the only additional work is a per-row indexed `filter`
    * over the token array against that row's (short, sorted) dup-start
    * list, so the text still never shuffles.
    */
  def cutDuplicatedPassages(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 5, minCount: Long = 2L,
                            broadcastStarts: Boolean = true): DataFrame = {
    val (base, dupStarts0) = dupPassageStarts(df, idCol, textCol, n, minCount)
    // see duplicatedPassageStats: keep the token arrays out of any shuffle
    val dupStarts = if (broadcastStarts) broadcast(dupStarts0) else dupStarts0
    val starts = coalesce(col("__ps"), array().cast("array<int>"))
    val kept = filter(col("__toks"),
      (w, i) => !exists(starts, p => p <= i && i < p + n))
    base.join(dupStarts, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__nt") === 0, lit("")).otherwise(concat_ws(" ", kept))
          .as("text_deduped"))
  }

  /** Leakage-free train/validation split: every document in the same
    * near-duplicate connected component (from a verified `(idA, idB)`
    * pair table) is assigned to the SAME side, so no near-duplicate of a
    * validation document can leak into the training set. The component
    * representative (its min id, via [[connectedComponents]]; a document
    * in no pair represents itself) is hashed through `splitKey` and the
    * row goes to "val" iff `splitKey(rep) mod 2^20 < valFrac * 2^20`.
    *
    * `splitKey` defaults to the salted `xxhash64` of
    * [[TextAnalysis.deterministicSample]] — membership is a pure function
    * of the representative id, stable across partitioning, retries, and
    * appends. Pass e.g. `pmod(_, lit(1000))` when the split must be
    * reproducible by an external system without xxhash64.
    *
    * Scale shape: the component labels exist only for documents that
    * appear in a pair (orders of magnitude fewer than the corpus); they
    * broadcast-join back onto the table, and the split decision is a
    * per-row expression — the corpus itself is never shuffled.
    */
  def leakageFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       valFrac: Double, seed: Int = 42,
                       splitKey: Column => Column = null,
                       driverMaxEdges: Long = 5000000L,
                       broadcastLabels: Boolean = true): DataFrame = {
    require(valFrac >= 0 && valFrac <= 1, s"valFrac must be in [0,1], got $valFrac")
    val key: Column => Column =
      if (splitKey != null) splitKey else (c: Column) => xxhash64(c, lit(seed))
    val M = 1L << 20
    val labels0 = connectedComponents(pairs, driverMaxEdges)
      .withColumnRenamed("id", idCol)
    // labels exist only for paired docs — normally broadcast-sized; pass
    // broadcastLabels=false when the pair graph itself is huge and the
    // join should shuffle instead of forcing a giant broadcast
    val labels = if (broadcastLabels) broadcast(labels0) else labels0
    df.join(labels, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("label"), col(idCol)))
      .withColumn("split",
        when(pmod(key(col("__rep")), lit(M)) < (lit(valFrac) * M).cast("long"), "val")
          .otherwise("train"))
      .drop("label", "__rep")
  }
}

/** Open-addressed long -> long hash map (linear probing, power-of-two
  * capacity, <= 50% load): the driver union-find's parent table. ~16 B per
  * occupied slot + the table overhead, vs hundreds of bytes per entry for
  * a boxed `mutable.Map[Long, Long]` at the 5M-edge ceiling.
  */
private[operators] final class LongLongMap(initialEntries: Int) {
  private var cap = {
    var c = 16
    val want = math.max(16, initialEntries)
    while (c < want * 2 && c < (1 << 30)) c <<= 1
    c
  }
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var occ = new Array[Boolean](cap)
  private var n = 0

  private def slot(k: Long): Int = {
    var h = k * -7046029254386353131L // Stafford mix
    h ^= (h >>> 32)
    var i = (h & (cap - 1)).toInt
    while (occ(i) && keys(i) != k) i = (i + 1) & (cap - 1)
    i
  }

  def contains(k: Long): Boolean = occ(slot(k))

  def getOrElse(k: Long, dflt: Long): Long = {
    val i = slot(k)
    if (occ(i)) vals(i) else dflt
  }

  def put(k: Long, v: Long): Unit = {
    val i = slot(k)
    if (!occ(i)) {
      occ(i) = true; keys(i) = k; n += 1
      vals(i) = v
      if (n.toLong * 2 > cap) grow()
    } else vals(i) = v
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val oo = occ; val ocap = cap
    cap <<= 1
    keys = new Array[Long](cap); vals = new Array[Long](cap); occ = new Array[Boolean](cap)
    var i = 0
    while (i < ocap) {
      if (oo(i)) { val s = slot(ok(i)); occ(s) = true; keys(s) = ok(i); vals(s) = ov(i) }
      i += 1
    }
  }

  def foreachKey(f: Long => Unit): Unit = {
    var i = 0
    while (i < cap) { if (occ(i)) f(keys(i)); i += 1 }
  }
}
