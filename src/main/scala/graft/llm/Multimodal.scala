package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time inside partitions.
  *
  * The Spark-side contract is real and tested — schema, partition-iterator
  * batching, deterministic output shape; only the *codec* is a stub
  * (`FakeCodec`): the container ships no image/audio libraries, so decode is
  * a deterministic byte-level fake with the same signature a real codec
  * (e.g. a JNI JPEG decoder) would have. Swap [[MediaCodec]] implementations
  * to go real — nothing else changes.
  *
  * Scale notes: `mapPartitions` keeps one codec instance per task (the
  * expensive-init analog of a per-executor model), media bytes never pass
  * through a shuffle (features are extracted scan-side and are ~10³× smaller
  * than the media), and batches are size-bounded by the source's
  * `maxPartitionBytes`, not row counts.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRow(media_id: Long, media: Array[Byte], format: String,
      width: Int, height: Int)

  /** Extracted features: fixed-dim vector + shape metadata. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
      features: Array[Double])

  /** The pluggable codec boundary. Implementations must be deterministic
    * per input bytes. */
  trait MediaCodec extends Serializable {
    def decodeToFeatures(bytes: Array[Byte], dim: Int): Array[Double]
    /** Resample a w×h raster to outW×outH. */
    def resize(bytes: Array[Byte], w: Int, h: Int, outW: Int, outH: Int): Array[Byte]
  }

  /** STUB codec — deterministic byte-bucket histogram + nearest-neighbor
    * byte resample. Stands in for a real decode+embed (no media libs in
    * this container). */
  object FakeCodec extends MediaCodec {
    def decodeToFeatures(bytes: Array[Byte], dim: Int): Array[Double] = {
      val hist = new Array[Double](dim)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) % dim) += 1.0
        i += 1
      }
      val n = math.max(bytes.length, 1).toDouble
      hist.map(_ / n)
    }

    /** Nearest-neighbor on the raw byte grid: out(i,j) = in(⌊i·h/outH⌋,
      * ⌊j·w/outW⌋), integer arithmetic — deterministic and oracle-
      * mirrorable. Out-of-range source pixels (ragged byte counts) map
      * to 0. */
    def resize(bytes: Array[Byte], w: Int, h: Int, outW: Int, outH: Int): Array[Byte] = {
      val out = new Array[Byte](outW * outH)
      var i = 0
      while (i < outH) {
        val sy = (i.toLong * h / outH).toInt
        var j = 0
        while (j < outW) {
          val sx = (j.toLong * w / outW).toInt
          val src = sy * w + sx
          out(i * outW + j) = if (src < bytes.length) bytes(src) else 0
          j += 1
        }
        i += 1
      }
      out
    }
  }

  /** Wrap a text corpus as a fake media table (binary = utf8 bytes) — the
    * harness has no binary tables, so tests/queries synthesize one. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      lit("utf8").as("format"),
      col("n_chars").cast("int").as("width"),
      lit(1).as("height"))

  /** Feature extraction over media batches: one codec per partition,
    * iterator-to-iterator (no materialization of the whole partition). */
  def extractFeatures(media: DataFrame, dim: Int = 16,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { it =>
      // per-task codec init happens here (real codecs are expensive to open)
      it.map { r =>
        MediaFeatures(r.media_id, r.media.length.toLong, r.format,
          codec.decodeToFeatures(r.media, dim))
      }
    }.toDF()
  }

  /** Resize through the codec boundary: (media_id, media, w, h) → resampled
    * binary + updated shape metadata. Same iterator-to-iterator shape as
    * [[extractFeatures]] — per-task codec init, media bytes never shuffle. */
  def resize(media: DataFrame, outW: Int, outH: Int,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaRow(r.media_id, codec.resize(r.media, r.width, r.height, outW, outH),
          r.format, outW, outH)
      }
    }.toDF()
  }

  /** Exact binary dedup over opaque media: identical byte content collapses
    * to one group keyed by a 128-bit digest — the media analog of
    * [[Dedup.exactDedup]], and the only dedup possible without decoding.
    * Scale shape: the digest is computed scan-side (codegen'd `md5`), so
    * only (hash, id) pairs reach the shuffle — the media bytes themselves
    * never leave the scan stage. */
  def dedupExact(media: DataFrame): DataFrame =
    media
      .select(md5(col("media")).as("content_hash"), col("media_id"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("canonical_id"))

  /** PERCEPTUAL near-duplicate media detection — the re-encode catcher
    * [[dedupExact]] cannot be: a re-encoded duplicate (different bytes,
    * same content — the dominant duplicate mode in a crawled multimodal
    * corpus) has a different digest but a near-identical FEATURE vector,
    * so near-dup runs in feature space:
    *
    *   1. decode → features at the codec boundary (scan-side
    *      [[extractFeatures]]; media bytes never leave the scan stage —
    *      everything past this line moves ~10³×-smaller vectors);
    *   2. perceptual hash: each feature quantized to `quantLevels`
    *      levels (floor(f·q) — pure integer arithmetic on the
    *      deterministic codec output, so the hash is oracle-able);
    *   3. LSH-style banding: the quantized vector splits into
    *      dim/bandCoords bands of `bandCoords` coordinates packed into
    *      one long each; candidate pairs agree EXACTLY on ≥1 band (the
    *      multi-probe index lookup a production pHash store runs) —
    *      never all-pairs, and a degenerate hot band is capped by the
    *      [[Dedup.capBuckets]] rail with the observe()-surfaced drop
    *      counter;
    *   4. verify: exact feature cosine ≥ `threshold` over the candidate
    *      pairs only ([[graft.expr.DotProduct]] — sequential fold,
    *      bit-identical to the DuckDB oracle's list_reduce).
    *
    * The band-match ∧ cosine≥τ predicate IS the published contract (the
    * q_embed_near_dups label-block discipline: the oracle mirrors the
    * blocking, so the result is exact, not best-effort). Returns
    * (id_a < id_b, score). */
  def dedupNear(media: DataFrame, threshold: Double = 0.9995,
      dim: Int = 16, bandCoords: Int = 4, quantLevels: Int = 256,
      maxBucket: Int = 4096, codec: MediaCodec = FakeCodec): DataFrame = {
    require(dim % bandCoords == 0,
      s"dim must be a multiple of bandCoords: $dim, $bandCoords")
    // the packed band key gives each coordinate 16 bits: quantized values
    // reach quantLevels exactly (a feature of 1.0), and 4 coords × 16
    // bits fills the long without collision
    require(quantLevels >= 2 && quantLevels < 65536,
      s"quantLevels must be in [2, 65535]: $quantLevels")
    require(bandCoords >= 1 && bandCoords <= 4,
      s"bandCoords must be in [1, 4] (packed into one long): $bandCoords")
    dedupNearFromFeatures(
      extractFeatures(media, dim, codec).select(col("media_id"), col("features")),
      threshold, dim, bandCoords, quantLevels, maxBucket)
  }

  /** The band → cap → pair → verify tail of [[dedupNear]] over an
    * EXISTING feature frame — the serving form for persisted or
    * stream-maintained features artifacts
    * ([[graft.streaming.StreamingMedia]]): near-dup over maintained
    * features never touches (or decodes) media at all. */
  def dedupNearFromFeatures(featFrame: DataFrame, threshold: Double = 0.9995,
      dim: Int = 16, bandCoords: Int = 4, quantLevels: Int = 256,
      maxBucket: Int = 4096): DataFrame = {
    require(dim % bandCoords == 0,
      s"dim must be a multiple of bandCoords: $dim, $bandCoords")
    require(quantLevels >= 2 && quantLevels < 65536,
      s"quantLevels must be in [2, 65535]: $quantLevels")
    require(bandCoords >= 1 && bandCoords <= 4,
      s"bandCoords must be in [1, 4] (packed into one long): $bandCoords")
    // checkpointed: consumed by the band table AND both verify sides —
    // and for [[dedupNear]]'s inline build the truncation drops the
    // media scan from downstream lineage, so no exchange below ever
    // carries the binary column
    val feats = featFrame.localCheckpoint(eager = false)
    val capped = Dedup.capBuckets(
      bandFrame(feats, dim, bandCoords, quantLevels), maxBucket,
      "media_neardup")
    val cands = capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    verifyPairs(cands, feats, threshold, "id_a", "id_b")
  }

  /** The quantized perceptual-hash band table of a feature frame —
    * (media_id, band, band_hash): each feature floor-quantized to
    * `quantLevels` levels, `bandCoords` consecutive coords packed
    * radix-65536 into one long per band. Pure column math over the
    * features, so in steady state it derives scan-side from the
    * PERSISTED features artifact — no media access, no decode. */
  private def bandFrame(feats: DataFrame, dim: Int, bandCoords: Int,
      quantLevels: Int): DataFrame = {
    val nBands = dim / bandCoords
    feats.select(col("media_id"), posexplode(
        transform(sequence(lit(0), lit(nBands - 1)),
          b => aggregate(
            slice(transform(col("features"),
              f => floor(f * lit(quantLevels.toDouble)).cast("long")),
              b * bandCoords + 1, lit(bandCoords)),
            lit(0L), (acc, v) => acc * lit(65536L) + v))))
      .toDF("media_id", "band", "band_hash")
  }

  /** Exact-cosine verification of candidate pairs against a feature
    * frame: both sides attach by broadcasting the (bounded) candidate
    * list INTO the feature scan, so the feature corpus is scanned, never
    * shuffled. */
  private def verifyPairs(cands: DataFrame, feats: DataFrame,
      threshold: Double, leftCol: String, rightCol: String): DataFrame = {
    val dot = graft.expr.DotProduct.apply(_: Column, _: Column)
    val fa = feats.select(col("media_id").as(leftCol), col("features").as("fa"))
    val fb = feats.select(col("media_id").as(rightCol), col("features").as("fb"))
    fa.join(broadcast(cands), Seq(leftCol))
      .transform(withA => fb.join(broadcast(withA), Seq(rightCol)))
      .withColumn("score", dot(col("fa"), col("fb")) /
        (sqrt(dot(col("fa"), col("fa"))) * sqrt(dot(col("fb"), col("fb")))))
      .filter(col("score") >= threshold)
      .select(col(leftCol), col(rightCol), col("score"))
  }

  /** INCREMENTAL perceptual near-dup — the steady-state ingest form of
    * [[dedupNear]]: a new media batch checks against a PERSISTED corpus
    * features artifact (media_id, features — the compact thing to store;
    * ~10³× smaller than the media), so an ingest decodes ONLY the batch:
    * the corpus media is never re-read and never re-decoded, and the
    * corpus side is never shuffled —
    *
    *   - the batch's band keys BROADCAST as a semi-join gate over the
    *     corpus band derivation (scan-side column math on the features
    *     artifact), so only band-colliding corpus rows go anywhere;
    *   - the hot-band cap ([[Dedup.capBuckets]]) windows over that
    *     matched subset — bounded by the batch's reach, not the corpus;
    *   - candidate pairs and the exact-cosine verify attach by
    *     broadcasting the (bounded) pair list into the feature scans.
    *
    * Re-ingest semantics ([[Dedup.incrementalNearDups]]): a media_id in
    * both frames is the batch's version — the stale corpus copy is
    * excluded from bands and verify alike. Returns (id_new, id_other,
    * score) with id_new always from the batch; batch-internal pairs keep
    * the (smaller, larger) orientation. Corpus-internal pairs are not
    * re-derived (they are already in the pair store — [[dedupNear]]'s
    * job at build time). */
  def dedupNearIncremental(newMedia: DataFrame, corpusFeats: DataFrame,
      threshold: Double = 0.9995, dim: Int = 16, bandCoords: Int = 4,
      quantLevels: Int = 256, maxBucket: Int = 4096,
      codec: MediaCodec = FakeCodec): DataFrame = {
    require(dim % bandCoords == 0,
      s"dim must be a multiple of bandCoords: $dim, $bandCoords")
    require(quantLevels >= 2 && quantLevels < 65536,
      s"quantLevels must be in [2, 65535]: $quantLevels")
    require(bandCoords >= 1 && bandCoords <= 4,
      s"bandCoords must be in [1, 4] (packed into one long): $bandCoords")
    val batchFeats = extractFeatures(newMedia, dim, codec)
      .select(col("media_id"), col("features"))
      .localCheckpoint(eager = false)
    // stale-copy exclusion: broadcast anti-join on the (small) batch ids
    val corpus = corpusFeats.select(col("media_id"), col("features"))
      .join(broadcast(batchFeats.select(col("media_id"))),
        Seq("media_id"), "left_anti")
    val bBatch = bandFrame(batchFeats, dim, bandCoords, quantLevels)
      .withColumn("from_batch", lit(true))
      .localCheckpoint(eager = false)
    val corpusMatched = bandFrame(corpus, dim, bandCoords, quantLevels)
      .join(broadcast(bBatch.select(col("band"), col("band_hash")).distinct()),
        Seq("band", "band_hash"), "left_semi")
      .withColumn("from_batch", lit(false))
    val bSide = Dedup.capBuckets(corpusMatched.unionByName(bBatch),
      maxBucket, "media_neardup_incr")
    val cands = bSide.as("b")
      .join(broadcast(bBatch).as("a"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          (!col("b.from_batch") || col("a.media_id") < col("b.media_id")) &&
          col("a.media_id") =!= col("b.media_id"))
      .select(col("a.media_id").as("id_new"), col("b.media_id").as("id_other"))
      .distinct()
    verifyPairs(cands, batchFeats.unionByName(corpus), threshold,
      "id_new", "id_other")
  }

  /** FRAME-CONTAINMENT detection for "video" media — the exact-substring
    * containment analog at the media layer: two videos are related iff
    * they share ≥ `minShared` distinct sampled-frame digests. This is the
    * clipped-copy catcher the whole-file digest ([[dedupExact]]) and the
    * whole-media feature vector ([[dedupNear]]) both miss: a clip whose
    * cut lands on the sampling grid (offset ≡ 0 mod frameBytes·everyNth)
    * shares every one of its sampled frames with the original even though
    * its bytes, digest, and global feature histogram all differ.
    *
    * Scale shape: frames and digests are scan-side ([[sampleFrames]] +
    * codegen'd md5 — media bytes never leave the scan), per-media frame
    * sets are DISTINCT (containment counts distinct shared frames), the
    * pair join keys on the digest — never all-pairs — and `maxFrameDf`
    * rails the digest-group width exactly like the inverted index's
    * maxDf: a filler frame shared by millions of videos is the stopword
    * of this index, capped via the shared observe()-surfaced rail.
    * Returns (id_a < id_b, n_shared). */
  def frameOverlap(media: DataFrame, frameBytes: Int = 64, everyNth: Int = 4,
      minShared: Int = 2, maxFrameDf: Int = 4096): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val frames = sampleFrames(media, frameBytes, everyNth)
      .select(col("media_id"), md5(col("frame")).as("band_hash"))
      .distinct()
      .withColumn("band", lit(0))
    val capped = Dedup.capBuckets(frames, maxFrameDf, "media_frame_overlap")
    capped.as("a")
      .join(capped.as("b"),
        col("a.band_hash") === col("b.band_hash") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_a"), col("id_b"), col("n_shared"))
  }

  /** OFF-GRID clip containment via content-defined chunking (the
    * LBFS/rsync discipline — Muthitacharoen et al., SOSP 2001): cut a
    * media stream wherever a rolling hash of its last `window` bytes ≡ 0
    * mod `divisor`, so boundaries are functions of the CONTENT, not the
    * byte offset. A clip extracted at ANY offset re-derives the same
    * interior cut points as its source — its interior chunk digests match
    * EXACTLY, with no quantization or banding to mis-fire. This closes
    * [[frameOverlap]]'s honest boundary: a fixed sampling grid only
    * catches cuts that land ON the grid (offset ≡ 0 mod frameBytes); the
    * off-grid clip shares zero grid frames but all interior chunks.
    *
    * Scale shape — identical to [[frameOverlap]]: chunking happens at the
    * codec boundary (this file's mapPartitions carve-out — per-byte work
    * is native-loop territory; interpreted Catalyst HOFs pay ~100× per
    * byte), media bytes never leave the scan (only ~len/divisor 16-byte
    * digests per media go anywhere), per-media chunk sets are DISTINCT,
    * the pair join keys on the digest — never all-pairs — and
    * `maxChunkDf` rails a filler chunk shared by millions of media (the
    * stopword of this index) via the shared observe()-surfaced cap.
    *
    * Determinism: the window hash is exact integer arithmetic (base-`31`,
    * mod 1048573 — no Long overflow at 255·31·mod) over raw byte values;
    * the DuckDB mirror runs the identical recurrence over codepoints
    * (ASCII corpus: byte ≡ codepoint). Media shorter than `window`
    * produce one whole-media chunk — exact-digest dedup degenerate case.
    * Returns (id_a < id_b, n_shared). */
  def clipContainment(media: DataFrame, window: Int = 8, divisor: Int = 32,
      minShared: Int = 2, maxChunkDf: Int = 4096): DataFrame =
    clipPairsFromChunks(chunkTable(media, window, divisor), minShared,
      maxChunkDf)

  /** The containment pair tail over a chunk table — zero media access,
    * so it serves equally off the inline build, a persisted artifact, or
    * the stream-maintained state
    * ([[graft.streaming.StreamingChunks.readChunks]]). */
  def clipPairsFromChunks(chunks: DataFrame, minShared: Int = 2,
      maxChunkDf: Int = 4096): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val capped = Dedup.capBuckets(
      chunks.select(col("media_id"), col("band_hash"))
        .withColumn("band", lit(0)),
      maxChunkDf, "media_clip_offgrid")
    capped.as("a")
      .join(capped.as("b"),
        col("a.band_hash") === col("b.band_hash") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_a"), col("id_b"), col("n_shared"))
  }

  /** Per-media DISTINCT content-defined chunk digests — the persisted
    * artifact of the clip-containment family ([[clipContainment]] builds
    * over it inline; the incremental/prebuilt forms probe it). The
    * per-byte scan runs at the codec boundary (this file's one licensed
    * mapPartitions shape): interpreted Catalyst HOFs pay ~100× per byte,
    * and a real chunker is native per-byte code. The DuckDB mirror runs
    * the identical integer recurrence over codepoints (ASCII corpus:
    * byte ≡ codepoint); md5 hex matches Spark's md5(). Returns
    * (media_id, band_hash). */
  def chunkTable(media: DataFrame, window: Int = 8,
      divisor: Int = 32): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    require(divisor >= 2, s"divisor must be >= 2: $divisor")
    val P = 31L
    val M = 1048573L
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val b = r.media
        val n = b.length
        val bounds = scala.collection.mutable.ArrayBuffer(0)
        if (n >= window) {
          // true rolling update, O(1) per byte: drop the outgoing byte's
          // P^(window-1) term, shift, add the incoming byte — identical
          // window hashes (and so identical cut points) to the
          // recompute-per-position form, pinned by MultimodalSpec's
          // rolling≡recompute parity on random bytes. Intermediates fit
          // comfortably in a Long: (acc - drop + M) ≤ 2M ≈ 2^21, ×31 < 2^26.
          val pw = { // P^(window-1) mod M
            var p = 1L; var k = 1
            while (k < window) { p = p * P % M; k += 1 }
            p
          }
          var acc = 0L
          var j = 0
          while (j < window) { acc = (acc * P + (b(j) & 0xffL)) % M; j += 1 }
          var i = window // cut AFTER the window ending at byte i (1-based)
          while (i <= n) {
            if (acc % divisor == 0 && bounds.last != i) bounds += i
            if (i < n) {
              val drop = (b(i - window) & 0xffL) * pw % M
              acc = ((acc - drop + M) * P + (b(i) & 0xffL)) % M
            }
            i += 1
          }
        }
        if (bounds.last != n) bounds += n
        bounds.iterator.zip(bounds.iterator.drop(1)).map { case (p, q) =>
          md.reset()
          val hex = md.digest(java.util.Arrays.copyOfRange(b, p, q))
            .map("%02x".format(_)).mkString
          (r.media_id, hex)
        }.toSet[(Long, String)].iterator // distinct within one media
      }
    }.toDF("media_id", "band_hash")
      .distinct()
  }

  /** Deletion-aware chunk-table maintenance: purged ids fold out of the
    * persisted artifact by broadcast anti-join (per-media digest rows —
    * nothing to decrement), the [[Dedup]] bandsDelete discipline. */
  def chunksDelete(chunks: DataFrame, deletedIds: DataFrame): DataFrame =
    chunks.join(broadcast(deletedIds.select(col("media_id"))),
      Seq("media_id"), "left_anti")

  /** INCREMENTAL clip containment: a new-media batch probes the PERSISTED
    * corpus chunk table ([[chunkTable]] output — inline, an
    * [[graft.sources.Artifacts]] parquet, or post-[[chunksDelete]]) —
    * the corpus media are never re-chunked, never re-read. Semantics
    * mirror [[dedupNearIncremental]]: batch-vs-corpus AND batch-internal
    * pairs (batch-internal keep the (smaller, larger) orientation), a
    * media_id in both frames is the batch's version (the stale corpus
    * copy folds out by broadcast anti-join), corpus-internal pairs are
    * not re-derived ([[clipContainment]]'s job at build time). Scale
    * shape: only the batch's digests broadcast; the corpus table is
    * touched by one digest-keyed join, railed by `maxChunkDf`. Returns
    * (id_new from the batch, id_other, n_shared ≥ minShared). */
  def clipContainmentIncremental(newMedia: DataFrame, corpusChunks: DataFrame,
      window: Int = 8, divisor: Int = 32, minShared: Int = 2,
      maxChunkDf: Int = 4096): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val batch = chunkTable(newMedia, window, divisor)
      .withColumn("band", lit(0))
      .withColumn("from_batch", lit(true))
      .localCheckpoint(eager = false)
    val corpus = corpusChunks.select(col("media_id"), col("band_hash"))
      .join(broadcast(batch.select(col("media_id")).distinct()),
        Seq("media_id"), "left_anti")
      .withColumn("band", lit(0))
      .withColumn("from_batch", lit(false))
    val bSide = Dedup.capBuckets(corpus.unionByName(batch),
      maxChunkDf, "media_clip_incr")
    bSide.as("b")
      .join(broadcast(batch).as("a"),
        col("a.band_hash") === col("b.band_hash") &&
          (!col("b.from_batch") || col("a.media_id") < col("b.media_id")) &&
          col("a.media_id") =!= col("b.media_id"))
      .groupBy(col("a.media_id").as("id_new"), col("b.media_id").as("id_other"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_new"), col("id_other"), col("n_shared"))
  }

  /** Frame sampling for "video" media: every nth fixed-size byte window as a
    * frame (a real implementation would seek keyframes; the batch shape —
    * one input row → array of frame structs → explode — is the real part). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, everyNth: Int = 4): DataFrame = {
    val nFrames = (length(col("media")) / lit(frameBytes)).cast("int")
    media
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % everyNth === 0)))
      .select(col("media_id"), col("frame_idx"),
        col("media").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }
}
