"""Deduplication family for training-data pipelines (engine extension).

Five strategies, all shuffle-disciplined for 100 TB:

- exact            — hash-groupBy on content (1 shuffle on the hash)
- minhash + LSH    — shingle → minhash signature → band/bucket equi-join;
                     candidate pairs only ever meet inside a bucket, never
                     O(n²) (Broder '97; Leskovec/Rajaraman/Ullman ch.3)
- simhash          — per-doc 32-bit signature; near-dups share signature or
                     differ in few bits (Charikar '02)
- n-gram Jaccard   — exact verification on candidate sets (inverted-index
                     join, common-token counting — no cross join)
- embedding cosine — exact pair similarity over a vector column

Everything is Column-expression based (md5-derived hashing for oracle
parity — see pipeline.text.token_hash); no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_6_0_spark.pipeline.text import MOD, token_hash, tokenize

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the smallest-id row per distinct content; one hash shuffle.
    Emits (kept id, duplicate count) per group."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("kept_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def word_shingles(col: str | Column, k: int = 3) -> Column:
    """k-word shingles of the lowercased text → array<string> (distinct);
    empty array when the document has fewer than k tokens (no OOB access
    under ANSI mode)."""
    toks = tokenize(F.lower(col if isinstance(col, Column) else F.col(col)))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]))
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_rows(df: DataFrame, id_col: str, text_col: str, k: int = 3, dedupe: bool = True) -> DataFrame:
    """k-word shingles as ROWS (doc, s) — the hot-path form, ZERO shuffles.

    r16 (guide §2.4 — remove shuffles outright): the r3–r15 form assembled
    shingles with posexplode + a window lead, paying one Exchange on doc
    per call (and a second, (doc, s)-keyed one for ``dedupe``). The window
    existed only because the naive array-expression form re-evaluated the
    tokenizing split() per element_at reference (measured 8× slower then).
    The actual fix is the same one _dup_shingle_positions already uses:
    materialize the token array in its OWN projection — CollapseProject
    declines to inline a non-cheap expression referenced more than once, so
    split() runs once per row — then build the shingle array with one
    transform() over the materialized column and explode it. Narrow
    pipeline, no Exchange at all; every downstream aggregate now pays only
    its own shuffle.

    ``dedupe`` gives set semantics via array_distinct BEFORE the explode
    (per-doc distinct ≡ global (doc, s) distinct because ``id_col`` is
    unique per row in every caller — the table contract); the multiset form
    (dedupe=False) keeps one shingle per position, bit-identical to the
    window form's output."""
    toks = tokenize(F.lower(F.col(text_col)))
    pre = df.select(F.col(id_col).alias("doc"), toks.alias("__tk"))
    tt = F.col("__tk")
    n = F.size(tt)
    idx = F.sequence(F.lit(1), n - (k - 1))
    sh = F.when(
        n >= k,
        F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(tt, i + j) for j in range(k)])
        ),
    ).otherwise(F.array().cast("array<string>"))
    if dedupe:
        sh = F.array_distinct(sh)
    return pre.select("doc", F.explode(sh).alias("s"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3, num_hashes: int = 16) -> DataFrame:
    """MinHash signatures as columns mh0..mhN: h_i = min over shingles of
    (a_i·h(s) + b_i) mod P, with h(s) the portable md5 hash reduced mod P
    (< 2^30, so a_i·h + b_i stays exact in int64 in every engine).

    Implementation note (measured, not guessed): the array-expression form
    (transform × num_hashes over the shingle array) re-inlines the md5 hash
    per hash function — multi-MB codegen and O(16×) recomputation. The
    explode → groupBy(min×16) form below hashes each shingle ONCE and rides
    Spark's map-side partial aggregation; at 100 TB the only shuffle is the
    (doc → signature) reduce."""
    sh = shingle_rows(df, id_col, text_col, shingle_k, dedupe=False)
    hashed = sh.select("doc", (token_hash(F.col("s")) % MOD).alias("h"))
    aggs = [
        F.min((F.col("h") * (2 * i + 1) + i * 12_345 + 7) % MOD).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("doc").agg(*aggs)


def minhash_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH band/bucket rows (doc, band, bh) — the shared substrate of
    self-join near-dup detection (minhash_lsh_pairs) and corpus-probe
    incremental dedup (incremental_dedup). Docs with fewer than
    ``shingle_k`` tokens produce no signature and therefore no buckets."""
    if bands < 1 or num_hashes % bands != 0:
        # bands > num_hashes would make every band hash token_hash('') —
        # one global bucket, the exact O(n²) this function exists to avoid;
        # non-divisible bands would silently drop trailing signature hashes
        raise ValueError(f"bands must divide num_hashes (got {num_hashes=}, {bands=})")
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, shingle_k, num_hashes)
    return _buckets_from_sigs(sigs, bands, rows)


def _buckets_from_sigs(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """Band/bucket rows from an existing signature frame — shared so callers
    holding (persisted) signatures don't recompute the shingle pipeline.

    One explode, not a bands-way union: a union would re-evaluate the whole
    shingle→signature pipeline once per branch (exchange reuse is not
    guaranteed); the struct-array explode evaluates it once."""
    band_structs = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"), (token_hash(F.concat_ws("_", *parts)) % MOD).alias("bh")
            )
        )
    return sigs.select("doc", F.explode(F.array(*band_structs)).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def minhash_calibration(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash quality calibration: for every LSH candidate pair, the
    signature-estimated Jaccard (fraction of agreeing minhash components —
    the unbiased MinHash estimator) next to the EXACT shingle-set Jaccard,
    with the absolute error. This is the measure-don't-guess companion to
    ``minhash_lsh_pairs``: it tells you whether 16 hashes / 4 bands is
    enough for YOUR corpus before you commit a 100 TB dedup run to it
    (the same role ann_recall_eval plays for the ANN tier).

    Scale design: signatures are computed ONCE (persisted) and feed both the
    banded self-join (candidate pairs, never O(n²)) and the per-pair
    agreement count (a column expression over the joined signature rows).
    The exact-Jaccard side only materializes shingles for candidate pairs:
    two broadcast-or-shuffle equi-joins keyed on (pair, shingle), state
    bounded by candidate count × doc shingle count — the pairs LSH already
    filtered, not all pairs.
    """
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(f"bands must divide num_hashes (got {num_hashes=}, {bands=})")
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, shingle_k, num_hashes).persist()
    sh = None
    try:
        buckets = _buckets_from_sigs(sigs, bands, rows)
        # (r16 note: an eager localCheckpoint of pairs was tried here and
        # MEASURED SLOWER — 1.5 s → 3.0 s at sf0.1: the pair recomputes are
        # cheap scans over the persisted sigs, while the extra blocking
        # materialization job serializes the plan. Reverted; measure, don't
        # guess.)
        pairs = (
            buckets.select(F.col("doc").alias("a"), "band", "bh")
            .join(buckets.select(F.col("doc").alias("b"), "band", "bh"), ["band", "bh"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        sa = sigs.select(F.col("doc").alias("a"), *[F.col(f"mh{i}").alias(f"__amh{i}") for i in range(num_hashes)])
        sb = sigs.select(F.col("doc").alias("b"), *[F.col(f"mh{i}").alias(f"__bmh{i}") for i in range(num_hashes)])
        agree = sum(
            (F.col(f"__amh{i}") == F.col(f"__bmh{i}")).cast("int") for i in range(num_hashes)
        )
        est = pairs.join(sa, "a").join(sb, "b").select(
            "a", "b", (agree / F.lit(num_hashes)).alias("__est")
        )
        sh = shingle_rows(df, id_col, text_col, shingle_k, dedupe=True).persist()
        cnt = sh.groupBy("doc").agg(F.count("*").alias("__n"))
        inter = (
            pairs.join(sh.select(F.col("doc").alias("a"), "s"), "a")
            .join(sh.select(F.col("doc").alias("b"), "s"), ["b", "s"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("__inter"))
        )
        # r16 (guide §2.4): the exact-Jaccard side previously re-anchored on
        # pairs (pairs ⋈ inter ⋈ cnt ⋈ cnt) and was then re-joined with the
        # estimate frame — two joins whose only purpose was stitching
        # per-pair columns back together. est is already exactly one row per
        # candidate pair, so the intersection and the two count columns
        # attach to IT directly: 8 joins → 6, same rows, same arithmetic.
        ex = (
            F.coalesce(F.col("__inter"), F.lit(0))
            / (F.col("__na") + F.col("__nb") - F.coalesce(F.col("__inter"), F.lit(0)))
        )
        out = (
            est.join(inter, ["a", "b"], "left")
            .join(cnt.select(F.col("doc").alias("a"), F.col("__n").alias("__na")), "a")
            .join(cnt.select(F.col("doc").alias("b"), F.col("__n").alias("__nb")), "b")
            .select(
                "a",
                "b",
                F.round(F.col("__est"), 6).alias("est_jaccard"),
                F.round(ex, 6).alias("exact_jaccard"),
                F.round(F.abs(F.col("__est") - ex), 6).alias("abs_err"),
            )
        )
        # materialize the (pair-sized) result, then release the two
        # corpus-sized caches — repeated calibration sweeps in one session
        # must not pin signature+shingle frames until memory pressure skews
        # the measurement. The result stays cached for the caller's actions.
        out = out.persist()
        out.count()
        return out
    finally:
        # Release caches on EVERY path — an exception while building
        # pairs/est/exact or during the materializing count() must not leak
        # corpus-sized persists for the rest of the session (ADVICE r6).
        sigs.unpersist()
        if sh is not None:
            sh.unpersist()


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Plan shape (the 100 TB story): scan → explode shingles → signature reduce
    → band/bucket rows → self equi-join on (band, bucket) → distinct pairs.
    The shuffle keys are doc then LSH bucket; no O(n²) comparison ever
    materializes. Skewed buckets (giant near-dup clusters) are handled by
    AQE skew-join splitting.

    r16 (guide §5 — cache only what is reused and expensive): the self-join
    consumed the bucket pipeline TWICE (exchange reuse does not fire across
    the two aliased sides), re-running the whole shingle→signature chain per
    side. The bucket frame is tiny (``bands`` rows per doc, three narrow
    columns — keys and hashes, no text) so it is localCheckpoint-ed once and
    both join sides read the materialized blocks; the ContextCleaner frees
    them when the result frame is dropped. Plan diff: one
    scan→…→HashAggregate chain instead of two.
    """
    buckets = minhash_band_buckets(
        df, id_col, text_col, shingle_k, num_hashes, bands
    ).localCheckpoint(eager=True)
    left = buckets.select(F.col("doc").alias("a"), "band", "bh")
    right = buckets.select(F.col("doc").alias("b"), "band", "bh")
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _dup_shingle_positions(
    df: DataFrame, id_col: str, text_col: str, k: int, small_data: bool = False
) -> DataFrame:
    """Positions of k-token shingles that occur in >=2 DISTINCT documents —
    the shared kernel of ``duplicate_span_stats`` (report) and
    ``cut_duplicate_spans`` (apply). Returns (doc, pos, n_shingles) with
    1-based pos.

    - n_shingles is knowable BEFORE the explode (|tokens| - k + 1): carrying
      it through the rows saves a whole per-doc count window. The token
      array is materialized in its OWN projection first — referencing
      tokenize() from several expressions in one select re-runs the
      split per reference (no CSE across Generate; measured 3x slower).
    - positioned shingles via one transform() over the materialized token
      array exploded with inline() — r16: this replaces the earlier
      posexplode + window-lead assembly, removing the per-doc window
      Exchange entirely (guide §2.4); the (pos, shingle) pairs are
      identical, hashed to a bigint so the wide shingle string never
      shuffles;
    - cross-doc detection (default, scale-safe): persist the positioned
      shingles, ``groupBy(h).agg(min(doc) != max(doc))`` — partial
      aggregation combines map-side so a boilerplate shingle with 10⁹
      occurrences never lands in one task — then LEFT SEMI join back on h
      (AQE splits any remaining skewed join partition). The persist is what
      makes the join-back not recompute the whole shingle pipeline; blocks
      are LRU-evicted / freed with the session (one-shot query callers).
    - ``small_data=True`` keeps the old single-pass form (min/max over a
      hash-partitioned window, no persist) — fine when every distinct
      shingle's occurrence list fits one task, wrong at corpus scale
      (round-4 verdict #2).
    - no df_cap here (unlike ``ngram_jaccard_pairs``): there is no
      pair-producing self-join, so a hot shingle is linear, not quadratic —
      the groupBy combines map-side and the join-back is a semi-join whose
      skewed probe partitions AQE splits; and a shingle in ~every doc IS
      the duplication signal this kernel exists to find, so dropping it
      would be wrong, not just lossy."""
    from pyspark.sql import Window

    pre = df.select(
        F.col(id_col).alias("doc"), tokenize(F.lower(F.col(text_col))).alias("__tk")
    )
    tt = F.col("__tk")
    n = F.size(tt)
    pairs = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", *[F.element_at(tt, i + j) for j in range(k)]).alias("s"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,s:string>>"))
    sh = pre.select(
        "doc",
        F.greatest(n - (k - 1), F.lit(0)).cast("long").alias("n_shingles"),
        F.inline(pairs),
    ).select("doc", "n_shingles", "pos", (token_hash(F.col("s")) % MOD).alias("h"))
    if small_data:
        wh = Window.partitionBy("h")
        return (
            sh.withColumn("dup", F.min("doc").over(wh) != F.max("doc").over(wh))
            .filter(F.col("dup"))
            .select("doc", "pos", "n_shingles")
        )
    from pyspark import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    cross = (
        sh.groupBy("h")
        .agg((F.min("doc") != F.max("doc")).alias("dup"))
        .filter(F.col("dup"))
        .select("h")
    )
    return sh.join(cross, "h", "left_semi").select("doc", "pos", "n_shingles")


def duplicate_span_stats(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Substring-level exact duplication (the Lee et al. '22 "Deduplicating
    Training Data Makes Language Models Better" signal): for every document,
    how much of it is covered by k-token shingles that ALSO occur in some
    other document, and the longest such contiguous span.

    Emits one row per affected doc: (doc, n_dup_shingles, n_shingles,
    dup_frac, max_dup_span_tokens) — the inputs to a span-cut or doc-drop
    policy. Within-doc self-repetition is deliberately excluded (that is
    text.repetition_stats' job); a shingle counts as duplicated only when it
    appears in >=2 DISTINCT documents.

    Scale shape (100 TB honest):
    - positioned shingles via one posexplode + window lead (each token
      materialized once), hashed to a bigint so the wide shingle string
      never shuffles;
    - cross-doc detection via the persisted groupBy(h) + semi-join kernel
      (``_dup_shingle_positions``) — partial aggregation combines map-side,
      so no single shingle hash can straggler/OOM one task;
    - the longest-run computation is gaps-and-islands (pos - row_number)
      per doc — state bounded by document length, never by corpus size.
    """
    from pyspark.sql import Window

    d = _dup_shingle_positions(df, id_col, text_col, k)
    wrun = Window.partitionBy("doc").orderBy("pos")
    isl = d.withColumn("isl", F.col("pos") - F.row_number().over(wrun))
    runs = isl.groupBy("doc", "isl").agg(
        F.count("*").alias("run"), F.first("n_shingles").alias("n_shingles")
    )
    return runs.groupBy("doc").agg(
        F.sum("run").cast("long").alias("n_dup_shingles"),
        F.first("n_shingles").cast("long").alias("n_shingles"),
        F.round(F.sum("run") / F.first("n_shingles"), 6).alias("dup_frac"),
        (F.max("run") + F.lit(k - 1)).cast("long").alias("max_dup_span_tokens"),
    )


def cut_duplicate_spans(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """APPLY the Lee et al. '22 policy: remove every token covered by a
    cross-document duplicated k-shingle and reassemble the document —
    ``duplicate_span_stats`` is the report, this is the edit.

    Per doc: covered token indices = union of [pos, pos+k-1] over duplicated
    shingle positions (one explode of k-length ranges, distinct); surviving
    tokens drop out via a left-anti join on (doc, idx) and reassemble in
    index order (array_sort over (idx, token) structs — no nondeterministic
    collect ordering). Docs whose every token is covered disappear (fully
    duplicated content). Emits (doc, cleaned, n_kept, n_removed)."""
    from pyspark.sql import Window  # noqa: F401  (parallel structure with stats)

    d = _dup_shingle_positions(df, id_col, text_col, k)
    covered = d.select(
        "doc", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("idx")
    ).distinct()
    pre = df.select(
        F.col(id_col).alias("doc"), tokenize(F.lower(F.col(text_col))).alias("__tk")
    )
    toks = (
        pre.select(
            "doc",
            F.size("__tk").cast("long").alias("n_tokens"),
            F.posexplode("__tk").alias("pos0", "t"),
        )
        # split('') yields one empty token: drop it so whitespace-only docs
        # vanish instead of surviving as cleaned='' with n_kept=1
        .filter(F.length("t") > 0)
        .select("doc", "n_tokens", (F.col("pos0") + 1).alias("idx"), "t")
    )
    kept = toks.join(covered, ["doc", "idx"], "left_anti")
    return (
        kept.groupBy("doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "t"))), lambda s: s["t"]
                ),
                " ",
            ).alias("cleaned"),
            F.count("*").cast("long").alias("n_kept"),
            (F.first("n_tokens") - F.count("*")).cast("long").alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash signatures (doc, sim): per-token portable hash; bit j of the
    result is 1 iff Σ over tokens of ±1 (sign of hash bit j) is positive.

    Explode + one groupBy with `bits` sums (map-side partial agg) — the same
    anti-inlining rationale as minhash_signatures: the token hash is computed
    once per token, not once per bit."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("t"),
    )
    hashed = toks.select("doc", token_hash(F.col("t")).alias("h"))
    sums = hashed.groupBy("doc").agg(
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select("doc", sim.alias("sim"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via inverted index — no cross join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for all pairs sharing ≥1
    shingle. Inverted-index self-join: |A∩B| from common-shingle counts,
    |A∪B| = |A|+|B|-|A∩B|. Shuffles on shingle then on pair — never O(n²)
    across documents.

    ``df_cap`` is the document-frequency ceiling on the inverted index
    (round-11 verdict): a boilerplate shingle present in ~every document
    ("all rights reserved") makes ITS join key quadratic — a posting list
    of d docs yields d² candidate rows regardless of how rare the other
    shingles are. Shingles in more than ``df_cap`` documents are dropped
    BEFORE the self-join, and document sizes are recomputed over the capped
    shingle universe, so the returned value is the exact Jaccard of the
    capped sets (both |A∩B| and |A∪B| lose the same ubiquitous elements —
    near-boilerplate pairs keep their score instead of being inflated by
    shared stop-shingles). At 100 TB a df_cap in the low thousands bounds
    every posting list, hence every join partition. None = uncapped."""
    sh = shingle_rows(df, id_col, text_col, k).withColumnRenamed("s", "shingle")
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))  # shingle_rows dedupes per doc
            .filter(F.col("__df") > df_cap)
            .select("shingle")
        )
        # anti-join against the hot-shingle list — usually tiny (boilerplate),
        # so AQE broadcasts it; worst case it's ≤ N_postings/df_cap rows and
        # AQE falls back to a shuffled anti-join, still never quadratic
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns — JVM-side zip_with/
    aggregate, sequential accumulation (bit-identical to DuckDB's order).
    NULL (not a crash) for a zero-norm vector: under Spark's ANSI mode a
    bare division raises DIVIDE_BY_ZERO and one degenerate embedding would
    sink the whole job (review finding); NULL scores drop out of top-k
    orderings and threshold filters naturally."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return F.try_divide(dot, na * nb)


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """Exact pairwise cosine ≥ threshold. This is the verification kernel —
    at scale, run it per LSH bucket (similarity.lsh_ann) instead of globally;
    the global form here is the correctness baseline."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Incremental-ingest dedup: flag each NEW document against an EXISTING
    corpus — the daily-crawl pattern where re-deduplicating the whole corpus
    per batch would be O(corpus) instead of O(batch).

    Two probes, both anti-join-shaped:
    - ``exact_dup``: md5 content key of the batch semi-joined against the
      corpus key set (the key table is what a production pipeline persists
      between ingests — probing it is one broadcast or shuffle of BATCH
      size, never a corpus rescan);
    - ``near_dup``: the batch's MinHash band buckets probed against the
      corpus's distinct (band, bucket) set — same LSH substrate as
      minhash_lsh_pairs, reused via minhash_band_buckets, so batch and
      corpus agree bit-for-bit on bucketing. At scale the corpus bucket
      table is likewise computed once and persisted; each ingest only
      signatures its own documents.

    Returns one row per new doc: (doc, exact_dup, near_dup). Within-batch
    duplicates are NOT flagged here — run the self-join pass on the batch
    separately (they compose: flag-vs-corpus ∪ flag-within-batch)."""
    corpus_keys = corpus.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    corpus_buckets = (
        minhash_band_buckets(corpus, id_col, text_col, shingle_k, num_hashes, bands)
        .select("band", "bh")
        .distinct()
    )
    return _incremental_probe(
        new_docs, corpus_keys, corpus_buckets, id_col, text_col, shingle_k, num_hashes, bands
    )


def incremental_dedup_sliced(
    df: DataFrame,
    id_col: str,
    text_col: str,
    new_pred,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """``incremental_dedup`` when batch and corpus are SLICES OF ONE TABLE
    (the registered query / replay shape): ``new_pred`` is a function of the
    id Column selecting the incoming batch, everything else is the standing
    corpus.

    r16 (guide §1.2 — fix the distributed algorithm first): the two-frame
    form ran the shingle→signature→bucket pipeline TWICE, once per slice,
    though bucketing is a pure per-doc function. Here the band buckets are
    computed ONCE over the whole table, the tiny (doc, band, bh) frame is
    localCheckpoint-ed, and both probe sides are filters over it — one
    window-free shingle pass and one signature reduce instead of two, with
    results identical to
    ``incremental_dedup(df.filter(pred), df.filter(~pred), ...)`` because
    per-doc signatures do not depend on which docs surround them."""
    all_buckets = minhash_band_buckets(
        df, id_col, text_col, shingle_k, num_hashes, bands
    ).localCheckpoint(eager=True)
    corpus_keys = (
        df.filter(~new_pred(F.col(id_col)))
        .select(F.md5(F.col(text_col)).alias("__h"))
        .distinct()
    )
    corpus_buckets = (
        all_buckets.filter(~new_pred(F.col("doc"))).select("band", "bh").distinct()
    )
    return _incremental_probe(
        df.filter(new_pred(F.col(id_col))),
        corpus_keys,
        corpus_buckets,
        id_col,
        text_col,
        shingle_k,
        num_hashes,
        bands,
        batch_buckets=all_buckets.filter(new_pred(F.col("doc"))),
    )


def _incremental_probe(
    new_docs: DataFrame,
    corpus_keys: DataFrame,
    corpus_buckets: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    num_hashes: int,
    bands: int,
    batch_buckets: DataFrame | None = None,
) -> DataFrame:
    """The probe half of ``incremental_dedup``, taking the PERSISTED-shaped
    probe tables directly: ``corpus_keys(__h)`` (distinct md5 content keys)
    and ``corpus_buckets(band, bh)`` (distinct LSH buckets). This is the
    exact interface a standing-corpus pipeline maintains between ingests —
    the batch form computes the tables per call, the streaming form
    (``streaming_incremental_dedup``) reads and appends them across epochs
    and passes its persisted ``batch_buckets`` (doc, band, bh) so the
    shingle→signature pipeline runs once per epoch, not once per consumer."""
    new_keyed = new_docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
    exact = (
        new_keyed.select("doc", F.md5("__t").alias("__h"))
        .join(corpus_keys, "__h", "left_semi")
        .select("doc")
        .withColumn("exact_dup", F.lit(True))
    )
    if batch_buckets is None:
        batch_buckets = minhash_band_buckets(new_docs, id_col, text_col, shingle_k, num_hashes, bands)
    near = (
        batch_buckets.join(corpus_buckets.select("band", "bh"), ["band", "bh"], "left_semi")
        .select("doc")
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    return (
        new_keyed.select("doc")
        .join(exact, "doc", "left")
        .join(near, "doc", "left")
        .select(
            "doc",
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
            F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
        )
    )


def seed_dedup_state(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    state_dir: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Materialize the standing-corpus probe tables for
    ``streaming_incremental_dedup``: ``<state_dir>/keys`` (distinct md5
    content keys) and ``<state_dir>/buckets`` (distinct LSH band buckets).
    Run once over the existing corpus; the stream appends to both as it
    ingests. Epoch partition __epoch=-1 marks the seed (the streaming
    side's idempotent per-epoch writes use the same layout)."""
    keys = corpus.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    buckets = (
        minhash_band_buckets(corpus, id_col, text_col, shingle_k, num_hashes, bands)
        .select("band", "bh")
        .distinct()
    )
    for df, sub in ((keys, "keys"), (buckets, "buckets")):
        (
            # STATIC overwrite on purpose: a re-seed must truncate the whole
            # table — dynamic mode would rewrite only __epoch=-1 and keep
            # stale streaming partitions from an earlier run, whose keys
            # would then flag fresh docs as dups of documents not in the
            # seeded corpus (review finding)
            df.withColumn("__epoch", F.lit(-1))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("__epoch")
            .parquet(f"{state_dir}/{sub}")
        )


def _read_state_before(spark, path: str, schema: str, epoch_id: int):
    """Epoch-partitioned state read EXCLUDING partitions ≥ ``epoch_id``:
    a retried epoch's own (already committed) partition must not feed its
    probe, or every doc in the replayed batch would match itself. The seed
    partition is __epoch=-1, so it is always included. Missing path →
    empty frame with the given schema (first epoch before any seed)."""
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.parquet(path)
            .filter(F.col("__epoch") < epoch_id)
            .drop("__epoch")
        )
    except AnalysisException:
        return spark.createDataFrame([], schema)


def streaming_incremental_dedup(
    doc_stream: DataFrame,
    id_col: str,
    text_col: str,
    state_dir: str,
    emit_fn,
    checkpoint: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
):
    """CONTINUOUS incremental-ingest dedup — the daily-crawl pattern running
    as a stream: each micro-batch of documents is flagged exact-dup /
    near-dup against the standing probe tables (seeded by
    ``seed_dedup_state``, grown by every prior epoch), then its own keys and
    buckets are appended so later batches dedup against it.

    Per epoch: probe FIRST (against pre-batch state — a batch never matches
    itself; within-batch dups compose via the self-join pass, same contract
    as the batch form), emit the flags, then append. State writes reuse the
    idempotent per-epoch dynamic-partition layout of the foreachBatch joins
    (streaming/nonwindow_join); the state READ additionally filters
    ``__epoch < epoch_id``, so a RETRIED epoch (its own partition already
    committed before the failure) still probes pre-batch state instead of
    matching itself (review finding). Corollary: resuming over an existing
    state_dir requires the same checkpoint — a fresh checkpoint restarts
    epoch ids at 0 and would hide earlier state, exactly like any
    Structured Streaming state store. State size: |distinct content keys|
    + |distinct buckets| — the same tables a batch pipeline persists, never
    the corpus text. The probes are batch-sized left-semi joins; the key/
    bucket predicates reach the parquet state scans. The batch's bucket
    frame is computed ONCE per epoch (persisted, shared by the probe and
    the state write) — the shingle→signature pipeline is the dominant
    per-epoch cost and must not run three times (review finding)."""
    from flink_1_6_0_spark.streaming.nonwindow_join import _write_epoch

    spark = doc_stream.sparkSession
    key_schema = "`__h` string"
    bucket_schema = "`band` int, `bh` bigint"

    def handle(batch: DataFrame, epoch_id: int) -> None:
        keys = _read_state_before(spark, f"{state_dir}/keys", key_schema, epoch_id)
        buckets = _read_state_before(spark, f"{state_dir}/buckets", bucket_schema, epoch_id)
        new_keys = batch.select(F.md5(F.col(text_col)).alias("__h")).distinct().persist()
        new_buckets = (
            minhash_band_buckets(batch, id_col, text_col, shingle_k, num_hashes, bands)
            .persist()
        )
        try:
            flags = _incremental_probe(
                batch,
                keys,
                buckets,
                id_col,
                text_col,
                shingle_k,
                num_hashes,
                bands,
                batch_buckets=new_buckets,
            )
            emit_fn(flags, epoch_id)
            if new_keys.take(1):
                _write_epoch(new_keys, f"{state_dir}/keys", epoch_id)
            nb = new_buckets.select("band", "bh").distinct()
            if nb.take(1):
                _write_epoch(nb, f"{state_dir}/buckets", epoch_id)
        finally:
            new_keys.unpersist()
            new_buckets.unpersist()

    return (
        doc_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def cross_corpus_lsh_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Cross-corpus candidate near-duplicate PAIRS (a, b) — the pair-level
    counterpart of incremental_dedup's boolean flags, for when the pipeline
    needs to know WHICH standing document an incoming one collides with
    (provenance, canonical-pick, dedup audits).

    Same band-bucket substrate (minhash_band_buckets both sides, equi-join
    on (band, bh), distinct pairs) — never an all-pairs comparison; at
    scale the right side's bucket table is the persisted corpus index."""
    lb = minhash_band_buckets(left, id_col, text_col, shingle_k, num_hashes, bands)
    rb = minhash_band_buckets(right, id_col, text_col, shingle_k, num_hashes, bands)
    return (
        lb.select(F.col("doc").alias("a"), "band", "bh")
        .join(rb.select(F.col("doc").alias("b"), "band", "bh"), ["band", "bh"])
        .select("a", "b")
        .distinct()
    )
