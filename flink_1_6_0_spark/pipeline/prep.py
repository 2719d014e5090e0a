"""Training-data preparation operators, round 3: PII redaction, benchmark
contamination checking, and sequence packing.

Engine extensions beyond the reference surface (BASELINE.json north star) —
the operations a 100 TB pretraining pipeline runs between raw text and
tokenized shards:

- **PII redaction**: regex scrubbing of emails / IPv4s / long digit runs.
  Pure `regexp_replace` Column chains — JVM-side, one scan, no Python.
  Patterns avoid lookaround/backrefs so Java regex (Spark) and RE2 (DuckDB)
  agree byte-for-byte.
- **Contamination check**: n-gram overlap of the corpus against a
  benchmark/eval set (the GPT-3/PaLM decontamination step). The benchmark
  side is tiny → its shingle set broadcasts; the corpus side is one
  explode+join scan, never an all-pairs comparison.
- **Sequence packing**: concatenate-in-order packing of documents into
  fixed token-budget bins per shard (the standard pretraining batch prep).
  An exclusive running sum + integer division — one window over each
  shard, no greedy driver loop; shards bound partition width so the window
  state stays small at any corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flink_1_6_0_spark.pipeline.text import token_count

# Lookaround-free, backref-free patterns — identical semantics in Java
# regex and RE2.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
DIGITS_RE = r"\b[0-9]{7,}\b"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_redact(col: str | Column) -> Column:
    """Redact emails, IPv4 addresses, then long digit runs (phone/account
    numbers). Order matters: emails and IPs are redacted before the bare
    digit-run pass so their digits don't double-match."""
    c = F.regexp_replace(_c(col), EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, DIGITS_RE, "<NUM>")


def pii_counts(col: str | Column) -> tuple[Column, Column, Column]:
    """Match counts per category (email, ip, digit-run), counted on the same
    progressively-redacted text the redactor sees."""
    c0 = _c(col)
    n_email = F.size(F.regexp_extract_all(c0, F.lit(EMAIL_RE), 0))
    c1 = F.regexp_replace(c0, EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(c1, F.lit(IPV4_RE), 0))
    c2 = F.regexp_replace(c1, IPV4_RE, "<IP>")
    n_num = F.size(F.regexp_extract_all(c2, F.lit(DIGITS_RE), 0))
    return n_email, n_ip, n_num


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, the number
    of its distinct k-token shingles that appear in ANY benchmark document.

    Scale design: the benchmark shingle set is small and bounded (eval sets
    are KBs–MBs, not TBs) — `F.broadcast` ships it to every executor, so the
    100 TB corpus side is a single scan + map-side semi-join-shaped equi-join
    on the shingle string, with a per-doc count after. No shuffle of the
    corpus beyond the final per-doc aggregate on ``id_col``.
    """
    from flink_1_6_0_spark.pipeline.dedup import shingle_rows

    corpus_sh = shingle_rows(corpus, id_col, text_col, k=k)  # (doc, s)
    bench_sh = shingle_rows(benchmark, id_col, text_col, k=k).select("s").distinct()
    hits = corpus_sh.join(F.broadcast(bench_sh), "s")
    return hits.groupBy(F.col("doc").alias(id_col)).agg(
        F.count("*").alias("n_contaminated")
    )


def contamination_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    m: int = 8192,
) -> DataFrame:
    """``contaminated_docs`` with a Bloom-filter pre-filter on the corpus
    side — the shape that survives a LARGE benchmark suite at 100 TB.

    Build side (like a broadcast-hash-join build): the benchmark shingles
    reduce to a fixed ``m``-bit bitmap (two index slices of the portable md5
    hash per shingle). The driver collects at most ``m`` distinct bit
    positions — bounded by the filter size, NEVER by benchmark or corpus
    rows — and ships the bitmap as a literal array (m bytes) to every
    executor inside the scan projection.

    Probe side: a corpus shingle reaches the exact broadcast join ONLY if
    both its bits are set. False positives are then removed by the exact
    join, so the result is IDENTICAL to ``contaminated_docs`` (the oracle is
    the plain exact query) while the join input shrinks by roughly the bloom
    rejection rate — at 100 TB that is the difference between joining every
    shingle of the corpus and joining a few percent of them.
    """
    from flink_1_6_0_spark.pipeline.dedup import shingle_rows

    def _bits(col):
        # two independent hashes via seeded xxhash64 — a native codegen
        # expression, no md5 hex-parse in the corpus-scan hot path (round 7:
        # md5+conv dominated the probe). Cross-engine hash portability does
        # NOT matter here, unlike the md5 permille gates: the bloom is
        # engine-internal and the exact join removes its false positives,
        # so build and probe only need to agree with each other
        return (
            F.pmod(F.xxhash64(col), F.lit(m)),
            F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m)),
        )

    # persisted: the benchmark shingle set feeds BOTH the bitmap build and
    # the exact broadcast join — one shingle pipeline, not two. The cache is
    # benchmark-bounded BY CONTRACT (eval suites are MBs) and lives until
    # session cache eviction; callers running many bloom sweeps in one
    # session can spark.catalog.clearCache() between them
    bench_sh = shingle_rows(benchmark, id_col, text_col, k=k).select("s").distinct().persist()
    bit1, bit2 = _bits(F.col("s"))
    positions = (
        bench_sh.select(F.explode(F.array(bit1, bit2)).alias("bit")).distinct().collect()
    )
    bitmap = [0] * m
    for r in positions:
        bitmap[int(r["bit"])] = 1
    # the bitmap ships via ONE sql-parsed array expression, not F.lit on a
    # Python list: F.lit crosses py4j per element (~3 s of driver time at
    # m=8192, measured — it dominated the whole query); the parsed form
    # costs ~1 ms and folds to the same array literal in the plan
    bits = F.expr(f"array({','.join(map(str, bitmap))})")

    corpus_sh = shingle_rows(corpus, id_col, text_col, k=k)
    cbit1, cbit2 = _bits(F.col("s"))
    cand = corpus_sh.filter(
        (F.element_at(bits, cbit1.cast("int") + 1) == 1)
        & (F.element_at(bits, cbit2.cast("int") + 1) == 1)
    )
    hits = cand.join(F.broadcast(bench_sh), "s")
    return hits.groupBy(F.col("doc").alias(id_col)).agg(
        F.count("*").alias("n_contaminated")
    )


def eval_contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    dirty_threshold: float = 0.8,
) -> DataFrame:
    """Eval-side contamination report — the REVERSE direction of
    ``contaminated_docs``: for every benchmark/eval document, the fraction of
    its distinct k-shingles that appear anywhere in the training corpus, plus
    a ``dirty`` flag at ``dirty_threshold`` (the GPT-3 appendix-C "dirty
    eval example" bookkeeping: you can't always clean the corpus, but you
    must know which eval rows overlap it).

    Scale design: the corpus is never shuffled on its own keys. The bounded
    benchmark shingle set broadcasts INTO the corpus scan; the only
    aggregation state is the matched subset of benchmark shingles (bounded by
    the benchmark size, not the corpus), which then left-joins back to the
    per-doc benchmark shingles. ``dirty`` is computed from the UNROUNDED
    fraction (exact int-ratio double, engine-portable); the reported fraction
    is rounded for output only.
    """
    from flink_1_6_0_spark.pipeline.dedup import shingle_rows

    bsh = shingle_rows(benchmark, id_col, text_col, k=k)  # (doc, s) set-per-doc
    bset = bsh.select("s").distinct()
    corpus_sh = shingle_rows(corpus, id_col, text_col, k=k, dedupe=False)
    # distinct over ONLY bench-matched shingles — state bounded by |benchmark|
    hit = corpus_sh.join(F.broadcast(bset), "s").select("s").distinct()
    stats = (
        bsh.join(F.broadcast(hit.withColumn("__hit", F.lit(1))), "s", "left")
        .groupBy(F.col("doc").alias(id_col))
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
    )
    # left join from the benchmark id table: a sub-k-token eval doc has NO
    # shingles, but it must still appear in the report (clean, frac 0) —
    # silently dropping it defeats the bookkeeping (review finding)
    frac = F.col("n_hit") / F.col("n_shingles")
    return (
        benchmark.select(F.col(id_col))
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.coalesce(F.round(frac, 6), F.lit(0.0)).alias("overlap_frac"),
            F.coalesce(frac >= dirty_threshold, F.lit(False)).alias("dirty"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Corpus snapshot diff — the reproducibility audit between two versions
    of a dataset: per document id, ``added`` (only in new), ``removed``
    (only in old), ``changed`` (both, content key differs) or ``unchanged``.
    Content equality is the md5 key (the same key exact-dedup and the
    incremental probe tables use), so "changed" means byte-level text
    change, not metadata drift.

    One full outer equi-join on the id — both sides hash-shuffle once on
    ``id_col`` (or co-located bucketing makes it shuffle-free); the
    comparison is a projection. No text leaves the scan: only (id, md5)
    rides the shuffle, so 100 TB of text costs two narrow key columns.
    """
    # explicit presence markers: md5(NULL) is NULL, so hash-nullness can NOT
    # stand in for "side missing" — a NULL-text doc would masquerade as
    # added/removed (review finding). Hash comparison is null-safe for the
    # same reason (NULL text on both sides = unchanged).
    o = old.select(
        F.col(id_col).alias("__id"),
        F.md5(F.col(text_col)).alias("__oh"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        F.md5(F.col(text_col)).alias("__nh"),
        F.lit(True).alias("__in_new"),
    )
    return o.join(n, "__id", "full_outer").select(
        F.col("__id").alias(id_col),
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~F.col("__oh").eqNullSafe(F.col("__nh")), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


def token_budget_plan(
    df: DataFrame,
    source_col: str,
    text_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Data-mix planning table (the GPT-3/mT5/DoReMi sampling-weights step):
    per source, token counts → temperature-flattened sampling probability
    p_s ∝ tokens_s^alpha → planned tokens under ``budget`` → effective
    epochs (planned/actual; >1 means the source repeats, the usual fate of
    small high-quality sources).

    ``alpha=0.5`` (sqrt) by default: IEEE sqrt is correctly rounded, so the
    plan is bit-identical across engines — pow(x, 0.3) is not. One per-source
    aggregate (map-side combined) + a broadcast 1-row normalizer: the 100 TB
    corpus is scanned once and never shuffled beyond the per-source partial
    aggregation; the plan table itself is |sources| rows.
    """
    stats = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col)).cast("long").alias("n_tokens"),
    )
    w = F.pow(F.col("n_tokens"), alpha) if alpha != 0.5 else F.sqrt(F.col("n_tokens"))
    z = stats.agg(F.sum(w).alias("__z"))
    return stats.crossJoin(F.broadcast(z)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(w / F.col("__z"), 6).alias("sample_prob"),
        F.round(F.lit(float(budget)) * w / F.col("__z"), 3).alias("planned_tokens"),
        F.round(F.lit(float(budget)) * w / F.col("__z") / F.col("n_tokens"), 6).alias("epochs"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    num_shards: int = 8,
    carry_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Sequential sequence packing: documents are concatenated in ``id_col``
    order within a deterministic shard and split into bins of ``budget``
    tokens — each doc's bin is ``floor(tokens_before_it / budget)`` (the
    GPT-style pack-then-chunk, where a document may straddle the boundary
    and is assigned to the bin it starts in).

    One window (exclusive running sum) per shard; shard count bounds the
    sort width, so this is ``num_shards`` bounded sorts, not a global one.
    Adds: shard, n_tokens, offset (token offset within the shard stream),
    bin (the training sequence index within the shard). ``carry_cols``
    ride along through the window (projection-only — cheaper than a
    join-back on the id when the caller needs per-doc attributes next to
    the bin assignment).
    """
    n_tok = token_count(text_col)
    shard = F.pmod(F.col(id_col), F.lit(num_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        shard.alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    ).withColumn("offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"))
    return out.withColumn("bin", F.floor(F.col("offset") / budget).cast("long"))


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    num_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing sequence packing — the bin-packing shape real
    token pipelines use when fragmentation matters more than document order
    (vs the GPT-style sequential ``pack_sequences``): within a deterministic
    shard, documents are sorted by (n_tokens DESC, id ASC) and each is
    placed into the FIRST bin whose remaining capacity fits it, else a new
    bin opens. A document larger than ``budget`` opens its own (overflowed)
    bin — FFD's standard oversize convention, and nothing else ever lands
    there.

    Scale shape: the FFD state (one remaining-capacity list per shard) is
    inherently sequential, so the kernel runs per shard inside ONE
    Arrow-batched applyInPandas pass — ``num_shards`` independent tasks,
    each bounded by its shard's doc count; no global sort, no driver
    collect. The tie-break (id ASC) makes the assignment reproducible on
    any engine — the DuckDB oracle replays the identical placement with a
    recursive CTE.

    Adds: shard, n_tokens, bin (the training-sequence index within the
    shard).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tok = token_count(text_col)
    base = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(num_shards)).cast("int").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    )
    schema = f"{id_col} long, shard int, n_tokens long, bin long"

    def ffd(pdf):
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        ).copy()
        pdf["bin"] = ffd_place(pdf["n_tokens"].tolist(), budget)
        return pdf

    return base.groupBy("shard").applyInPandas(ffd, schema)


def ffd_place(tokens: list[int], budget: int) -> list[int]:
    """Pure first-fit placement kernel over an ALREADY-ORDERED size list
    (callers sort decreasing-with-tie-break first): item i goes to the first
    bin whose remaining capacity fits it, else opens bin ``n_open``.
    Oversize items open a negative-capacity bin nothing else ever joins.

    O(n log n) via a max-capacity segment tree (leftmost-leaf descent ==
    first fitting bin): the naive linear scan is O(n · open_bins) — at
    100 TB shard sizes that quadratic blows up exactly when packing matters
    most. Property-tested (tests/test_properties.py): identical placement
    to the naive reference, fills ≤ budget, at most one non-oversize bin
    ≤ half-full, permutation invariance through the sorting caller."""
    n = len(tokens)
    if n == 0:
        return []
    size = 1
    while size < n:
        size *= 2
    tree = [-1] * (2 * size)  # max remaining capacity per subtree; -1 = unopened
    bins: list[int] = []
    n_open = 0

    def _set(leaf: int, val: int) -> None:
        j = size + leaf
        tree[j] = val
        j //= 2
        while j:
            tree[j] = tree[2 * j] if tree[2 * j] >= tree[2 * j + 1] else tree[2 * j + 1]
            j //= 2

    for tok in tokens:
        if tree[1] >= tok:
            j = 1
            while j < size:  # prefer the LEFT subtree — lowest bin id first
                j = 2 * j if tree[2 * j] >= tok else 2 * j + 1
            b = j - size
            _set(b, tree[j] - tok)
        else:
            b = n_open
            _set(b, budget - tok)
            n_open += 1
        bins.append(b)
    return bins


def rebalance_language_mix(
    df: DataFrame,
    id_col: str,
    lang_col: str,
    targets: dict[str, float] | None = None,
    salt: str = "langmix",
) -> DataFrame:
    """Deterministic downsampling to a target language mix (the data-mixture
    step before pretraining: cap over-represented languages instead of
    training on the crawl's natural skew).

    Per language, the keep-rate is ``min(1, target_share · N_total /
    n_lang)`` — languages at or under their target share keep everything
    (this only ever REMOVES over-representation; it never upsamples). The
    gate is the portable md5 hash of the row id (permille granularity), so
    the same document survives on any engine, cluster layout, or re-run.
    ``targets`` maps language → share (must sum to <= 1); ``None`` means a
    uniform share per observed language. With explicit ``targets``,
    languages NOT in the map get a NULL rate and are dropped entirely —
    an explicit mixture spec is exhaustive by definition.

    Scale shape: the language histogram is a map-side-combined groupBy of
    LANGUAGE-cardinality rows; rates broadcast back; the corpus side is one
    scan + filter — no corpus shuffle at all. Adds ``rate_permille`` to the
    surviving rows.
    """
    from flink_1_6_0_spark.operators.utils import deterministic_sample

    counts = df.groupBy(lang_col).agg(F.count("*").alias("__n_lang"))
    total = counts.agg(F.sum("__n_lang").alias("__n_total"))
    with_tot = counts.crossJoin(F.broadcast(total))
    if targets is None:
        n_langs = counts.agg(F.count("*").alias("__k"))
        with_tot = with_tot.crossJoin(F.broadcast(n_langs)).withColumn(
            "__share", F.lit(1.0) / F.col("__k")
        )
    else:
        if sum(targets.values()) > 1.0 + 1e-9:
            raise ValueError("target shares exceed 1")
        share = F.lit(None).cast("double")
        for lang, s in reversed(list(targets.items())):
            share = F.when(F.col(lang_col) == lang, F.lit(float(s))).otherwise(share)
        with_tot = with_tot.withColumn("__share", share)
    # NULL __share (language absent from an explicit targets map) must yield
    # a NULL rate so the gate drops those rows — F.least SKIPS nulls, so
    # least(1000, NULL) would be 1000 (keep-everything, the opposite)
    capped = F.when(
        F.col("__share").isNull(), F.lit(None).cast("int")
    ).otherwise(
        F.least(
            F.lit(1000),
            F.floor(F.lit(1000.0) * F.col("__share") * F.col("__n_total") / F.col("__n_lang")),
        ).cast("int")
    )
    rates = with_tot.select(lang_col, capped.alias("rate_permille"))
    joined = df.join(F.broadcast(rates), lang_col)
    return deterministic_sample(joined, F.col(id_col), F.col("rate_permille"), salt)


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.3,
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5/XLM-R α-smoothing rule):
    group shares p_i = n_i/N are flattened to q_i ∝ p_i^α (α=1 natural mix,
    α→0 uniform — rebalance_language_mix is that limit), and each group is
    down-sampled toward expected share q_i: keep-rate min(1, q_i·N/n_i),
    md5-gated per row at permille granularity so the surviving subset is
    identical on any engine, cluster layout, or re-run.

    Like the uniform rebalance this only ever DOWN-samples over-represented
    groups; under-represented groups keep rate 1000‰ (true temperature
    sampling would upsample them — repeat-epoch weighting is the training
    loader's job, not the corpus filter's).

    Scale shape: group histogram = one map-side-combined groupBy of
    GROUP-cardinality rows; two scalar broadcasts (total, normalizer); the
    corpus side is one scan + filter — no corpus shuffle. Adds
    ``rate_permille``."""
    from flink_1_6_0_spark.operators.utils import deterministic_sample

    # the histogram is GROUP-cardinality small, so the two corpus-level
    # scalars (total, normalizer) come from unpartitioned windows over it —
    # no self-derived crossJoins (which trip Spark's ambiguity analysis),
    # and the single-partition window is over a handful of rows, not data
    wfull = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    rates = (
        counts.withColumn("__tot", F.sum("__n").over(wfull))
        .withColumn("__w", F.pow(F.col("__n") / F.col("__tot"), F.lit(float(alpha))))
        .withColumn("__norm", F.sum("__w").over(wfull))
        .select(
            group_col,
            # +1e-6 before the floor: the float normalizer Σp^α can land a
            # mathematically-exact rate (e.g. exactly 1000 at α=1, the
            # natural-mix no-op) a few ulps BELOW its integer, and a bare
            # floor would silently drop ~0.1% of such groups; the epsilon
            # absorbs float dust without moving any true sub-integer rate
            F.least(
                F.lit(1000),
                F.floor(
                    F.lit(1000.0) * (F.col("__w") / F.col("__norm")) * F.col("__tot") / F.col("__n")
                    + F.lit(1e-6)
                ),
            )
            .cast("int")
            .alias("rate_permille"),
        )
    )
    joined = df.join(F.broadcast(rates), group_col)
    return deterministic_sample(joined, F.col(id_col), F.col("rate_permille"), salt)
