"""Text analysis for large-scale training-data pipelines.

Engine extensions beyond the reference surface (BASELINE.json north star):
language-ID, quality scoring, token counting, document fingerprinting — each
a pure Column expression (JVM-side, whole-stage codegen; no Python in the hot
path), so they run at 100 TB as a single scan + project.

Hash parity note: anything that must hash identically in the DuckDB oracle
uses md5-hex→bigint (first 15 hex digits, < 2^60) — both engines compute the
same value exactly; xxhash64/murmur differ between engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MOD = 1_000_000_007  # keeps all rolling-hash arithmetic exact in int64 everywhere

# Tiny per-language stopword profiles for the n-gram/stopword langid heuristic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du"),
    "de": ("der", "die", "und", "das", "ein", "nicht", "mit", "ist"),
    "es": ("el", "la", "y", "los", "una", "del", "que", "por"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "这"),
}


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: str | Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(F.trim(_c(col)), r"\s+")


def tokenize_bpe_ish(col: str | Column) -> Column:
    """BPE-ish tokenization: letter runs, digit runs, single punct marks."""
    return F.regexp_extract_all(_c(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def token_count(col: str | Column) -> Column:
    return F.size(tokenize(col))


def char_count(col: str | Column) -> Column:
    return F.char_length(_c(col))


def punct_ratio(col: str | Column) -> Column:
    """Punctuation chars / total chars; NULL for an empty string (ANSI mode
    would raise DIVIDE_BY_ZERO on it — review finding)."""
    c = _c(col)
    return F.try_divide(
        F.char_length(F.regexp_replace(c, r"[^.,;:!?'\"()-]", "")), F.char_length(c)
    )


def stopword_ratio(col: str | Column, stopwords: tuple[str, ...] = LANG_PROFILES["en"]) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokenize(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)


def mean_token_len(col: str | Column) -> Column:
    toks = tokenize(col)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.char_length(t)
    ) / F.size(toks)


def quality_score(col: str | Column) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length, a healthy
    stopword ratio, and mean word length in the natural-language band; the
    exact formula is arbitrary but deterministic (oracle-replicated)."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / 64.0, F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    mtl = mean_token_len(col)
    mtl_score = F.when((mtl >= 3.0) & (mtl <= 8.0), 1.0).otherwise(0.5)
    return F.round((len_score + sw_score + mtl_score) / 3.0, 6)


def lang_score(col: str | Column, lang: str) -> Column:
    """Stopword-profile hit count for one language."""
    toks = tokenize(col)
    sw = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(col: str | Column) -> Column:
    """Language-ID heuristic: argmax of per-language stopword hits, ties
    broken by the fixed profile order; 'und' when nothing matches."""
    result = F.lit("und")
    best = F.lit(0).cast("int")
    # iterate in reverse so earlier languages win ties
    for lang in reversed(list(LANG_PROFILES)):
        s = lang_score(col, lang).cast("int")
        is_better = s >= best
        result = F.when(s > 0, F.when(is_better, F.lit(lang)).otherwise(result)).otherwise(result)
        best = F.greatest(best, s)
    return result


def token_hash(tok: Column) -> Column:
    """Engine-portable 60-bit token hash: first 15 hex digits of md5."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def fingerprint(col: str | Column) -> Column:
    """Rolling polynomial hash over tokens (base 31, mod 1e9+7) of the
    lowercased text — a document fingerprint stable across engines."""
    toks = tokenize(F.lower(_c(col)))
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + token_hash(t) % MOD) % MOD,
    )


def bigrams(col: str | Column) -> Column:
    """Adjacent word bigrams of the tokenized text — the unit of the Gopher
    repetition signal (Rae et al. 2021, "duplicate n-gram fraction"). Empty
    array below two tokens (guards Spark's descending `sequence`)."""
    t = tokenize(_c(col))
    return F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_segments(col: str | Column, width: int = 10) -> Column:
    """Non-overlapping ``width``-token segments — the "line" unit for
    cross-document boilerplate dedup on newline-free text (the CCNet /
    RefinedWeb line-dedup step; trailing partial segment dropped). Pure
    Column expressions: the explode+groupBy consumer keeps the whole
    pipeline JVM-side."""
    t = tokenize(_c(col))
    nseg = F.floor(F.size(t) / width).cast("int")
    return F.when(
        F.size(t) >= width,
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i * width + 1, width)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def unigram_logppl(docs: DataFrame, doc_id: str, text_col: str) -> DataFrame:
    """CCNet-style LM perplexity scoring (the quality gate CCNet runs with a
    Wikipedia-trained KenLM; here the unigram LM is trained on the corpus
    itself, which keeps the operator deterministic and oracle-checkable —
    swap the vocab frame for a pre-trained table to reproduce CCNet
    exactly). Output: one row per doc with token count and
    log-perplexity = avg over tokens of -ln p(token).

    Scale shape: vocab is one corpus-wide groupBy(token) — the same shuffle
    a TF-IDF pass pays; the corpus total is a 1x1 broadcast scalar (NOT a
    single-partition window); doc-token x vocab is a shuffle equi-join on
    the token (AQE handles stopword skew). Nothing is collected."""
    toks = docs.select(
        F.col(doc_id), F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok")
    ).filter(F.length("tok") > 0)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("n_total"))
    vocab_p = vocab.crossJoin(F.broadcast(total))  # 1x1 scalar, broadcast
    scored = toks.join(vocab_p, "tok")
    return scored.groupBy(doc_id).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg(-F.log(F.col("n_tok") / F.col("n_total"))).alias("log_ppl"),
    )


def c4_line_filter(
    docs: DataFrame,
    doc_id: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (the public C4 recipe: keep lines that
    end in terminal punctuation and have enough words; drop whole pages
    containing boilerplate markers or code braces; require a minimum of
    surviving lines). Pure Column expressions over a line split — one scan,
    no UDF, no shuffle.

    Returns (doc_id, cleaned, n_lines_kept) for surviving docs only."""
    lines = F.split(F.col(text_col), "\n")
    keep = F.filter(
        lines,
        lambda l: F.trim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words),
    )
    bad = (
        F.lower(F.col(text_col)).contains("lorem ipsum")
        | F.col(text_col).contains("{")
        | F.lower(F.col(text_col)).contains("javascript")
    )
    return (
        docs.select(F.col(doc_id), F.col(text_col), keep.alias("__keep"), bad.alias("__bad"))
        .filter(~F.col("__bad") & (F.size("__keep") >= min_lines))
        .select(
            F.col(doc_id),
            F.array_join("__keep", "\n").alias("cleaned"),
            F.size("__keep").cast("long").alias("n_lines_kept"),
        )
    )


def chunk_overlap(
    docs: DataFrame,
    doc_id: str,
    text_col: str,
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Overlapping token-window chunking (context-window packing for training
    and retrieval corpora): fixed-size token chunks starting every
    ``size - overlap`` tokens, last chunk ragged. Pure Column expressions —
    tokenize once, posexplode the chunk sequence; per-doc work is linear in
    doc length and nothing shuffles."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    tk = tokenize(F.trim(F.col(text_col)))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.size(tk) - F.lit(overlap)) / F.lit(float(step)))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(tk, i * step + 1, size),
    )
    # whitespace-only docs would otherwise emit one phantom (chunk='',
    # n_tokens=1) row — split('') yields [''] (same artifact guarded in
    # dedup.cut_duplicate_spans)
    src = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    return src.select(F.col(doc_id), F.posexplode(chunks).alias("chunk_id", "__c")).select(
        F.col(doc_id),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join("__c", " ").alias("chunk"),
        F.size("__c").cast("long").alias("n_tokens"),
    )


def unigram_logppl_topk(
    docs: DataFrame,
    doc_id: str,
    text_col: str,
    k: int = 1000,
    floor_permille: int = 1,
) -> DataFrame:
    """The BROADCAST scale path of :func:`unigram_logppl` (SCALING.md): the
    vocabulary is truncated to the top-``k`` tokens by corpus frequency and
    broadcast; out-of-vocabulary tokens score a floor probability
    (``floor_permille``/1000). Turns the token-shuffle join into a
    broadcast hash join — at 100 TB the vocab side is KBs while the corpus
    side never shuffles. Integer-exact probabilities (n_tok/n_total and the
    permille floor) keep the score engine-portable."""
    toks = docs.select(
        F.col(doc_id), F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok")
    ).filter(F.length("tok") > 0)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("n_total"))
    # deterministic top-k (frequency desc, token asc tiebreak) via
    # orderBy().limit() — TakeOrderedAndProject, k·partitions rows to the
    # driver, NOT a single-partition sort of the whole vocabulary
    topk = vocab.orderBy(F.col("n_tok").desc(), F.col("tok").asc()).limit(k)
    joined = (
        toks.join(F.broadcast(topk), "tok", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(doc_id),
            F.coalesce(
                F.col("n_tok") / F.col("n_total"), F.lit(floor_permille / 1000.0)
            ).alias("p"),
        )
    )
    return joined.groupBy(doc_id).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg(-F.log(F.col("p"))).alias("log_ppl"),
    )


def vocab_coverage(docs: DataFrame, text_col: str, coverage: float = 0.95) -> DataFrame:
    """Tokenizer-vocabulary construction: the smallest frequency-ranked token
    prefix that covers ``coverage`` of all token occurrences (the standard
    pre-BPE vocab truncation / coverage analysis). Emits one row per kept
    token: (token, n, rank, cum_frac).

    Scale shape: the corpus collapses to (token, count) via a map-side
    partial agg — from there everything is VOCABULARY-sized, not
    corpus-sized. The global frequency ranking is the zip_with_index
    two-phase plan, not a single-partition window: range-repartition by
    (-n, token), per-partition running sums, then broadcast per-partition
    (row, sum) offsets. Boundary placement never changes the result — the
    (n, token) key is unique per row, so the global cumulative order is
    well-defined regardless of where ranges split.
    """
    from pyspark.sql import Window

    toks = docs.select(F.explode(tokenize(F.lower(_c(text_col)))).alias("token")).filter(
        F.length("token") > 0
    )
    counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("n"))
    total = counts.agg(F.sum("n").alias("tn"))

    ranged = counts.withColumn("__neg", -F.col("n")).repartitionByRange(
        "__neg", "token"
    ).withColumn("__pid", F.spark_partition_id())
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"), F.sum("n").alias("__psum"))
        .withColumn(
            "__row_off",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "__sum_off",
            F.coalesce(
                F.sum("__psum").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__row_off", "__sum_off")
    )
    local = Window.partitionBy("__pid").orderBy("__neg", "token")
    ranked = (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn("rank", (F.row_number().over(local) + F.col("__row_off")).cast("long"))
        .withColumn(
            "cum",
            F.sum("n").over(local.rowsBetween(Window.unboundedPreceding, 0))
            + F.col("__sum_off"),
        )
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .filter(F.col("cum") - F.col("n") < F.lit(coverage) * F.col("tn"))
        .select("token", "n", "rank", F.round(F.col("cum") / F.col("tn"), 6).alias("cum_frac"))
    )


def length_outliers(
    docs: DataFrame, id_col: str, text_col: str, group_col: str, z_thresh: float = 2.0
) -> DataFrame:
    """Group-wise length-outlier detection: documents whose token count sits
    more than ``z_thresh`` sample standard deviations from their group's
    mean (the per-source anomaly screen before length filters are set —
    a global cutoff is wrong when sources have different length regimes).

    Scale shape: per-group stats are a map-side-combined groupBy of
    GROUP-cardinality rows, broadcast back onto the corpus — one scan plus
    a BroadcastHashJoin, no corpus shuffle. The comparison runs on the
    ROUNDED z (4 dp) so the boundary is engine-portable."""
    base = docs.select(
        F.col(id_col), F.col(group_col), token_count(text_col).cast("long").alias("n_tokens")
    )
    stats = base.groupBy(group_col).agg(
        F.avg("n_tokens").alias("__mu"), F.stddev_samp("n_tokens").alias("__sd")
    )
    # try_divide: a zero-variance group has no outliers — NULL z drops out of
    # the filter (ANSI division would throw; DuckDB's x/0.0 is NULL too)
    z = F.round(F.try_divide(F.col("n_tokens") - F.col("__mu"), F.col("__sd")), 4)
    return (
        base.join(F.broadcast(stats), group_col)
        .select(id_col, group_col, "n_tokens", z.alias("z"))
        .filter(F.abs(F.col("z")) > z_thresh)
    )


def bigram_logppl(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Bigram language-model perplexity per document, add-one smoothed:
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V), score = mean −ln P over the
    doc's bigrams — the conditional upgrade of :func:`unigram_logppl`
    (CCNet-style LM gating with one token of context).

    Counts are corpus-wide integers (engine-exact probabilities); the only
    floats are ln and the final mean, rounded for portability. Scale shape:
    the corpus explodes to bigram rows ONCE (shingle_rows k=2); both count
    tables are map-side-combined groupBys; scoring is two equi-joins (on the
    bigram, then its context word) — the same skew profile as any token
    join (AQE skew-split), with the unigram_logppl_topk broadcast-truncation
    trick available when the bigram table outgrows a comfortable shuffle."""
    from flink_1_6_0_spark.pipeline.dedup import shingle_rows

    bg = shingle_rows(docs, id_col, text_col, k=2, dedupe=False).withColumn(
        "w1", F.split_part(F.col("s"), F.lit(" "), F.lit(1))
    )
    c2 = bg.groupBy("s").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        docs.select(F.explode(tokenize(F.lower(F.col(text_col)))).alias("t"))
        .filter(F.length("t") > 0)
        .agg(F.count_distinct("t").alias("V"))
    )
    p = (F.col("c2") + 1) / (F.col("c1") + F.col("V"))
    return (
        bg.join(c2, "s")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(F.col("doc").alias(id_col))
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("log_ppl"),
        )
    )


def _bpe_words(col: Column) -> Column:
    """BPE word stream: lower → trim → split on an EXPLICIT whitespace class.
    Explicit because Java's ``\\s`` includes U+000B where DuckDB/RE2's does
    not — the oracle (duck_bpe_oracle) splits on the same class, so both
    engines see identical words on any corpus (r13 ADVICE item)."""
    return F.split(F.trim(F.lower(col)), "[ \\t\\n\\x0B\\f\\r]+")


def _codepoint_chars(col: Column) -> Column:
    """Split a word into CODEPOINT characters. Java regex ``.`` matches a
    full code point (astral chars stay whole), matching DuckDB's
    codepoint-based substr — whereas ``F.split(w, '(?!$)')`` cuts UTF-16
    code units and shears non-BMP characters into surrogate halves (r13
    ADVICE item)."""
    return F.regexp_extract_all(col, F.lit("(?s)."), 0)


def bpe_train(
    docs: DataFrame,
    text_col: str,
    num_merges: int = 10,
    end_of_word: str = "</w>",
) -> list[tuple[str, str, int]]:
    """Distributed BPE tokenizer training (the Sennrich '16 / GPT-2 merge
    loop): learn ``num_merges`` merge rules from the corpus, most frequent
    adjacent symbol pair first. Returns [(left, right, weighted_count), ...]
    in merge order.

    Scale shape — the textbook trick carries over: BPE trains on the WORD
    DICTIONARY (type, frequency), not the raw corpus, so after one
    corpus-wide groupBy(word) every iteration touches only vocabulary-sized
    data. Per merge: adjacent pairs explode from each word's symbol array
    weighted by word frequency (map-side combined count), the single argmax
    row comes to the driver (ties: count desc, pair asc — deterministic),
    and the merge itself is a greedy-left scan implemented as a pure
    F.aggregate over (symbol, next) pairs — no Python in the per-word path.
    localCheckpoint per iteration caps the lineage the same way the bulk
    batch iterations do (operators/iterations.py).

    Job fusion (r17, guide §1.2/§5): the checkpoints are LAZY, so each
    iteration's argmax job materializes the previous merge's vocab update
    as part of itself — ONE Spark job per merge instead of two (the eager
    form paid a separate blocking job per vocab rewrite). The argmax is
    computed over identical vocab content with the same deterministic
    tie-break (count desc, pair asc), so the learned merge list is
    bit-identical; only WHEN the rewrite executes moves. Block release
    trails one iteration: a lazy checkpoint's blocks must exist before its
    parent's are dropped, and they exist exactly after the argmax job that
    consumed it."""
    vocab = (
        docs.select(F.explode(_bpe_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            "freq",
            F.concat(
                _codepoint_chars(F.col("w")),
                F.array(F.lit(end_of_word)),
            ).alias("syms"),
        )
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    to_release = None
    for _ in range(num_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        # this action materialized `vocab`'s lazy checkpoint, truncating its
        # lineage — the grandparent's blocks are now safe to drop (dropping
        # them any earlier would strand the not-yet-materialized child)
        if to_release is not None:
            to_release.unpersist()
            to_release = None
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        to_release = vocab
        vocab = vocab.select(
            "freq", _merge_pair_scan(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=False)
    if to_release is not None:
        to_release.unpersist()
    return merges


def _merge_pair_scan(syms: Column, a: str, b: str) -> Column:
    """Greedy-left merge of adjacent (a, b) symbol pairs — the BPE merge
    step as a pure F.aggregate over (cur, next) pairs with a skip flag
    ('skip' marks an element already consumed as a merge's second half).
    Shared by training (over the word dictionary) and apply (over text)."""
    la, lb = F.lit(a), F.lit(b)
    zipped = F.zip_with(
        syms,
        F.concat(F.slice(syms, 2, F.size(syms)), F.array(F.lit(""))),
        lambda cur, nxt: F.struct(cur.alias("cur"), nxt.alias("nxt")),
    )
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc, p):
        return (
            F.when(acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")))
            .when(
                (p["cur"] == la) & (p["nxt"] == lb),
                F.struct(
                    F.concat(acc["out"], F.array(F.concat(la, lb))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(p["cur"])).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(zipped, acc0, step, lambda acc: acc["out"])


def duck_bpe_oracle(num_merges: int = 10, end_of_word: str = "</w>") -> str:
    """Unrolled-CTE replay of :func:`bpe_train` for DuckDB — the whole merge
    loop is integer/string arithmetic, so the oracle is EXACT (no float
    tolerance anywhere). Per round t: adjacent pairs of the previous vocab
    weighted by word frequency, argmax with the same (count desc, pair asc)
    binary-collation tie-break, and the greedy-left merge expressed as
    gaps-and-islands — consecutive match positions alternate taken/consumed
    starting from the left (odd rank within an island = taken), and a
    position is dropped when its predecessor was taken. Emits the merge
    table (rank, left, right, weighted_count), ranks 0..num_merges-1 (a
    round whose best pair has weight < 2 emits nothing, and the vocab is
    then a fixed point, matching the Python loop's break)."""
    eow = end_of_word.replace("'", "''")
    ctes = [
        # the explicit whitespace class matches _bpe_words (Java \s includes
        # U+000B, RE2's does not); substr() is codepoint-based, matching
        # _codepoint_chars' per-code-point split on the Spark side
        "tok AS MATERIALIZED (SELECT t.w FROM documents, "
        "unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS t(w) WHERE length(t.w) > 0)",
        "v0 AS MATERIALIZED (SELECT w, count(*)::BIGINT AS freq, "
        f"list_append(list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)), '{eow}') AS syms "
        "FROM tok GROUP BY w)",
    ]
    for t in range(1, num_merges + 1):
        p = t - 1
        ctes += [
            # adjacent-pair weights over the round's vocab
            f"p{t} AS MATERIALIZED (SELECT v.syms[r.i] AS a, v.syms[r.i + 1] AS b, sum(v.freq) AS n "
            f"FROM v{p} v, unnest(range(1, len(v.syms))) AS r(i) GROUP BY 1, 2)",
            f"m{t} AS MATERIALIZED (SELECT {p}::BIGINT AS rank, a, b, n::BIGINT AS n "
            f"FROM p{t} WHERE n >= 2 ORDER BY n DESC, a ASC, b ASC LIMIT 1)",
            # explode symbols with positions, flag merge-pair starts
            f"e{t} AS (SELECT v.w, v.freq, r.i AS pos, v.syms[r.i] AS s, v.syms[r.i + 1] AS nxt, "
            f"coalesce(v.syms[r.i] = (SELECT a FROM m{t}) AND v.syms[r.i + 1] = (SELECT b FROM m{t}), FALSE) AS is_m "
            f"FROM v{p} v, unnest(range(1, len(v.syms) + 1)) AS r(i))",
            # islands of consecutive match positions; odd rank in island = taken
            f"g{t} AS (SELECT *, CASE WHEN is_m THEN pos - row_number() "
            f"OVER (PARTITION BY w, is_m ORDER BY pos) ELSE NULL END AS grp FROM e{t})",
            f"k{t} AS (SELECT *, CASE WHEN is_m THEN row_number() "
            f"OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1 ELSE FALSE END AS taken FROM g{t})",
            f"c{t} AS (SELECT *, coalesce(lag(taken) OVER (PARTITION BY w ORDER BY pos), FALSE) AS consumed FROM k{t})",
            f"v{t} AS MATERIALIZED (SELECT w, any_value(freq) AS freq, "
            f"list(CASE WHEN taken THEN s || nxt ELSE s END ORDER BY pos) AS syms "
            f"FROM c{t} WHERE NOT consumed GROUP BY w)",
        ]
    union = " UNION ALL ".join(f"SELECT * FROM m{t}" for t in range(1, num_merges + 1))
    return (
        "WITH " + ",\n".join(ctes)
        + f'\nSELECT rank, a AS "left", b AS "right", n AS weighted_count FROM ({union}) ORDER BY rank'
    )


def bpe_segment(
    col: str | Column,
    merges: list[tuple[str, str, int]],
    end_of_word: str = "</w>",
) -> Column:
    """Apply learned BPE merges to a text column → array of subword tokens
    (the tokenizer's encode step): each word splits to characters + the
    end-of-word marker, then every merge rule replays IN LEARNED ORDER via
    the same greedy-left scan as training — one Column expression chain, no
    Python per row. For thousand-rule production vocabularies, a single
    Arrow-batched pass with a rank-indexed pair dict is the faster shape;
    the expression form is exact and JVM-side for the rule counts a test
    corpus learns."""
    # drop empty "words": splitting '' re-emits '' — a phantom ['', '</w>']
    # subword pair per blank doc that training (which filters length>0)
    # never saw (review finding). Same word/char split as bpe_train.
    words = F.filter(_bpe_words(_c(col)), lambda w: w != "")
    segs = F.transform(
        words,
        lambda w: F.concat(_codepoint_chars(w), F.array(F.lit(end_of_word))),
    )
    for a, b, _ in merges:
        segs = F.transform(segs, lambda s: _merge_pair_scan(s, a, b))
    return F.flatten(segs)
