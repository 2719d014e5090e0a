"""Training-data prep queries, round 3: PII redaction, benchmark
contamination, sequence packing (pipeline/prep.py operators, oracle-checked).

The documents table's synthetic text has no digits or '@', so the PII query
builds a deterministic PII-bearing column from doc_id/source IDENTICALLY on
both engines before redacting — the redaction regexes then have real work to
do and the value-hash check covers match+replace semantics, not just a
no-op pass-through.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.pipeline import prep
from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query

# Same synthetic-PII construction in Spark and DuckDB: an email, an IPv4 and
# a long account number derived from doc_id, embedded around the real text.
# (A function, not a module-level Column: classic-API Column construction
# needs an active SparkContext, and registry modules import session-free.)
def _pii_spark():
    return F.concat_ws(
        " ",
        F.concat(F.lit("user"), F.col("doc_id"), F.lit("@"), F.col("source"), F.lit(".example.com")),
        F.substring(F.col("text"), 1, 40),
        F.concat(F.lit("10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
        F.concat(F.lit("acct "), (F.col("doc_id") * 1234567 + 10000000).cast("string")),
    )

_PII_DUCK = (
    "concat_ws(' ', 'user' || doc_id || '@' || source || '.example.com', "
    "substr(text, 1, 40), "
    "'10.0.' || (doc_id % 256) || '.7', "
    "'acct ' || (doc_id * 1234567 + 10000000))"
)


@query(
    "text_pii_redact",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_PII_DUCK} AS t FROM documents),
    r1 AS (SELECT doc_id, t,
                  regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS t1,
                  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email
           FROM raw),
    r2 AS (SELECT doc_id, t1,
                  regexp_replace(t1, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '<IP>', 'g') AS t2,
                  n_email,
                  len(regexp_extract_all(t1, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) AS n_ip
           FROM r1)
    SELECT doc_id,
           regexp_replace(t2, '\\b[0-9]{{7,}}\\b', '<NUM>', 'g') AS redacted,
           n_email, n_ip,
           len(regexp_extract_all(t2, '\\b[0-9]{{7,}}\\b')) AS n_num
    FROM r2
    """,
    tags=("pipeline", "text", "pii"),
    bench=True,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as pure regexp_replace Column chains (JVM-side, one
    scan — the shape that holds at 100 TB). Patterns are lookaround-free so
    Java regex and RE2 agree; counts are taken on the progressively redacted
    text so categories don't double-count each other's digits."""
    d = T(spark, sf_dir, "documents").select("doc_id", _pii_spark().alias("t"))
    n_email, n_ip, n_num = prep.pii_counts(F.col("t"))
    return d.select(
        "doc_id",
        prep.pii_redact(F.col("t")).alias("redacted"),
        n_email.cast("long").alias("n_email"),
        n_ip.cast("long").alias("n_ip"),
        n_num.cast("long").alias("n_num"),
    )


@query(
    "contamination_ngram",
    oracle="""
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    corp AS (SELECT doc_id, text FROM documents WHERE doc_id >= 20),
    btoks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM bench),
    bsh AS (SELECT DISTINCT tt[i] || ' ' || tt[i+1] || ' ' || tt[i+2] AS s
            FROM btoks, unnest(generate_series(1, len(tt) - 2)) AS g(i)),
    ctoks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM corp),
    csh AS (SELECT DISTINCT doc_id, tt[i] || ' ' || tt[i+1] || ' ' || tt[i+2] AS s
            FROM ctoks, unnest(generate_series(1, len(tt) - 2)) AS g(i))
    SELECT csh.doc_id, count(*) AS n_contaminated
    FROM csh JOIN bsh USING (s)
    GROUP BY csh.doc_id
    """,
    tags=("pipeline", "text", "dedup"),
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM eval-overlap
    step): distinct 3-token shingle hits of each corpus doc against a
    broadcast benchmark shingle set — corpus side is one scan, benchmark
    side ships to every executor; no corpus shuffle beyond the per-doc
    count."""
    docs = T(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20)
    corpus = docs.filter(F.col("doc_id") >= 20)
    return prep.contaminated_docs(corpus, bench, "doc_id", "text", k=3)


@query(
    "contamination_bloom",
    oracle="""
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
    corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0),
    btoks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM bench),
    bsh AS (SELECT DISTINCT tt[i] || ' ' || tt[i+1] || ' ' || tt[i+2] AS s
            FROM btoks, unnest(generate_series(1, len(tt) - 2)) AS g(i)),
    ctoks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM corp),
    csh AS (SELECT DISTINCT doc_id, tt[i] || ' ' || tt[i+1] || ' ' || tt[i+2] AS s
            FROM ctoks, unnest(generate_series(1, len(tt) - 2)) AS g(i))
    SELECT csh.doc_id, count(*) AS n_contaminated
    FROM csh JOIN bsh USING (s)
    GROUP BY csh.doc_id
    """,
    tags=("pipeline", "text", "dedup"),
    bench=True,
)
def contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination — the exact contamination check with
    an 8192-bit Bloom filter (two md5-derived bit slices per shingle) probed
    inside the corpus scan, so only bloom-positive shingles reach the exact
    broadcast join. The filter build collects at most m bit positions
    (bounded by the FILTER size, never by data size); false positives are
    removed by the exact join, so the result — and the oracle — is the plain
    exact query. The 100 TB shape when the benchmark suite outgrows a
    comfortable broadcast."""
    docs = T(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return prep.contamination_bloom(corpus, bench, "doc_id", "text", k=3, m=8192)


@query(
    "pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             (doc_id % 8)::INT AS shard,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
      FROM documents)
    SELECT doc_id, shard, n_tokens,
           coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0)::BIGINT AS offset,
           (coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) // 256)::BIGINT AS bin
    FROM t
    """,
    tags=("pipeline", "utils"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining batches: concatenate-in-order within
    a deterministic shard, split at a 256-token budget — an exclusive
    running sum + integer division, i.e. num_shards bounded sorts instead of
    a global one."""
    return prep.pack_sequences(
        T(spark, sf_dir, "documents"), "doc_id", "text", budget=256, num_shards=8
    )


def _ffd_pyoracle(con, budget: int = 256, num_shards: int = 8):
    """Trusted-reimplementation oracle for pack_sequences_ffd at tiers where
    the recursive-CTE oracle is cost-prohibitive (r14 verdict task 5: the
    CTE replays ONE recursion step per document single-threaded — >50 min at
    the x10 tier while the engine packs it in ~15 s). Tokenize/shard stay in
    DuckDB SQL (vectorized, independent); the placement is a NAIVE
    first-fit over a numpy capacity array — scan-for-first-fitting-bin
    semantics straight from the FFD definition, deliberately NOT the
    engine's segment-tree kernel (pipeline/prep.ffd_place) nor an import of
    it. Same independence pattern the property suite uses
    (tests/test_properties.py naive reference)."""
    import numpy as np
    import pandas as pd

    base = con.sql(
        f"SELECT doc_id, (doc_id % {num_shards})::INT AS shard, "
        "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens "
        "FROM documents"
    ).fetchdf()
    if base.empty:  # pd.concat([]) raises; an empty corpus packs to 0 rows
        return base.assign(bin=pd.Series(dtype="int64"))
    out = []
    for _, g in base.groupby("shard", sort=True):
        g = g.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        ).copy()
        caps = np.empty(len(g), dtype=np.int64)
        n_open = 0
        bins = []
        for tok in g["n_tokens"].to_numpy():
            open_caps = caps[:n_open]
            fit = open_caps >= tok
            if fit.any():
                b = int(np.argmax(fit))  # FIRST fitting bin (lowest index)
                caps[b] -= tok
            else:
                b = n_open  # new bin; oversize docs go negative, alone
                caps[b] = budget - tok
                n_open += 1
            bins.append(b)
        g["bin"] = np.array(bins, dtype=np.int64)
        out.append(g)
    return pd.concat(out, ignore_index=True)


@query(
    "pack_sequences_ffd",
    oracle="""
    WITH RECURSIVE items AS (
        SELECT doc_id, (doc_id % 8)::INT AS shard,
               len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
               row_number() OVER (PARTITION BY doc_id % 8
                                  ORDER BY len(string_split_regex(trim(text), '\\s+')) DESC,
                                           doc_id) AS rn
        FROM documents),
    ffd AS (
        SELECT shard, 0::BIGINT AS rn, CAST([] AS BIGINT[]) AS caps,
               NULL::BIGINT AS doc_id, NULL::BIGINT AS n_tokens, NULL::BIGINT AS bin
        FROM (SELECT DISTINCT shard FROM items)
        UNION ALL
        SELECT f.shard, i.rn,
               CASE WHEN pos IS NULL
                    THEN list_append(f.caps, 256 - i.n_tokens)
                    ELSE list_transform(f.caps, (x, j) -> CASE WHEN j = pos THEN x - i.n_tokens ELSE x END)
               END,
               i.doc_id, i.n_tokens,
               coalesce(pos, len(f.caps) + 1) - 1
        FROM ffd f
        JOIN items i ON i.shard = f.shard AND i.rn = f.rn + 1
        CROSS JOIN LATERAL (
            SELECT list_min(list_transform(f.caps,
                   (x, j) -> CASE WHEN x >= i.n_tokens THEN j ELSE NULL END)) AS pos) p
    )
    SELECT doc_id, shard, n_tokens, bin FROM ffd WHERE doc_id IS NOT NULL
    """,
    tags=("pipeline", "utils"),
    bench=True,
    pyoracle=_ffd_pyoracle,
)
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing packing at a 256-token budget: per-shard FFD in
    one applyInPandas pass (num_shards independent sequential kernels, no
    global state). The oracle replays the IDENTICAL deterministic placement
    — (n_tokens DESC, doc_id) order, first-fitting bin, oversize docs open
    their own bin — with a DuckDB recursive CTE carrying each shard's
    remaining-capacity list. At tiers where that recursion is
    cost-prohibitive, the registered ``pyoracle`` (naive numpy first-fit,
    independent of the engine's segment-tree kernel) gates it instead —
    scripts/oracle_check.py ``--py`` (r14 verdict task 5)."""
    return prep.pack_sequences_ffd(
        T(spark, sf_dir, "documents"), "doc_id", "text", budget=256, num_shards=8
    )


@query(
    "multimodal_real_decode",
    oracle="""
    WITH s AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '_', 'g') AS ptext FROM documents),
    t AS (SELECT doc_id, least(32, length(ptext))::INT AS w, ptext FROM s)
    SELECT doc_id, 'image' AS kind, w AS width, 1 AS height, 1 AS channels,
           list_sum(list_transform(generate_series(1, w),
                                   i -> ascii(substr(ptext, i, 1)))) / w AS mean_c0
    FROM t
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode through the production plumbing: a valid binary PGM
    (P5) is assembled per document (header + the text's first bytes as
    grayscale pixels), decoded by the pure-stdlib netpbm decoder inside
    mapInPandas, and the pixel means are value-checked against DuckDB
    computing the same byte average — the decoder, not a stub, is on the
    oracle path.

    The pixel source is sanitized to printable ASCII first (non-ASCII → '_',
    identically on both sides): multi-byte UTF-8 would make byte length
    exceed the declared width and Spark's byte means diverge from DuckDB's
    per-char ascii() averages (round-3 ADVICE)."""
    from flink_1_6_0_spark.pipeline import multimodal as mm

    d = T(spark, sf_dir, "documents")
    ptext = F.regexp_replace(F.col("text"), "[^ -~]", "_")
    w = F.least(F.lit(32), F.length(ptext)).cast("int")
    media = F.concat(
        F.encode(F.concat_ws("", F.lit("P5\n"), w.cast("string"), F.lit(" 1\n255\n")), "utf-8"),
        F.encode(F.substring(ptext, 1, 32), "utf-8"),
    )
    src = d.select(
        "doc_id",
        media.alias("media"),
        F.struct(F.lit("pgm").alias("format"), F.length(media).alias("n_bytes")).alias("meta"),
    )
    return mm.decode_media(src).select("doc_id", "kind", "width", "height", "channels", "mean_c0")


@query(
    "multimodal_resize_box",
    oracle="""
    WITH s AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '_', 'g') AS pt FROM documents),
    t AS (SELECT doc_id, substr(pt, 1, (least(32, length(pt)) // 2) * 2) AS row0 FROM s),
    u AS (SELECT doc_id, row0, reverse(row0) AS row1, length(row0)::INT AS w
          FROM t WHERE length(row0) >= 2)
    SELECT doc_id, (w // 2)::INT AS width, 1 AS height,
           list_sum(list_transform(generate_series(0, w // 2 - 1), c ->
              (ascii(substr(row0, 2 * c + 1, 1)) + ascii(substr(row0, 2 * c + 2, 1))
             + ascii(substr(row1, 2 * c + 1, 1)) + ascii(substr(row1, 2 * c + 2, 1))) // 4
           )) / (w // 2) AS mean_c0
    FROM u
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_resize_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through the production plumbing: a 2-row binary PGM
    is assembled per document (row 0 = the text's first even-length printable
    bytes, row 1 = the same bytes REVERSED so vertical averaging is
    non-trivial), box-average-downscaled 2x2 inside mapInPandas
    (pipeline/multimodal.resize_box: decode -> integer box mean -> re-encode),
    then the RESIZED binary is decoded again by the netpbm decoder — the
    whole decode/resize/re-encode/decode chain is on the oracle path. DuckDB
    computes the closed form: each output pixel is
    floor((a_2c + a_2c+1 + rev_2c + rev_2c+1) / 4), exact integers on both
    engines."""
    from flink_1_6_0_spark.pipeline import multimodal as mm

    d = T(spark, sf_dir, "documents")
    ptext = F.regexp_replace(F.col("text"), "[^ -~]", "_")
    even_w = (F.least(F.lit(32), F.length(ptext)) / 2).cast("int") * 2
    row0 = F.substring(ptext, 1, 32).substr(F.lit(1), even_w)
    media = F.concat(
        F.encode(
            F.concat_ws("", F.lit("P5\n"), even_w.cast("string"), F.lit(" 2\n255\n")),
            "utf-8",
        ),
        F.encode(row0, "utf-8"),
        F.encode(F.reverse(row0), "utf-8"),
    )
    src = d.filter(even_w >= 2).select(
        "doc_id",
        media.alias("media"),
        F.struct(F.lit("pgm").alias("format"), F.length(media).alias("n_bytes")).alias("meta"),
    )
    resized = mm.resize_media(src, fx=2, fy=2)
    return mm.decode_media(resized).select("doc_id", "width", "height", "mean_c0")


@query(
    "embedding_normalize",
    oracle="""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
               FROM embeddings)
    SELECT vec_id, unnest(range(len(v)))::INT AS dim,
           unnest(list_transform(v, x -> x / norm)) AS unit_val, norm
    FROM t WHERE norm > 0.000001
    """,
    tags=("pipeline", "similarity"),
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene before ANN/dedup indexing: drop near-zero-norm
    vectors, emit unit vectors + norms — pure array expressions in the scan
    projection (no UDF, no shuffle).

    Registered output is the EXPLODED form (vec_id, dim, unit_val, norm):
    the driver's canonicalizer sorts raw pandas columns, and array-typed
    cells are unhashable there (round-4 verdict #1). The array-shaped
    operator itself is unchanged (pipeline/similarity.normalize_embeddings);
    this query flattens only at the comparison boundary. Both engines
    compute the identical IEEE sequence (cast→square→ordered sum→sqrt→
    divide), so raw doubles hash equal."""
    from flink_1_6_0_spark.pipeline.similarity import normalize_embeddings

    unit = normalize_embeddings(T(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    return unit.select(
        "vec_id", F.posexplode("unit").alias("dim", "unit_val"), "norm"
    ).select("vec_id", "dim", "unit_val", "norm")


@query(
    "text_perplexity_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE len(t.tok) > 0
    ),
    vocab AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok),
    tot AS (SELECT sum(n_tok) AS n_total FROM vocab),
    scored AS (
      SELECT toks.doc_id, vocab.n_tok, tot.n_total
      FROM toks JOIN vocab USING (tok), tot
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           round(avg(-ln(n_tok / n_total)), 3) AS log_ppl
    FROM scored GROUP BY doc_id
    HAVING round(avg(-ln(n_tok / n_total)), 3) < 9.0
    """,
    tags=("pipeline", "text", "quality"),
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity gate: score every document with a corpus-trained
    unigram LM and keep those under a log-perplexity ceiling (low ppl ≈
    head/common text, high ppl ≈ tail/noise — CCNet's head/middle/tail
    split). See pipeline/text.unigram_logppl for the scale shape."""
    from flink_1_6_0_spark.pipeline.text import unigram_logppl

    d = T(spark, sf_dir, "documents")
    scored = unigram_logppl(d, "doc_id", "text")
    return scored.select(
        "doc_id", "n_tokens", F.round("log_ppl", 3).alias("log_ppl")
    ).filter(F.col("log_ppl") < 9.0)


@query(
    "text_c4_clean",
    oracle="""
    WITH tt AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
    ),
    built AS (
      SELECT doc_id,
             list_transform(generate_series(0, (len(tk) + 7) // 8 - 1),
                            i -> array_to_string(tk[8*i+1 : 8*i+8], ' ')
                                 || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)
             AS lines
      FROM tt
    ),
    doc AS (
      SELECT doc_id,
             array_to_string(CASE WHEN doc_id % 97 = 0
                                  THEN list_append(lines, 'lorem ipsum dolor sit amet consectetur.')
                                  ELSE lines END, chr(10)) AS text2
      FROM built
    ),
    kept AS (
      SELECT doc_id, text2,
             list_filter(string_split(text2, chr(10)),
                         l -> regexp_matches(trim(l), '[.!?"]$')
                              AND len(string_split_regex(trim(l), '\\s+')) >= 5) AS keep
      FROM doc
    )
    SELECT doc_id, array_to_string(keep, chr(10)) AS cleaned, len(keep)::BIGINT AS n_lines_kept
    FROM kept
    WHERE NOT (contains(lower(text2), 'lorem ipsum') OR contains(text2, '{')
               OR contains(lower(text2), 'javascript'))
      AND len(keep) >= 3
    """,
    tags=("pipeline", "text", "quality"),
)
def text_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style page cleaning (public C4 recipe: terminal-punctuation lines
    with >=5 words, >=3 surviving lines, boilerplate/brace pages dropped) —
    pipeline/text.c4_line_filter, pure Column expressions.

    The synthetic corpus has no line structure, so the query first BUILDS a
    deterministic multi-line page from each doc's tokens identically on both
    engines (8-token lines, 2 of 3 ending in '.', a lorem-ipsum line
    injected into every 97th doc) — the filter then has real work to do and
    the value hash covers both the keep and the drop paths."""
    from flink_1_6_0_spark.pipeline.text import c4_line_filter, tokenize

    d = T(spark, sf_dir, "documents")
    tk = tokenize(F.trim(F.col("text")))
    nlines = F.ceil(F.size(tk) / F.lit(8)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.concat(
            F.array_join(F.slice(tk, i * 8 + 1, 8), " "),
            F.when((F.col("doc_id") + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    lines = F.when(
        F.col("doc_id") % 97 == 0,
        F.concat(lines, F.array(F.lit("lorem ipsum dolor sit amet consectetur."))),
    ).otherwise(lines)
    built = d.select("doc_id", F.array_join(lines, "\n").alias("text2"))
    return c4_line_filter(built, "doc_id", "text2", min_words=5, min_lines=3)


@query(
    "multimodal_ahash",
    oracle="""
    WITH s AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '_', 'g') AS ptext FROM documents),
    t AS (SELECT doc_id, least(32, length(ptext))::INT AS w, ptext FROM s),
    px AS (SELECT doc_id, w,
                  list_transform(generate_series(1, w), i -> ascii(substr(ptext, i, 1))) AS p
           FROM t)
    SELECT doc_id,
           CASE WHEN w = 0 THEN NULL ELSE
             list_sum(list_transform(generate_series(1, w),
                      i -> CASE WHEN p[i] * w > list_sum(p) THEN 1::BIGINT << (w - i) ELSE 0 END))::BIGINT
           END AS ahash
    FROM px
    """,
    tags=("pipeline", "multimodal", "dedup"),
)
def multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash through the REAL decode path: the same
    per-document binary PGM as multimodal_real_decode, hashed by
    pipeline/multimodal.ahash_pgm (strictly-above-mean bit per pixel,
    MSB-first, exact integer compare p*n > sum so every engine agrees) —
    the image-corpus analog of dedup_exact's content hash; near-dups then
    bucket by groupBy(ahash) or small Hamming distance."""
    from flink_1_6_0_spark.pipeline import multimodal as mm

    d = T(spark, sf_dir, "documents")
    ptext = F.regexp_replace(F.col("text"), "[^ -~]", "_")
    w = F.least(F.lit(32), F.length(ptext)).cast("int")
    media = F.concat(
        F.encode(F.concat_ws("", F.lit("P5\n"), w.cast("string"), F.lit(" 1\n255\n")), "utf-8"),
        F.encode(F.substring(ptext, 1, 32), "utf-8"),
    )
    src = d.select("doc_id", media.alias("media"))
    return mm.media_ahash(src)


@query(
    "text_chunk_overlap",
    oracle="""
    WITH tt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
             WHERE length(trim(text)) > 0),
    c AS (SELECT doc_id, tk,
                 greatest(1, ceil((len(tk) - 8) / 24.0))::INT AS nc
          FROM tt)
    SELECT doc_id, i::BIGINT AS chunk_id,
           array_to_string(tk[24*i+1 : 24*i+32], ' ') AS chunk,
           len(tk[24*i+1 : 24*i+32])::BIGINT AS n_tokens
    FROM c, unnest(generate_series(0, nc - 1)) AS g(i)
    """,
    tags=("pipeline", "text", "utils"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (size=32, overlap=8 → a chunk
    every 24 tokens, ragged tail) — pipeline/text.chunk_overlap."""
    from flink_1_6_0_spark.pipeline.text import chunk_overlap

    return chunk_overlap(T(spark, sf_dir, "documents"), "doc_id", "text", size=32, overlap=8)


@query(
    "corpus_split_shuffle",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 15))::BIGINT % 1000 AS gate,
             ('0x' || substr(md5(doc_id::VARCHAR || 'shuffle'), 1, 15))::BIGINT AS shuffle_key
      FROM documents)
    SELECT doc_id,
           CASE WHEN gate < 900 THEN 'train'
                WHEN gate < 950 THEN 'val'
                WHEN gate < 1000 THEN 'test' END AS split,
           shuffle_key
    FROM g
    """,
    tags=("pipeline", "utils"),
)
def corpus_split_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment + reproducible shuffle
    sort key, both via the engine-portable md5 gate (operators/utils.py
    split_assign / corpus_shuffle_key) — pure projection, no shuffle, no
    RNG; the same row lands in the same split on any engine or cluster."""
    from flink_1_6_0_spark.operators.utils import corpus_shuffle_key, split_assign

    d = T(spark, sf_dir, "documents").select("doc_id")
    out = split_assign(d, "doc_id", {"train": 900, "val": 50, "test": 50})
    return corpus_shuffle_key(out, "doc_id").select("doc_id", "split", "shuffle_key")


@query(
    "doc_length_quantiles",
    oracle="""
    WITH t AS (SELECT source, len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
               FROM documents)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           round(quantile_cont(n_tokens, 0.25), 2) AS p25,
           round(quantile_cont(n_tokens, 0.50), 2) AS p50,
           round(quantile_cont(n_tokens, 0.90), 2) AS p90,
           round(quantile_cont(n_tokens, 0.99), 2) AS p99
    FROM t GROUP BY source
    """,
    tags=("pipeline", "text", "stats"),
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length distribution (the corpus-profiling step before
    setting packing budgets and length filters): exact interpolated
    percentiles via Spark SQL `percentile` — same linear interpolation as
    DuckDB's quantile_cont. At 100 TB swap `percentile` for
    `percentile_approx` (t-digest sketch, mergeable map-side) — same call
    shape, documented trade; the exact form is the oracle-checkable one."""
    from flink_1_6_0_spark.pipeline.text import token_count

    d = T(spark, sf_dir, "documents").select(
        "source", token_count(F.trim(F.col("text"))).cast("long").alias("n_tokens")
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.expr("percentile(n_tokens, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(n_tokens, 0.50)"), 2).alias("p50"),
        F.round(F.expr("percentile(n_tokens, 0.90)"), 2).alias("p90"),
        F.round(F.expr("percentile(n_tokens, 0.99)"), 2).alias("p99"),
    )


@query(
    "text_perplexity_topk_vocab",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE len(t.tok) > 0
    ),
    vocab AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok),
    tot AS (SELECT sum(n_tok) AS n_total FROM vocab),
    topk AS (SELECT tok, n_tok FROM vocab ORDER BY n_tok DESC, tok ASC LIMIT 25),
    scored AS (
      SELECT toks.doc_id,
             coalesce(topk.n_tok / tot.n_total, 0.001) AS p
      FROM toks LEFT JOIN topk USING (tok), tot
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           round(avg(-ln(p)), 3) AS log_ppl
    FROM scored GROUP BY doc_id
    """,
    tags=("pipeline", "text", "quality"),
)
def text_perplexity_topk_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-vocab perplexity (the 100 TB path of text_perplexity_filter):
    top-25 tokens by corpus frequency broadcast to every executor,
    out-of-vocab floored at 1/1000 — the corpus side never shuffles on the
    token (pipeline/text.unigram_logppl_topk)."""
    from flink_1_6_0_spark.pipeline.text import unigram_logppl_topk

    d = T(spark, sf_dir, "documents")
    out = unigram_logppl_topk(d, "doc_id", "text", k=25, floor_permille=1)
    return out.select("doc_id", "n_tokens", F.round("log_ppl", 3).alias("log_ppl"))


@query(
    "sample_n_per_source",
    oracle="""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || 'pick'), 1, 15))::BIGINT ASC,
                        doc_id ASC) AS rk
      FROM documents)
    WHERE rk <= 5
    """,
    tags=("pipeline", "utils"),
)
def sample_n_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample of 5 docs per source (hash-rank inside
    each key — operators/utils.sample_n_per_key): the corpus-inspection
    operator, reproducible on any engine or cluster layout."""
    from flink_1_6_0_spark.operators.utils import sample_n_per_key

    d = T(spark, sf_dir, "documents").select("source", "doc_id")
    return sample_n_per_key(d, "source", "doc_id", n=5)


@query(
    "prep_pipeline_e2e",
    oracle="""
    WITH gated AS (
      SELECT doc_id, source, text
      FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 30
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source
      FROM gated GROUP BY text
    ),
    split AS (
      SELECT doc_id, source,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 15))::BIGINT % 1000 < 900
                  THEN 'train' ELSE 'heldout' END AS split
      FROM deduped)
    SELECT source, split, count(*)::BIGINT AS n_docs
    FROM split GROUP BY source, split
    """,
    tags=("pipeline", "e2e"),
)
def prep_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end prep pipeline COMPOSITION — the operators chained the way a
    real corpus build chains them, in one lazy plan (quality gate → exact
    dedup keeping the smallest doc_id → deterministic 90/10 split →
    per-(source, split) accounting). Each stage is the already-verified
    operator (pipeline/text.token_count, pipeline/dedup.exact_dedup,
    operators/utils.split_assign); the composition itself is what this
    query checks. Single scan + two shuffles (dedup groupBy, final agg) —
    the split is a pure projection."""
    from flink_1_6_0_spark.operators.utils import split_assign
    from flink_1_6_0_spark.pipeline.text import token_count

    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    gated = d.filter(token_count(F.trim(F.col("text"))) >= 30)
    # exact dedup, carrying the kept row's source: min_by over the content
    deduped = gated.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min_by("source", "doc_id").alias("source")
    )
    split = split_assign(deduped.select("doc_id", "source"), "doc_id", {"train": 900})
    split = split.withColumn("split", F.coalesce(F.col("split"), F.lit("heldout")))
    return split.groupBy("source", "split").agg(F.count("*").cast("long").alias("n_docs"))


@query(
    "text_vocab_coverage",
    oracle="""
    WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token FROM documents),
    tf AS (SELECT token FROM t WHERE length(token) > 0),
    c AS (SELECT token, count(*)::BIGINT AS n FROM tf GROUP BY token),
    tot AS (SELECT sum(n) AS tn FROM c),
    r AS (SELECT token, n,
            row_number() OVER (ORDER BY n DESC, token) AS rank,
            sum(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS cum
          FROM c)
    SELECT token, n, rank::BIGINT AS rank, round(cum * 1.0 / tn, 6) AS cum_frac
    FROM r, tot
    WHERE cum - n < 0.95 * tn
    """,
    tags=("pipeline", "text", "vocab"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary truncation: the smallest frequency-ranked token
    prefix covering 95% of all token occurrences — corpus collapses to
    (token, count) map-side; the global frequency ranking is the
    zip_with_index two-phase plan (range repartition + broadcast offsets),
    never a single-partition window over the vocabulary."""
    from flink_1_6_0_spark.pipeline.text import vocab_coverage

    return vocab_coverage(T(spark, sf_dir, "documents"), "text", coverage=0.95)


@query(
    "corpus_lang_rebalance",
    oracle="""
    WITH c AS (SELECT lang, count(*)::BIGINT AS n_lang FROM documents GROUP BY lang),
    tot AS (SELECT sum(n_lang) AS n_total, count(*) AS k FROM c),
    r AS (SELECT lang,
                 least(1000, floor(1000.0 * (1.0 / k) * n_total / n_lang))::INT AS rate_permille
          FROM c, tot)
    SELECT d.doc_id, d.lang, r.rate_permille
    FROM documents d JOIN r USING (lang)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'langmix'), 1, 15))::BIGINT % 1000
          < r.rate_permille
    """,
    tags=("pipeline", "utils", "sampling"),
)
def corpus_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing to a uniform share per language: keep-rate
    min(1, share·N/n_lang) per language (only ever downsamples the
    over-represented), md5-gated per doc so the surviving subset is
    identical on any engine or cluster. Language histogram is
    language-cardinality small → rates broadcast; corpus side is one scan +
    filter, zero corpus shuffle."""
    from flink_1_6_0_spark.pipeline.prep import rebalance_language_mix

    out = rebalance_language_mix(T(spark, sf_dir, "documents"), "doc_id", "lang")
    return out.select("doc_id", "lang", "rate_permille")


@query(
    "text_length_outliers",
    oracle="""
    WITH t AS (SELECT doc_id, source,
                      len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
               FROM documents),
    s AS (SELECT source, avg(n_tokens) AS mu, stddev_samp(n_tokens) AS sd
          FROM t GROUP BY source)
    SELECT doc_id, t.source, n_tokens, round((n_tokens - mu) / sd, 4) AS z
    FROM t JOIN s ON t.source = s.source
    WHERE abs(round((n_tokens - mu) / sd, 4)) > 1.6
    """,
    tags=("pipeline", "text", "quality"),
)
def text_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length z-score outliers (|z| > 1.6 on the rounded z;
    the synthetic corpus is near-uniform so |z| tops out below 2):
    group stats broadcast back — one scan + BroadcastHashJoin, no corpus
    shuffle; the screen that catches truncated/concatenated documents a
    global length cutoff misses."""
    from flink_1_6_0_spark.pipeline.text import length_outliers

    return length_outliers(T(spark, sf_dir, "documents"), "doc_id", "text", "source", 1.6)


@query(
    "text_bigram_logppl",
    oracle="""
    WITH tk AS (SELECT doc_id AS doc, string_split_regex(trim(lower(text)), '\\s+') AS tt
                FROM documents),
    bg AS (SELECT doc, tt[i] AS w1, tt[i] || ' ' || tt[i+1] AS s
           FROM tk, unnest(generate_series(1, len(tt) - 1)) AS g(i)
           WHERE len(tt) >= 2),
    c2 AS (SELECT s, count(*)::BIGINT AS c2 FROM bg GROUP BY s),
    c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT t)::BIGINT AS V
          FROM (SELECT unnest(tt) AS t FROM tk) WHERE length(t) > 0)
    SELECT bg.doc AS doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(-ln((c2.c2 + 1) / (c1.c1 + v.V))), 6) AS log_ppl
    FROM bg JOIN c2 USING (s) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY bg.doc
    """,
    tags=("pipeline", "text", "quality"),
)
def text_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM perplexity, add-one smoothed — the conditional upgrade of
    the unigram CCNet gate: P(w2|w1) = (c(bigram)+1)/(c(context)+V). Counts
    are corpus-wide integers (exact probabilities both engines); one bigram
    explode, two map-side-combined count tables, two equi-joins."""
    from flink_1_6_0_spark.pipeline.text import bigram_logppl

    out = bigram_logppl(T(spark, sf_dir, "documents"), "doc_id", "text")
    return out


@query(
    "corpus_datacard",
    oracle="""
    WITH t AS (SELECT lang, source,
                      len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
               FROM documents),
    tot AS (SELECT sum(n_tokens) AS all_tokens FROM t)
    SELECT lang, source,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           round(sum(n_tokens) / tot.all_tokens, 6) AS token_share,
           round(avg(n_tokens), 2) AS mean_tokens
    FROM t, tot
    GROUP BY lang, source, tot.all_tokens
    """,
    tags=("pipeline", "stats"),
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus data card: per (lang, source) doc/token counts, corpus
    token share and mean length — the governance report published with a
    training set. One map-side-combined groupBy; the corpus total rides a
    1x1 broadcast scalar."""
    from flink_1_6_0_spark.pipeline.text import token_count

    d = T(spark, sf_dir, "documents").select(
        "lang", "source", token_count("text").cast("long").alias("n_tokens")
    )
    tot = d.agg(F.sum("n_tokens").alias("all_tokens"))
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("mean_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "lang", "source", "n_docs", "total_tokens",
            F.round(F.col("total_tokens") / F.col("all_tokens"), 6).alias("token_share"),
            "mean_tokens",
        )
    )


def _bpe_oracle() -> str:
    from flink_1_6_0_spark.pipeline.text import duck_bpe_oracle

    return duck_bpe_oracle(num_merges=12)


@query(
    "text_bpe_train",
    oracle=_bpe_oracle(),
    tags=("pipeline", "text", "vocab"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: 12 merge rules learned from the
    corpus word dictionary (Sennrich '16 loop — weighted pair counts, argmax
    to the driver, greedy-left merge as a pure Column scan). Returns the
    merge table (rank, left, right, weighted_count) — deterministic
    (count desc, pair asc tie-break). HASH-CHECKED since r13: the loop is
    pure integer/string arithmetic, so the oracle unrolls all 12 rounds as
    CTEs (pipeline/text.duck_bpe_oracle — greedy-left merge as
    gaps-and-islands) with no float tolerance anywhere."""
    from flink_1_6_0_spark.pipeline.text import bpe_train

    merges = bpe_train(T(spark, sf_dir, "documents"), "text", num_merges=12)
    return spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank long, left string, right string, weighted_count long",
    )


@query(
    "corpus_temperature_mix",
    oracle="""
    WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
    t AS (SELECT sum(n) AS nn FROM c),
    w AS (SELECT lang, n, pow(n / (SELECT nn FROM t), 0.3) AS w FROM c),
    z AS (SELECT sum(w) AS zz FROM w),
    r AS (SELECT lang, n,
                 least(1000, floor(1000.0 * (w / (SELECT zz FROM z))
                                   * (SELECT nn FROM t) / n + 1e-6))::INT AS rate_permille
          FROM w)
    SELECT d.doc_id, d.lang, r.rate_permille
    FROM documents d JOIN r USING (lang)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'tempmix'), 1, 15))::BIGINT % 1000
          < r.rate_permille
    """,
    tags=("pipeline", "utils", "sampling"),
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5/XLM-R temperature sampling (α=0.3) over the skewed per-language
    mixture: shares flattened to p^α, over-represented languages (en, 44%
    of the corpus) md5-gate-down-sampled
    toward the smoothed mix — deterministic on any engine
    (pipeline/prep.temperature_sample)."""
    from flink_1_6_0_spark.pipeline.prep import temperature_sample

    out = temperature_sample(T(spark, sf_dir, "documents"), "doc_id", "lang", alpha=0.3)
    return out.select("doc_id", "lang", "rate_permille")



def _e2e_oracle() -> str:
    """Composed oracle for the end-to-end pretraining pipeline: each CTE is
    the (already individually hash-matched) oracle of one stage — quality
    scorer, exact keep-min dedup, temperature mix on the SURVIVING corpus,
    sequential packing — so the composition cannot drift from the stages."""
    tok = "len(string_split_regex(trim(text), '\\s+'))::BIGINT"
    run = (
        "coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return f"""
    WITH q AS ({_quality_sql()}),
    g AS (SELECT d.doc_id, d.lang, d.text, q.quality
          FROM documents d JOIN q USING (doc_id) WHERE q.quality >= 0.5),
    k AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(text)),
    s AS (SELECT g.* FROM g JOIN k USING (doc_id)),
    c AS (SELECT lang, count(*)::BIGINT AS n FROM s GROUP BY lang),
    t AS (SELECT sum(n) AS nn FROM c),
    w AS (SELECT lang, n, pow(n / (SELECT nn FROM t), 0.3) AS w FROM c),
    z AS (SELECT sum(w) AS zz FROM w),
    r AS (SELECT lang,
                 least(1000, floor(1000.0 * (w / (SELECT zz FROM z))
                                   * (SELECT nn FROM t) / n + 1e-6))::INT AS rate_permille
          FROM w),
    m AS (SELECT s.* FROM s JOIN r USING (lang)
          WHERE ('0x' || substr(md5(s.doc_id::VARCHAR || 'tempmix'), 1, 15))::BIGINT % 1000
                < r.rate_permille),
    p AS (SELECT doc_id, lang, quality, (doc_id % 8)::INT AS shard, {tok} AS n_tokens
          FROM m)
    SELECT doc_id, lang, quality, shard, n_tokens,
           {run}::BIGINT AS offset,
           ({run} // 256)::BIGINT AS bin
    FROM p
    """


@query(
    "corpus_e2e_pretrain",
    oracle=None,  # set right after definition — needs _quality_sql at import time
    tags=("pipeline", "quality", "dedup", "sampling", "utils"),
    bench=True,
)
def corpus_e2e_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END pretraining corpus pipeline in one composed DataFrame
    program — the showcase that the stage operators actually compose:
    quality gate (score >= 0.5, same scorer as text_quality) → exact dedup
    (keep min doc_id per md5 content key) → temperature mixture sampling
    (α=0.3 over the SURVIVING corpus's language histogram — stage order
    matters and the oracle replays it) → sequential 256-token packing over
    8 shards. Every gate is a deterministic md5 permille rule, so the whole
    pipeline is reproducible on any engine.

    r16 (guide §2.4 + §5): the dedup stage previously went
    exact_dedup-groupBy → join-back on doc_id, which both added a join
    Exchange and made Spark recompute the scan+scorer subtree per consumer;
    the keep-min-doc_id-per-content-key rule is now a window MIN over the
    md5 key — same surviving set, one shuffle, no join. The surviving
    corpus is then localCheckpoint-ed once: the temperature stage reads it
    twice (language histogram + the gated filter), which previously
    re-executed the whole scan+score+dedup chain per read (4 full scans of
    the corpus for one query). Plan diff: 16 Exchanges → 7, one scan of
    documents instead of four."""
    from pyspark.sql import Window

    from flink_1_6_0_spark.pipeline import text as tx

    docs = T(spark, sf_dir, "documents")
    scored = docs.withColumn("quality", F.round(tx.quality_score("text"), 6)).filter(
        F.col("quality") >= 0.5
    )
    wdup = Window.partitionBy(F.md5("text"))
    surv = (
        scored.withColumn("__kept", F.min("doc_id").over(wdup))
        .filter(F.col("doc_id") == F.col("__kept"))
        .drop("__kept")
        .localCheckpoint(eager=True)
    )
    mixed = prep.temperature_sample(surv, "doc_id", "lang", alpha=0.3)
    packed = prep.pack_sequences(
        mixed, "doc_id", "text", budget=256, num_shards=8,
        carry_cols=["lang", "quality"],  # ride the pack window — no join-back
    )
    return packed.select("doc_id", "lang", "quality", "shard", "n_tokens", "offset", "bin")


def _quality_sql() -> str:
    """The text_quality oracle's quality expression, shared so the weighted
    sampler's oracle can never drift from the scorer's. Reads _REGISTRY
    directly: get()/load_all() here would re-entrantly import ALL query
    modules while this one is half-initialized (review finding)."""
    import flink_1_6_0_spark.queries.pipeline  # noqa: F401 — registers text_quality
    from flink_1_6_0_spark.registry import _REGISTRY

    return _REGISTRY["text_quality"].oracle


def _qws_oracle() -> str:
    return f"""
    WITH q AS ({_quality_sql()})
    SELECT d.doc_id, q.quality, floor(q.quality * 1000)::INT AS rate_permille
    FROM documents d JOIN q USING (doc_id)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'qsample'), 1, 15))::BIGINT % 1000
          < floor(q.quality * 1000)::INT
    """


@query(
    "corpus_quality_weighted_sample",
    oracle=_qws_oracle(),
    tags=("pipeline", "quality", "sampling"),
)
def corpus_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted (soft) filtering — the FineWeb-Edu/DCLM-style
    alternative to a hard threshold: each document's keep-probability IS its
    quality score (rate_permille = ⌊quality·1000⌋), applied through the
    deterministic md5 gate so the sampled corpus is reproducible anywhere.
    One scan: the score and the gate are pure Column expressions."""
    from flink_1_6_0_spark.operators.utils import deterministic_sample
    from flink_1_6_0_spark.pipeline import text as tx

    d = T(spark, sf_dir, "documents").withColumn("quality", tx.quality_score("text"))
    d = d.withColumn("rate_permille", F.floor(F.col("quality") * 1000).cast("int"))
    out = deterministic_sample(d, F.col("doc_id"), F.col("rate_permille"), salt="qsample")
    return out.select("doc_id", "quality", "rate_permille")


@query(
    "corpus_diversity_report",
    oracle="""
    WITH toks AS (
        SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
        FROM documents),
    tok_stats AS (
        SELECT source, count(*) AS n_tokens, count(DISTINCT t) AS n_types
        FROM toks GROUP BY source),
    bgs AS (
        SELECT source, unnest(CASE WHEN len(tt) >= 2
                 THEN [tt[i] || ' ' || tt[i+1] FOR i IN range(1, len(tt))]
                 ELSE [] END) AS bg
        FROM (SELECT source, string_split_regex(trim(lower(text)), '\\s+') AS tt
              FROM documents)),
    bg_stats AS (
        SELECT source, count(*) AS n_bigrams, count(DISTINCT bg) AS n_distinct_bigrams
        FROM bgs GROUP BY source)
    SELECT t.source, t.n_tokens, t.n_types,
           round(t.n_types / t.n_tokens, 6) AS ttr,
           coalesce(b.n_bigrams, 0) AS n_bigrams,
           coalesce(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
           CASE WHEN coalesce(b.n_bigrams, 0) > 0
                THEN round(b.n_distinct_bigrams / b.n_bigrams, 6)
                ELSE 0.0 END AS bigram_ttr
    FROM tok_stats t LEFT JOIN bg_stats b USING (source)
    """,
    tags=("pipeline", "text", "quality"),
)
def corpus_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-diversity report: type-token ratio and distinct-
    bigram fraction — the data-card metric that flags template/boilerplate
    sources (low diversity) before training. Two explode+groupBy scans with
    map-side combine; SOURCE-cardinality output."""
    from flink_1_6_0_spark.pipeline import text as tx

    d = T(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tx.tokenize(F.lower(F.col("text")))).alias("t"))
    tok_stats = toks.groupBy("source").agg(
        F.count("*").alias("n_tokens"), F.countDistinct("t").alias("n_types")
    )
    bgs = d.select("source", F.explode(tx.bigrams(F.lower(F.col("text")))).alias("bg"))
    bg_stats = bgs.groupBy("source").agg(
        F.count("*").alias("n_bigrams"), F.countDistinct("bg").alias("n_distinct_bigrams")
    )
    # LEFT join + zero fill: a source of only sub-2-token documents has NO
    # bigram rows — an inner join would drop exactly the degenerate source
    # this report exists to flag (review finding)
    return tok_stats.join(bg_stats, "source", "left").select(
        "source", "n_tokens", "n_types",
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("n_distinct_bigrams", F.lit(0)).alias("n_distinct_bigrams"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.round(F.col("n_distinct_bigrams") / F.col("n_bigrams"), 6),
        ).otherwise(0.0).alias("bigram_ttr"),
    )


@query(
    "contamination_eval_report",
    oracle="""
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
    corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0),
    btoks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM bench),
    bsh AS (SELECT DISTINCT doc_id, tt[i] || ' ' || tt[i+1] || ' ' || tt[i+2] AS s
            FROM btoks, unnest(generate_series(1, len(tt) - 2)) AS g(i)),
    ctoks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM corp),
    csh AS (SELECT DISTINCT tt[i] || ' ' || tt[i+1] || ' ' || tt[i+2] AS s
            FROM ctoks, unnest(generate_series(1, len(tt) - 2)) AS g(i)),
    hits AS (
        SELECT b.doc_id,
               count(*) AS n_shingles,
               sum(CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
        FROM bsh b LEFT JOIN csh c USING (s)
        GROUP BY b.doc_id)
    SELECT d.doc_id,
           coalesce(h.n_shingles, 0) AS n_shingles,
           coalesce(h.n_hit, 0) AS n_hit,
           coalesce(round(h.n_hit::DOUBLE / h.n_shingles, 6), 0.0) AS overlap_frac,
           coalesce((h.n_hit::DOUBLE / h.n_shingles) >= 0.8, false) AS dirty
    FROM bench d LEFT JOIN hits h USING (doc_id)
    """,
    tags=("pipeline", "text", "dedup"),
)
def contamination_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-side contamination bookkeeping (GPT-3 appendix-C "dirty eval
    examples"): per benchmark doc, the fraction of its distinct 3-shingles
    found anywhere in the training corpus + a dirty flag at 0.8. The corpus
    is scanned once with the broadcast benchmark shingle set probed inside
    the scan; aggregation state is bounded by the benchmark size."""
    docs = T(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return prep.eval_contamination_report(corpus, bench, "doc_id", "text", k=3)


@query(
    "corpus_token_budget",
    oracle="""
    WITH stats AS (
        SELECT source, count(*) AS n_docs,
               sum(len(string_split_regex(trim(text), '\\s+')))::BIGINT AS n_tokens
        FROM documents GROUP BY source),
    z AS (SELECT sum(sqrt(n_tokens)) AS z FROM stats)
    SELECT source, n_docs, n_tokens,
           round(sqrt(n_tokens) / z.z, 6) AS sample_prob,
           round(1000000.0 * sqrt(n_tokens) / z.z, 3) AS planned_tokens,
           round(1000000.0 * sqrt(n_tokens) / z.z / n_tokens, 6) AS epochs
    FROM stats, z
    """,
    tags=("pipeline", "sampling"),
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix plan (GPT-3/mT5/DoReMi sampling-weights table): per-source
    token counts -> temperature-flattened sampling probabilities (alpha=0.5,
    IEEE-exact sqrt) -> planned tokens and effective epochs under a 1M-token
    budget. One per-source aggregate over a single corpus scan + a broadcast
    1-row normalizer."""
    return prep.token_budget_plan(
        T(spark, sf_dir, "documents"), "source", "text", budget=1_000_000, alpha=0.5
    )


@query(
    "corpus_version_diff",
    oracle="""
    WITH old AS (SELECT doc_id, md5(text) AS h, true AS in_old
                 FROM documents WHERE doc_id % 11 <> 0),
    new AS (SELECT doc_id,
                   md5(CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END) AS h,
                   true AS in_new
            FROM documents WHERE doc_id % 13 <> 0)
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.in_old IS NULL THEN 'added'
                WHEN new.in_new IS NULL THEN 'removed'
                WHEN old.h IS DISTINCT FROM new.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old FULL OUTER JOIN new USING (doc_id)
    """,
    tags=("pipeline", "utils"),
)
def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions (reproducibility audit):
    old = doc_id%11!=0 slice, new = doc_id%13!=0 slice with every 7th doc's
    text rewritten — per doc added/removed/changed/unchanged by md5 content
    key. Only (id, md5) rides the full-outer join shuffle, never text
    (prep.corpus_diff)."""
    docs = T(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 0)
    new = docs.filter(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.upper(F.col("text"))).otherwise(F.col("text")),
    )
    return prep.corpus_diff(old, new, "doc_id", "text")


# corpus_e2e_pretrain's oracle composes _quality_sql(), which is defined
# after the query's decorator runs — patch it in once the module is complete
def _patch_e2e_oracle() -> None:
    from flink_1_6_0_spark.registry import _REGISTRY

    _REGISTRY["corpus_e2e_pretrain"].oracle = _e2e_oracle()


_patch_e2e_oracle()
