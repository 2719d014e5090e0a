"""Training-data prep operator tests (pipeline/prep.py): PII redaction,
benchmark contamination, sequence packing."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_6_0_spark.pipeline import prep


def test_pii_redact_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.1 port"),
            (3, "acct 12345678 and card 123456789012"),
            (4, "short 123456 stays"),  # < 7 digits: untouched
            (5, "mixed a@b.io 10.0.0.7 99999999"),
        ],
        "id long, t string",
    )
    n_email, n_ip, n_num = prep.pii_counts(F.col("t"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            prep.pii_redact("t").alias("red"),
            n_email.alias("ne"),
            n_ip.alias("ni"),
            n_num.alias("nn"),
        ).collect()
    }
    assert rows[1]["red"] == "mail <EMAIL> now" and rows[1]["ne"] == 1
    assert rows[2]["red"] == "server at <IP> port" and rows[2]["ni"] == 1
    assert rows[3]["red"] == "acct <NUM> and card <NUM>" and rows[3]["nn"] == 2
    assert rows[4]["red"] == "short 123456 stays" and rows[4]["nn"] == 0
    assert rows[5]["red"] == "mixed <EMAIL> <IP> <NUM>"
    # the IP's digits must not leak into the digit-run count
    assert (rows[5]["ne"], rows[5]["ni"], rows[5]["nn"]) == (1, 1, 1)


def test_contamination_hits_and_broadcast_plan(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "x alpha beta gamma y"),      # 1 shared shingle
            (2, "alpha beta gamma delta z"),  # 2 shared shingles
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = prep.contaminated_docs(corpus, bench, "doc_id", "text", k=3)
    got = {r["doc_id"]: r["n_contaminated"] for r in out.collect()}
    assert got == {1: 1, 2: 2}  # doc 3 absent: no hits
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "simple")
    assert "BroadcastHashJoin" in plan  # benchmark side ships, corpus never shuffles for the join


def test_pack_sequences_bins(spark):
    # one shard (num_shards=1): docs of 100 tokens each, budget 256 ->
    # offsets 0,100,200,300,...; bins 0,0,0,1,...
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 100)) for i in range(6)], "doc_id long, text string"
    )
    out = prep.pack_sequences(docs, "doc_id", "text", budget=256, num_shards=1)
    rows = sorted((r["doc_id"], r["offset"], r["bin"]) for r in out.collect())
    assert rows == [(0, 0, 0), (1, 100, 0), (2, 200, 0), (3, 300, 1), (4, 400, 1), (5, 500, 1)]


def test_pack_sequences_shard_isolation(spark):
    # shards pack independently: same doc stream split over 2 shards
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(4)], "doc_id long, text string"
    )
    out = prep.pack_sequences(docs, "doc_id", "text", budget=15, num_shards=2)
    rows = {r["doc_id"]: (r["shard"], r["offset"], r["bin"]) for r in out.collect()}
    # shard 0: docs 0,2 -> offsets 0,10; shard 1: docs 1,3 -> offsets 0,10
    assert rows == {0: (0, 0, 0), 2: (0, 10, 0), 1: (1, 0, 0), 3: (1, 10, 0)}


def test_pack_sequences_ffd_matches_reference_and_beats_sequential(spark):
    """Per-shard FFD must replay the exact driver-side first-fit-decreasing
    placement (n_tokens DESC, id ASC; first fitting bin; oversize docs open
    their own bin) and must never use MORE bins than sequential packing on
    the same data."""
    import random

    rng = random.Random(11)
    rows = [(i, " ".join(["w"] * rng.randint(1, 100))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prep.pack_sequences_ffd(docs, "doc_id", "text", budget=100, num_shards=3)
    got = {r["doc_id"]: (r["shard"], r["n_tokens"], r["bin"]) for r in out.collect()}

    toks = {i: len(t.split()) for i, t in rows}
    expect = {}
    n_bins_ffd = 0
    for s in range(3):
        items = sorted(((i, toks[i]) for i in toks if i % 3 == s), key=lambda x: (-x[1], x[0]))
        caps: list[int] = []
        for i, tok in items:
            for j, c in enumerate(caps):
                if c >= tok:
                    caps[j] = c - tok
                    expect[i] = (s, tok, j)
                    break
            else:
                expect[i] = (s, tok, len(caps))
                caps.append(100 - tok)
        n_bins_ffd += len(caps)
    assert got == expect
    # bin contents never exceed the budget (oversize docs excluded by data)
    fill: dict[tuple, int] = {}
    for s, tok, b in got.values():
        fill[(s, b)] = fill.get((s, b), 0) + tok
    assert all(v <= 100 for v in fill.values())
    # FFD's raison d'etre: among NON-SPLITTING packers it beats (or ties)
    # arrival-order next-fit. (pack_sequences is NOT comparable — it splits
    # docs across boundaries, so it always hits the ceil(total/budget)
    # lower bound by construction.)
    n_bins_nextfit = 0
    for s in range(3):
        cap = 0
        for i in sorted(i for i in toks if i % 3 == s):
            if toks[i] > cap:
                n_bins_nextfit += 1
                cap = 100
            cap -= toks[i]
    assert n_bins_ffd <= n_bins_nextfit


def test_pack_sequences_ffd_oversize_doc_isolated(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["w"] * 50)), (1, " ".join(["w"] * 120)), (2, " ".join(["w"] * 40))],
        "doc_id long, text string",
    )
    out = prep.pack_sequences_ffd(docs, "doc_id", "text", budget=100, num_shards=1)
    got = {r["doc_id"]: r["bin"] for r in out.collect()}
    # 120 > budget opens bin 0 (largest first) and stays alone; 50+40 share bin 1
    assert got == {1: 0, 0: 1, 2: 1}


def test_embedding_normalize_drops_degenerate(spark):
    from flink_1_6_0_spark.pipeline.similarity import normalize_embeddings

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [0.0, 1e-9])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in normalize_embeddings(df, "vec_id", "embedding").collect()}
    assert set(out) == {1}  # zero and near-zero vectors dropped
    assert out[1]["norm"] == 5.0 and out[1]["unit"] == [0.6, 0.8]


def test_c4_line_filter_rules(spark):
    """C4 cleaning: terminal-punctuation + min-words line keep, boilerplate
    page drop, min surviving-lines page drop."""
    from flink_1_6_0_spark.pipeline.text import c4_line_filter

    rows = [
        # doc 1: 3 good lines + 1 bad (no punct) + 1 bad (short) -> kept
        (1, "one two three four five.\nsix seven eight nine ten!\n"
            'eleven twelve thirteen fourteen fifteen?\nno terminal punct here\nshort line.'),
        # doc 2: only 2 good lines -> dropped (min_lines=3)
        (2, "one two three four five.\nsix seven eight nine ten."),
        # doc 3: boilerplate marker -> dropped even with 3 good lines
        (3, "one two three four five.\nsix seven eight nine ten.\n"
            "eleven twelve thirteen fourteen fifteen.\nlorem ipsum dolor."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["cleaned"], r["n_lines_kept"])
           for r in c4_line_filter(df, "doc_id", "text").collect()}
    assert set(out) == {1}
    cleaned, n = out[1]
    assert n == 3 and cleaned.count("\n") == 2 and "no terminal" not in cleaned


def test_unigram_logppl_exact(spark):
    """Perplexity scoring: hand-checked unigram probabilities."""
    import math

    from flink_1_6_0_spark.pipeline.text import unigram_logppl

    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([(1, "a a a"), (2, "b")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["log_ppl"]) for r in unigram_logppl(df, "doc_id", "text").collect()}
    assert got[1][0] == 3 and abs(got[1][1] - (-math.log(0.75))) < 1e-12
    assert got[2][0] == 1 and abs(got[2][1] - (-math.log(0.25))) < 1e-12


def test_chunk_overlap_invariants(spark):
    """chunk_overlap invariants: full coverage (concatenating each chunk's
    first `step` tokens reconstructs the doc), exact overlap between
    consecutive chunks, ragged tail <= size, chunk_ids dense from 0."""
    from flink_1_6_0_spark.pipeline.text import chunk_overlap

    size, overlap = 6, 2
    step = size - overlap
    docs = [
        (1, " ".join(f"t{i}" for i in range(17))),  # ragged tail
        (2, " ".join(f"u{i}" for i in range(4))),   # shorter than size
        (3, "x"),                                    # single token
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_overlap(df, "doc_id", "text", size=size, overlap=overlap)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["chunk"].split(" "), r["n_tokens"]) for r in out.collect())
    )
    by_doc: dict[int, list] = {}
    for d, cid, toks, n in rows:
        assert len(toks) == n <= size
        by_doc.setdefault(d, []).append((cid, toks))
    for d, text in docs:
        orig = text.split(" ")
        chunks = by_doc[d]
        assert [cid for cid, _ in chunks] == list(range(len(chunks)))  # dense ids
        # reconstruction: first `step` tokens of each chunk + full tail chunk
        recon = []
        for cid, toks in chunks[:-1]:
            recon.extend(toks[:step])
        recon.extend(chunks[-1][1])
        assert recon == orig, d
        # exact overlap between consecutive chunks
        for (c1, t1), (c2, t2) in zip(chunks, chunks[1:]):
            assert t1[step:] == t2[: len(t1) - step]


def test_contamination_bloom_matches_exact_and_prunes(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "x alpha beta gamma y"),
            (2, "alpha beta gamma delta z"),
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    exact = {
        r["doc_id"]: r["n_contaminated"]
        for r in prep.contaminated_docs(corpus, bench, "doc_id", "text", k=3).collect()
    }
    bloom = {
        r["doc_id"]: r["n_contaminated"]
        for r in prep.contamination_bloom(corpus, bench, "doc_id", "text", k=3, m=512).collect()
    }
    assert bloom == exact == {1: 1, 2: 2}
    # the exact verify is still a broadcast join (bloom false positives removed)
    out = prep.contamination_bloom(corpus, bench, "doc_id", "text", k=3, m=512)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "simple")
    assert "BroadcastHashJoin" in plan


def test_duplicate_span_stats_cross_doc_only(spark):
    from flink_1_6_0_spark.pipeline.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),            # shares a 2-shingle run with doc 2
            (2, "z z a b c d e f q q"),
            (3, "totally unique words only here today"),
            (4, "p q r s t p q r s t"),        # WITHIN-doc repetition only: excluded
        ],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r for r in duplicate_span_stats(df, "doc_id", "text", k=5).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_dup_shingles"] == 2 and rows[1]["n_shingles"] == 4
    assert rows[1]["max_dup_span_tokens"] == 6  # run of 2 five-grams = 6 tokens
    assert rows[2]["n_dup_shingles"] == 2 and rows[2]["n_shingles"] == 6
    assert rows[2]["max_dup_span_tokens"] == 6
    assert abs(rows[2]["dup_frac"] - 2 / 6) < 1e-6


def test_vocab_coverage_two_phase_matches_naive(spark):
    """The distributed two-phase ranking must equal the naive global window
    (rank, cum_frac and the coverage cut) on a corpus with heavy ties."""
    from collections import Counter

    from flink_1_6_0_spark.pipeline.text import vocab_coverage

    docs = [
        (1, "the the the cat sat on the mat"),
        (2, "a cat and a dog and a bird"),
        (3, "the dog sat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["token"]: (r["n"], r["rank"], r["cum_frac"]) for r in
           vocab_coverage(df, "text", coverage=0.8).collect()}

    counts = Counter(t for _, txt in docs for t in txt.lower().split())
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, want = 0, {}
    for rank, (tok, n) in enumerate(ranked, 1):
        if cum < 0.8 * total:  # cum - n < cov*total with cum already advanced
            want[tok] = (n, rank, round((cum + n) / total, 6))
        cum += n
    assert got == want


def test_rebalance_language_mix_downsamples_only(spark):
    from flink_1_6_0_spark.pipeline.prep import rebalance_language_mix

    rows = [(i, "en" if i < 80 else ("de" if i < 90 else "fr")) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_language_mix(df, "doc_id", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # under-represented langs keep everything (rate clamps at 1000)
    assert len(by_lang["de"]) == 10 and by_lang["de"][0]["rate_permille"] == 1000
    assert len(by_lang["fr"]) == 10 and by_lang["fr"][0]["rate_permille"] == 1000
    # the over-represented language is gated at ~ share*N/n_lang = 416 permille
    assert by_lang["en"][0]["rate_permille"] == 416
    assert 0 < len(by_lang["en"]) < 80
    # explicit targets must validate
    import pytest

    with pytest.raises(ValueError):
        rebalance_language_mix(df, "doc_id", "lang", targets={"en": 0.9, "de": 0.5})


def test_length_outliers_group_wise(spark):
    from flink_1_6_0_spark.pipeline.text import length_outliers

    rows = [(i, "a", "w " * 10) for i in range(10)] + [(99, "a", "w " * 200)]
    rows += [(i, "b", "w " * 200) for i in range(100, 110)]  # long is NORMAL in group b
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = length_outliers(df, "doc_id", "text", "source", z_thresh=2.0).collect()
    assert [r["doc_id"] for r in out] == [99]  # only the within-group anomaly
    assert out[0]["z"] > 2.0


def test_duplicate_span_stats_matches_python_spec(spark):
    """Seeded random corpora vs a pure-Python specification of the span
    statistics (small vocab forces rich cross-doc duplication and runs)."""
    import random
    from collections import defaultdict

    from flink_1_6_0_spark.pipeline.dedup import duplicate_span_stats

    rnd = random.Random(13)
    vocab = list("abcdefgh")
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 20))))
        for i in range(30)
    ]
    k = 3
    sh_docs = defaultdict(set)
    positions = {}
    for d, txt in docs:
        toks = txt.split()
        ps = [(i + 1, " ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
        positions[d] = ps
        for _, s in ps:
            sh_docs[s].add(d)
    want = {}
    for d, _ in docs:
        dup_pos = sorted(p for p, s in positions[d] if len(sh_docs[s]) >= 2)
        if not dup_pos:
            continue
        runs, cur = [], 1
        for a, b in zip(dup_pos, dup_pos[1:]):
            cur = cur + 1 if b == a + 1 else (runs.append(cur), 1)[1]
        runs.append(cur)
        n_sh = len(positions[d])
        want[d] = (len(dup_pos), n_sh, round(len(dup_pos) / n_sh, 6), max(runs) + k - 1)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_dup_shingles"], r["n_shingles"], r["dup_frac"], r["max_dup_span_tokens"])
        for r in duplicate_span_stats(df, "doc_id", "text", k=k).collect()
    }
    assert got == want


def test_bigram_logppl_matches_python_reference(spark):
    import math
    from collections import Counter

    from flink_1_6_0_spark.pipeline.text import bigram_logppl

    docs = [(1, "a b a b c"), (2, "b c a b"), (3, "c c c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["log_ppl"]) for r in
           bigram_logppl(df, "doc_id", "text").collect()}

    all_bg, all_w1 = Counter(), Counter()
    toks = {d: t.split() for d, t in docs}
    for d, tt in toks.items():
        for a, b in zip(tt, tt[1:]):
            all_bg[(a, b)] += 1
            all_w1[a] += 1
    vocab = len({w for tt in toks.values() for w in tt})
    for d, tt in toks.items():
        ps = [
            -math.log((all_bg[(a, b)] + 1) / (all_w1[a] + vocab))
            for a, b in zip(tt, tt[1:])
        ]
        assert got[d][0] == len(ps)
        assert abs(got[d][1] - round(sum(ps) / len(ps), 6)) < 1e-6, d


def test_cut_duplicate_spans_semantics(spark):
    from flink_1_6_0_spark.pipeline.dedup import cut_duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "z z a b c d e f q q"),
            (3, "totally unique words only here today"),
            (4, "p q r s t p q r s t"),  # within-doc repetition: untouched
        ],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r for r in cut_duplicate_spans(df, "doc_id", "text", k=5).collect()}
    # doc1: dup shingles at pos 1-2 cover tokens 1..6 -> "g h" survives
    assert rows[1]["cleaned"] == "g h" and rows[1]["n_kept"] == 2 and rows[1]["n_removed"] == 6
    # doc2: dup at pos 3-4 cover tokens 3..8 -> "z z q q"
    assert rows[2]["cleaned"] == "z z q q" and rows[2]["n_removed"] == 6
    # untouched docs come back whole
    assert rows[3]["cleaned"] == "totally unique words only here today"
    assert rows[3]["n_removed"] == 0
    assert rows[4]["cleaned"] == "p q r s t p q r s t"


def test_cut_duplicate_spans_matches_python_spec(spark):
    """Seeded random corpora: the cut operator vs a pure-Python spec of
    coverage removal (same shingle definition, same reassembly)."""
    import random
    from collections import defaultdict

    from flink_1_6_0_spark.pipeline.dedup import cut_duplicate_spans

    rnd = random.Random(29)
    vocab = list("abcdef")
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 15))))
        for i in range(25)
    ]
    k = 3
    sh_docs = defaultdict(set)
    toks = {d: t.split() for d, t in docs}
    for d, tt in toks.items():
        for i in range(len(tt) - k + 1):
            sh_docs[" ".join(tt[i : i + k])].add(d)
    want = {}
    for d, tt in toks.items():
        covered = set()
        for i in range(len(tt) - k + 1):
            if len(sh_docs[" ".join(tt[i : i + k])]) >= 2:
                covered.update(range(i, i + k))
        kept = [t for j, t in enumerate(tt) if j not in covered]
        if kept:
            want[d] = (" ".join(kept), len(kept), len(tt) - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc"]: (r["cleaned"], r["n_kept"], r["n_removed"])
        for r in cut_duplicate_spans(df, "doc_id", "text", k=k).collect()
    }
    assert got == want


def test_percentile_approx_tracks_exact_quantiles(spark, sf_dir, duck):
    """The documented 100 TB swap for doc_length_quantiles (percentile ->
    percentile_approx t-digest sketch) must stay within sketch tolerance of
    the exact interpolated quantiles on real data."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.pipeline.text import token_count
    from flink_1_6_0_spark.queries import T

    d = T(spark, sf_dir, "documents").select(
        "source", token_count("text").cast("long").alias("n")
    )
    approx = {
        r["source"]: (r["p50"], r["p90"])
        for r in d.groupBy("source")
        .agg(
            F.percentile_approx("n", 0.5, 10000).alias("p50"),
            F.percentile_approx("n", 0.9, 10000).alias("p90"),
        )
        .collect()
    }
    exact = {
        r["source"]: (r["p50"], r["p90"])
        for r in d.groupBy("source")
        .agg(
            F.expr("percentile(n, 0.5)").alias("p50"),
            F.expr("percentile(n, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for src, (a50, a90) in approx.items():
        e50, e90 = exact[src]
        # percentile_approx returns an observed value; exact interpolates —
        # allow one observation of slack
        assert abs(a50 - e50) <= max(2.0, 0.05 * e50), src
        assert abs(a90 - e90) <= max(2.0, 0.05 * e90), src


def test_rebalance_explicit_targets_drop_unlisted(spark):
    """Languages absent from an explicit targets map must be DROPPED —
    regression for F.least(1000, NULL) = 1000 silently keeping them all."""
    from flink_1_6_0_spark.pipeline.prep import rebalance_language_mix

    rows = [(i, "en" if i < 40 else "de") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_language_mix(df, "doc_id", "lang", targets={"en": 0.5}).collect()
    assert {r["lang"] for r in out} == {"en"}


def test_chunk_overlap_skips_empty_docs(spark):
    from flink_1_6_0_spark.pipeline.text import chunk_overlap

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    rows = chunk_overlap(df, "doc_id", "text", size=4, overlap=1).collect()
    assert {r["doc_id"] for r in rows} == {1}  # no phantom ('', 1) chunks


def test_bpe_train_and_segment_match_python_reference(spark):
    """Distributed BPE vs the classic in-memory algorithm (Sennrich '16):
    identical merge rules in identical order, identical segmentation."""
    from collections import Counter

    from flink_1_6_0_spark.pipeline.text import bpe_segment, bpe_train

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest widest widest",
        "low lower newest",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = bpe_train(df, "text", num_merges=8)

    # reference implementation on the word dictionary
    vocab = Counter(w for t in texts for w in t.lower().split())
    symbols = {w: list(w) + ["</w>"] for w in vocab}
    want = []
    for _ in range(8):
        pairs = Counter()
        for w, freq in vocab.items():
            s = symbols[w]
            for x, y in zip(s, s[1:]):
                pairs[(x, y)] += freq
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        want.append((a, b, n))
        for w, s in symbols.items():  # greedy-left merge
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symbols[w] = out
    assert got == want

    # apply side: segmentation equals the reference symbol tables
    seg = {r["doc_id"]: r["sub"] for r in
           df.select("doc_id", bpe_segment("text", got).alias("sub")).collect()}
    for d, t in enumerate(texts):
        expect = [s for w in t.lower().split() for s in symbols[w]]
        assert seg[d] == expect, d


def test_dedup_scorecard_counts_only_true_duplicate_groups(spark):
    """A corpus with no exact duplicates must report zero exact groups
    (singleton (lang, source) cells are layout, not duplication)."""
    from flink_1_6_0_spark.pipeline.dedup import exact_dedup
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "en", "a"), (2, "de", "b"), (3, "fr", "c"), (4, "en", "b")],
        "doc_id long, lang string, source string",
    )
    agg = exact_dedup(df, ["lang", "source"], "doc_id").agg(
        F.count_if(F.col("n_copies") > 1).alias("n_groups")
    )
    assert agg.first()["n_groups"] == 0


def test_incremental_dedup_flags(spark):
    from flink_1_6_0_spark.pipeline.dedup import incremental_dedup

    base = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different text about other things entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),  # exact copy of corpus doc 1
            (11, base.rsplit(" ", 1)[0] + " changed"),  # tail-edit near dup
            (12, "fresh unrelated content never seen before in any corpus document"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc: (r.exact_dup, r.near_dup) for r in incremental_dedup(new, corpus, "doc_id", "text").collect()}
    assert out == {10: (True, True), 11: (False, True), 12: (False, False)}


def test_temperature_sample_limits(spark):
    from flink_1_6_0_spark.pipeline.prep import temperature_sample

    rows = [(i, "big") for i in range(90)] + [(i + 100, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    # α=1 keeps the natural mix: every keep-rate is 1000‰ (no-op filter)
    r1 = temperature_sample(df, "doc_id", "g", alpha=1.0)
    assert {x.rate_permille for x in r1.select("rate_permille").distinct().collect()} == {1000}
    assert r1.count() == 100
    # α=0 is the uniform-share limit: big capped at share·N/n = 0.5·100/90,
    # small at min(1, 5.0) → rates (555, 1000)
    r0 = temperature_sample(df, "doc_id", "g", alpha=0.0)
    rates = {x.g: x.rate_permille for x in r0.select("g", "rate_permille").distinct().collect()}
    assert rates == {"big": 555, "small": 1000}
    # 0<α<1 lands between: big's rate strictly inside (555, 1000)
    rm = temperature_sample(df, "doc_id", "g", alpha=0.5)
    mid = {x.g: x.rate_permille for x in rm.select("g", "rate_permille").distinct().collect()}
    assert 555 < mid["big"] < 1000 and mid["small"] == 1000


def test_temperature_sample_alpha1_is_exact_noop_for_awkward_counts(spark):
    # counts whose p^1 shares sum to just over 1.0 in float used to floor
    # rate 999 instead of 1000 (review finding); the epsilon guard fixes it
    from flink_1_6_0_spark.pipeline.prep import temperature_sample

    rows = [(i, g) for g, n in zip("abcde", [808, 215, 97, 500, 30]) for i in range(n)]
    rows = [(j, g) for j, (i, g) in enumerate(rows)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    r = temperature_sample(df, "doc_id", "g", alpha=1.0)
    assert {x.rate_permille for x in r.select("rate_permille").distinct().collect()} == {1000}
    assert r.count() == 1650


def test_cross_corpus_pairs_consistent_with_incremental_flags(spark):
    # every near_dup=True doc from incremental_dedup appears as a left id in
    # the pair view, and vice versa — the two outputs are one substrate
    from flink_1_6_0_spark.pipeline.dedup import cross_corpus_lsh_pairs, incremental_dedup

    base = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(1, base), (2, "entirely different words about other topics")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base), (11, "fresh text never seen before in anything")],
        "doc_id long, text string",
    )
    flagged = {
        r.doc for r in incremental_dedup(new, corpus, "doc_id", "text").collect() if r.near_dup
    }
    paired = {r.a for r in cross_corpus_lsh_pairs(new, corpus, "doc_id", "text").collect()}
    assert flagged == paired == {10}


def test_approx_count_distinct_within_hll_tolerance(spark, sf_dir):
    """The 100 TB swap for exact countDistinct in the diversity report is
    approx_count_distinct (HyperLogLog++); its relative error at rsd=0.01
    must hold on real token data."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.pipeline.text import tokenize
    from flink_1_6_0_spark.queries import T

    toks = T(spark, sf_dir, "documents").select(
        F.explode(tokenize(F.lower(F.col("text")))).alias("t")
    )
    row = toks.agg(
        F.countDistinct("t").alias("exact"),
        F.approx_count_distinct("t", 0.01).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_dup_shingle_kernel_small_data_path_equivalent(spark, sf_dir):
    """The skew-safe default (persist + groupBy(h) + semi-join) and the
    small-data window form must agree row-for-row — the r5 kernel swap
    (round-4 verdict #2) is a plan change, not a semantics change."""
    from flink_1_6_0_spark.pipeline.dedup import _dup_shingle_positions
    from flink_1_6_0_spark.queries import T

    d = T(spark, sf_dir, "documents")
    default = _dup_shingle_positions(d, "doc_id", "text", 8).collect()
    window = _dup_shingle_positions(d, "doc_id", "text", 8, small_data=True).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, window))
    assert len(default) > 0


def test_token_budget_plan_math(spark):
    """sqrt-temperature mix plan: probabilities sum to 1, epochs =
    budget*prob/tokens, and the flattening LIFTS the small source's share
    above its proportional share."""
    import math

    df = spark.createDataFrame(
        [("big", "a b c d e f g h"), ("big", "a b c d e f g h"), ("small", "a b")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in prep.token_budget_plan(df, "source", "text", budget=100).collect()}
    assert rows["big"]["n_tokens"] == 16 and rows["small"]["n_tokens"] == 2
    z = math.sqrt(16) + math.sqrt(2)
    assert abs(rows["small"]["sample_prob"] - math.sqrt(2) / z) < 1e-6
    assert abs(sum(r["sample_prob"] for r in rows.values()) - 1.0) < 2e-6
    # epochs = planned/actual
    assert abs(rows["small"]["epochs"] - (100 * math.sqrt(2) / z) / 2) < 1e-3
    # temperature flattening: small source's share > its token share (2/18)
    assert rows["small"]["sample_prob"] > 2 / 18


def test_eval_contamination_report_directions_and_flag(spark):
    """Per-BENCH-doc overlap fraction: a fully-contained bench doc is dirty,
    a disjoint one is clean with frac 0."""
    corpus = spark.createDataFrame(
        [(10, "w x y z w x y z")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1, "w x y z"), (2, "p q r s t")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in prep.eval_contamination_report(corpus, bench, "doc_id", "text", k=3).collect()}
    assert rows[1]["n_shingles"] == 2 and rows[1]["n_hit"] == 2
    assert rows[1]["overlap_frac"] == 1.0 and rows[1]["dirty"] is True
    assert rows[2]["n_hit"] == 0 and rows[2]["dirty"] is False


def test_minhash_calibration_identical_docs(spark):
    """Identical documents must calibrate to est=exact=1.0 with zero error;
    the near-dup pair's exact Jaccard must be < 1 and the estimator within
    the 16-hash granularity of it."""
    from flink_1_6_0_spark.pipeline.dedup import minhash_calibration

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "the quick brown fox jumps over the lazy dog tomorrow maybe"),
        ],
        "doc_id long, text string",
    )
    rows = {(r["a"], r["b"]): r for r in minhash_calibration(df, "doc_id", "text").collect()}
    assert rows[(1, 2)]["est_jaccard"] == 1.0
    assert rows[(1, 2)]["exact_jaccard"] == 1.0
    assert rows[(1, 2)]["abs_err"] == 0.0
    for pair in ((1, 3), (2, 3)):
        if pair in rows:  # LSH may or may not surface the near-dup pair
            assert rows[pair]["exact_jaccard"] < 1.0
            assert rows[pair]["abs_err"] <= 1.0


def test_streaming_incremental_dedup_cross_epoch(spark, tmp_path):
    """Two-wave stream: wave 1 probes ONLY the seeded corpus; wave 2 must
    also see wave 1's appended keys/buckets — a wave-2 copy of a wave-1 doc
    flags exact_dup even though the seed corpus never contained it."""
    from flink_1_6_0_spark.pipeline.dedup import (
        seed_dedup_state,
        streaming_incremental_dedup,
    )
    from flink_1_6_0_spark.sources.stream import read_parquet_stream

    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    state = str(tmp_path / "state")
    seed_dedup_state(corpus, "doc_id", "text", state)

    src = str(tmp_path / "src")
    # wave 1: one copy of the corpus doc (exact dup) + one novel doc
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)

    flags: dict[int, dict] = {}

    def emit(df, epoch_id):
        flags.update({r["doc"]: {"exact": r["exact_dup"], "near": r["near_dup"]} for r in df.collect()})

    q = streaming_incremental_dedup(
        read_parquet_stream(spark, src), "doc_id", "text", state, emit, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        assert flags[1]["exact"] is True and flags[1]["near"] is True
        assert flags[2]["exact"] is False and flags[2]["near"] is False
        # wave 2: a copy of wave-1's NOVEL doc — dup only via appended state
        spark.createDataFrame(
            [(3, "one two three four five six seven")], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    assert flags[3]["exact"] is True and flags[3]["near"] is True


def test_corpus_diff_all_statuses(spark):
    """Every status class: removed (only-old), added (only-new), changed
    (content-key differs), unchanged (byte-identical)."""
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in prep.corpus_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_read_state_before_excludes_replayed_epoch(spark, tmp_path):
    """Retry semantics: a replayed epoch's own committed partition must be
    invisible to its probe (review finding) — only the seed (-1) and
    strictly-earlier epochs feed the read."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.pipeline.dedup import _read_state_before
    from flink_1_6_0_spark.streaming.nonwindow_join import _write_epoch

    path = str(tmp_path / "keys")
    for epoch, h in ((-1, "seed"), (0, "e0"), (1, "e1")):
        _write_epoch(spark.createDataFrame([(h,)], "`__h` string"), path, epoch)
    got = {r["__h"] for r in _read_state_before(spark, path, "`__h` string", 1).collect()}
    assert got == {"seed", "e0"}
    # missing path -> empty frame with the schema
    empty = _read_state_before(spark, str(tmp_path / "nope"), "`__h` string", 0)
    assert empty.count() == 0 and empty.columns == ["__h"]


def test_corpus_diff_null_text(spark):
    """md5(NULL) is NULL: presence must come from side markers, not hash
    nullness (review finding) — NULL-text docs classify by presence and
    null-safe comparison, not as phantom adds/removes."""
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "now"), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in prep.corpus_diff(old, new, "doc_id", "text").collect()}
    # 1: only-old (NULL text) -> removed; 2: NULL->text -> changed; 3: text->NULL -> changed
    assert got == {1: "removed", 2: "changed", 3: "changed"}
    both_null = prep.corpus_diff(
        spark.createDataFrame([(9, None)], "doc_id long, text string"),
        spark.createDataFrame([(9, None)], "doc_id long, text string"),
        "doc_id", "text",
    ).collect()
    assert both_null[0]["status"] == "unchanged"


def test_eval_contamination_report_keeps_short_docs(spark):
    """A sub-k-token eval doc has no shingles but must still appear in the
    report as clean (review finding)."""
    corpus = spark.createDataFrame([(10, "w x y z")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(1, "w x"), (2, "w x y z")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in prep.eval_contamination_report(corpus, bench, "doc_id", "text", k=3).collect()}
    assert rows[1]["n_shingles"] == 0 and rows[1]["n_hit"] == 0
    assert rows[1]["overlap_frac"] == 0.0 and rows[1]["dirty"] is False
    assert rows[2]["dirty"] is True


def test_minhash_calibration_bands_validation(spark):
    import pytest

    from flink_1_6_0_spark.pipeline.dedup import minhash_calibration

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_calibration(df, "doc_id", "text", bands=0)
    with pytest.raises(ValueError):
        minhash_calibration(df, "doc_id", "text", num_hashes=16, bands=5)


def test_punct_ratio_empty_string_null(spark):
    """Empty text -> NULL ratio, not an ANSI DIVIDE_BY_ZERO (review finding)."""
    from flink_1_6_0_spark.pipeline.text import punct_ratio

    df = spark.createDataFrame([("",), ("a.b",)], "t string")
    got = [r["r"] for r in df.select(punct_ratio("t").alias("r")).collect()]
    assert got[0] is None and abs(got[1] - 1 / 3) < 1e-9


def test_bpe_segment_blank_text_empty(spark):
    """Blank/whitespace docs segment to [] — no phantom ['', '</w>'] pair
    (review finding: split('') artifacts inflate token counts)."""
    from flink_1_6_0_spark.pipeline.text import bpe_segment

    df = spark.createDataFrame([("",), ("   ",), ("ab",)], "t string")
    got = [r["s"] for r in df.select(bpe_segment("t", []).alias("s")).collect()]
    assert got[0] == [] and got[1] == []
    assert got[2] == ["a", "b", "</w>"]


def test_ngram_jaccard_df_cap_kills_stopword_quadratic_pairs(spark):
    """Round-12 verdict task 2: a boilerplate shingle present in EVERY doc
    must not produce a quadratic pair set once df_cap is below the corpus
    size — and the capped Jaccard equals the exact Jaccard of the capped
    shingle sets (the hot shingle leaves numerator and denominator alike)."""
    from flink_1_6_0_spark.pipeline import dedup as dd

    boiler = "all rights reserved"
    rows = [(i, f"{boiler} unique{i} tail{i} end{i}") for i in range(20)]
    # two genuinely similar docs sharing real content beyond the boilerplate
    rows += [(100, f"{boiler} lorem ipsum dolor sit amet"),
             (101, f"{boiler} lorem ipsum dolor sit amet xyz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dd.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.01)
    capped = dd.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.01, df_cap=5)

    # uncapped: every pair shares the boilerplate 3-gram -> quadratic (231 pairs)
    assert uncapped.count() == 22 * 21 // 2
    got = {(r.a, r.b): r.jaccard for r in capped.collect()}
    # capped: only the lorem-ipsum pair survives; 'all rights reserved' (df=22)
    # is gone, so the unique{i} docs share nothing
    assert set(got) == {(100, 101)}
    # exact Jaccard of the capped sets: doc100 keeps 5 non-boiler shingles
    # ("rights reserved lorem" ... "dolor sit amet"), doc101 keeps 6,
    # common 5 -> 5 / (5 + 6 - 5) = 5/6
    assert abs(got[(100, 101)] - round(5 / 6, 6)) < 1e-6


def test_bpe_train_unicode_parity_with_duckdb_oracle(spark):
    """BPE trains identically on Spark and DuckDB for a corpus with ASTRAL
    characters (emoji — UTF-16 surrogate pairs on the JVM) and a VERTICAL
    TAB (inside Java's \\s but not RE2's): the r13 ADVICE divergence. The
    Spark side must split words on the explicit whitespace class and chars
    by CODEPOINT for the merge tables to agree."""
    import duckdb

    from flink_1_6_0_spark.pipeline.text import bpe_train, duck_bpe_oracle

    texts = [
        "a\U0001F600b a\U0001F600b a\U0001F600b x\x0By x\x0By",
        "\U0001F600\U0001F600 \U0001F600\U0001F600 ab ab ab",
        "low low lower\x0Blower",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = bpe_train(df, "text", num_merges=6)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    want = [
        (r[1], r[2], int(r[3]))
        for r in con.sql(duck_bpe_oracle(num_merges=6)).fetchall()
    ]
    assert [(a, b, n) for a, b, n in got] == want
    # non-vacuous: some learned symbol must contain the astral char whole
    assert any("\U0001F600" in a or "\U0001F600" in b for a, b, _ in got)
