"""End-to-end pretraining-corpus pipeline — the engine's training-data ops
composed into one DataFrame program (the registered, oracle-checked form is
queries/pipeline_prep.corpus_e2e_pretrain; this is the runnable tour).

Stages, every gate a deterministic md5 permille rule (reproducible on any
engine, cluster layout, or re-run):

  1. quality gate      — composite score (length/stopword/word-shape bands),
                         hard threshold at 0.5 (pipeline/text.quality_score)
  2. exact dedup       — keep the smallest doc_id per md5 content key
                         (pipeline/dedup.exact_dedup; one hash shuffle)
  3. temperature mix   — mT5/XLM-R α=0.3 sampling over the SURVIVING
                         corpus's language histogram (pipeline/prep.
                         temperature_sample; stage order matters)
  4. sequence packing  — concatenate-in-order per shard, split at a
                         256-token budget (pipeline/prep.pack_sequences;
                         per-doc attributes ride the pack window, no
                         join-back)

Run: python examples/pretrain_pipeline.py [sf_dir]   (default sf0.001)
"""

import sys

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from flink_1_6_0_spark.pipeline import dedup as dd
from flink_1_6_0_spark.pipeline import prep
from flink_1_6_0_spark.pipeline import text as tx
from flink_1_6_0_spark.session import get_spark


def pretrain_pipeline(docs, budget=256, num_shards=8, min_quality=0.5, alpha=0.3):
    scored = docs.withColumn("quality", F.round(tx.quality_score("text"), 6)).filter(
        F.col("quality") >= min_quality
    )
    keep = dd.exact_dedup(
        scored.withColumn("__h", F.md5("text")), ["__h"], "doc_id"
    ).select(F.col("kept_id").alias("doc_id"))
    surv = scored.join(keep, "doc_id")
    mixed = prep.temperature_sample(surv, "doc_id", "lang", alpha=alpha)
    return prep.pack_sequences(
        mixed, "doc_id", "text", budget=budget, num_shards=num_shards,
        carry_cols=["lang", "quality"],
    )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pretrain-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pretrain_pipeline(docs)
    n_docs = out.count()
    stats = out.agg(
        F.countDistinct("lang").alias("langs"),
        (F.countDistinct("shard", "bin")).alias("sequences"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]
    print(
        f"packed {n_docs} surviving docs / {docs.count()} input -> "
        f"{stats['sequences']} training sequences, {stats['tokens']} tokens, "
        f"{stats['langs']} languages"
    )
    out.orderBy("shard", "bin", "doc_id").show(12)
