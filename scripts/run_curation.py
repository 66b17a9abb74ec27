#!/usr/bin/env python
"""End-to-end curation CLI — the training-data side's `run_pipeline.py`
twin: documents table → quality gate → exact + MinHash-LSH near-dup →
cluster-canonical keep → split assignment, with the full audit trail.

Examples:
    # curate a documents table (doc_id, text[, url, lang])
    python scripts/run_curation.py --input /data/documents --output /data/cur

    # demo on the testdata documents table
    python scripts/run_curation.py --input /root/testdata/sf0.01/documents.parquet \\
        --output /tmp/cur --stats --pack 512

    # with a UT1-style domain blocklist (one host pattern per line)
    python scripts/run_curation.py --input /data/documents --output /data/cur \\
        --blocklist /data/ut1_hosts.txt

Outputs under --output:
    corpus/    surviving canonical documents + split labels
    verdicts/  one row per INPUT doc: gate reasons, exact-dup /
               near-dup verdicts, final kept flag (the "why did my
               page disappear" relation)
    stats/     per-source dataset-card statistics (--stats)
    packed/    sequence-packing layout at --pack tokens (--pack)
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents table path (parquet; needs doc_id + text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--near-dup-threshold", type=float, default=0.5)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-words", type=int, default=200_000)
    ap.add_argument("--splits", default="train=0.98,val=0.01,test=0.01",
                    help="name=frac[,name=frac...]")
    ap.add_argument("--blocklist",
                    help="UT1-style host-pattern file (one entry per line); "
                         "requires a url column in the input")
    ap.add_argument("--stats", action="store_true",
                    help="also write per-source dataset-card statistics")
    ap.add_argument("--pack", type=int, metavar="TOKENS",
                    help="also write the sequence-packing layout of the kept "
                         "corpus at this context length")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdf_context_extractor_agent_spark.plans import curate
    from pdf_context_extractor_agent_spark.session import get_spark

    spark = get_spark(app_name="curation", cores=args.cores)
    t0 = time.monotonic()

    docs = spark.read.parquet(args.input)
    splits = {}
    for part in args.splits.split(","):
        name, frac = part.split("=")
        splits[name.strip()] = float(frac)

    blocklist = None
    url_col = "url"
    if args.blocklist:
        if "url" not in docs.columns:
            ap.error("--blocklist needs a url column in the input table")
        with open(args.blocklist) as fh:
            entries = [(ln.strip(),) for ln in fh if ln.strip()]
        blocklist = spark.createDataFrame(entries, "entry string")

    res = curate(
        docs,
        gates={"min_words": args.min_words, "max_words": args.max_words},
        splits=splits,
        near_dup_threshold=args.near_dup_threshold,
        blocklist=blocklist,
        url_col=url_col,
    )
    # four actions read corpus (write, stats, pack, count) and two read
    # verdicts — persist both or the shingle/LSH/cluster DAG recomputes
    # per action
    res["corpus"] = res["corpus"].persist()
    res["verdicts"] = res["verdicts"].persist()
    out = args.output.rstrip("/")
    res["corpus"].write.mode("overwrite").parquet(f"{out}/corpus")
    res["verdicts"].write.mode("overwrite").parquet(f"{out}/verdicts")

    if args.stats:
        from pdf_context_extractor_agent_spark.functions.quality import corpus_stats

        src = res["corpus"]
        if "source" not in src.columns:
            # dataset-card stats group by source; default to the language
            # column when the table carries no explicit source label
            src = src.withColumn(
                "source",
                F.coalesce(F.col("lang") if "lang" in src.columns else F.lit(None),
                           F.lit("corpus")),
            )
        if "lang" not in src.columns:
            # corpus_stats reads lang for the language-spread statistic;
            # the documented minimum input is (doc_id, text)
            src = src.withColumn("lang", F.lit(None).cast("string"))
        corpus_stats(src).write.mode("overwrite").parquet(f"{out}/stats")

    if args.pack:
        from pdf_context_extractor_agent_spark.functions.sampling import pack_sequences

        pack_sequences(
            res["corpus"].filter(F.col("split") == "train"), args.pack
        ).write.mode("overwrite").parquet(f"{out}/packed")

    n_in = docs.count()
    n_kept = res["corpus"].count()
    # one count per DROPPED DOC (primary reason = first gate reason),
    # so the printed counts sum to exactly the number of dropped docs
    dropped = (
        res["verdicts"].filter(~F.col("kept"))
        .select(
            F.coalesce(
                F.try_element_at("gate_reasons", F.lit(1)),
                F.when(F.col("exact_dup"), F.lit("exact_dup")),
                F.lit("near_dup_shadowed"),
            ).alias("reason")
        )
        .groupBy("reason").count().orderBy(F.desc("count")).collect()
    )
    reasons = ", ".join(f"{r['reason']}={r['count']}" for r in dropped) or "none"
    print(f"curated: {n_in} docs -> {n_kept} kept "
          f"({100.0 * n_kept / max(n_in, 1):.1f}%) in "
          f"{time.monotonic() - t0:.1f}s; drops: {reasons} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
