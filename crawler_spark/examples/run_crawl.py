"""spark-submit entry point for the BSP crawl (north_rule: "runs via
spark-submit --py-files on clusters of N and 4N executors").

Usage (see scripts/submit_crawl.sh for the packaged invocation):

    spark-submit --master local[32] --py-files crawler_spark.zip \
        run_crawl.py --corpus-dir /path/to/corpus --checkpoint-dir /tmp/ckpt \
        --max-rounds 5 [--resume]

``--corpus-dir`` must hold parquet tables ``pages/ seeds/ robots/
politeness/`` (written by ``--make-corpus``, which generates the
deterministic synthetic Common-Crawl-style corpus from
crawler_spark.corpus.generator). On a real cluster the pages table is the
Iceberg Common-Crawl-style table and seeds/robots/politeness are operator
inputs; everything below is identical.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-dir", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--max-rounds", type=int, default=5)
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--default-budget", type=int, default=16)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--make-corpus", action="store_true", help="generate the synthetic corpus into --corpus-dir first")
    p.add_argument("--n-hosts", type=int, default=20)
    p.add_argument("--pages-per-host", type=int, default=30)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    spark = SparkSession.builder.appName("crawler-spark-run").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolved from --py-files zip on executors and driver alike
    from crawler_spark.scheduler import CrawlConfig, crawl

    if args.make_corpus:
        from crawler_spark.corpus.generator import make_corpus

        tables = make_corpus(seed=args.seed, n_hosts=args.n_hosts, pages_per_host=args.pages_per_host)
        for name, pdf in tables.items():
            spark.createDataFrame(pdf).write.mode("overwrite").parquet(os.path.join(args.corpus_dir, name))

    pages = spark.read.parquet(os.path.join(args.corpus_dir, "pages"))
    seeds = spark.read.parquet(os.path.join(args.corpus_dir, "seeds"))
    robots_path = os.path.join(args.corpus_dir, "robots")
    politeness_path = os.path.join(args.corpus_dir, "politeness")
    robots = spark.read.parquet(robots_path) if os.path.exists(robots_path) else None
    politeness = spark.read.parquet(politeness_path) if os.path.exists(politeness_path) else None

    cfg = CrawlConfig(
        checkpoint_dir=args.checkpoint_dir,
        max_rounds=args.max_rounds,
        n_buckets=args.n_buckets,
        default_budget=args.default_budget,
    )
    t0 = time.monotonic()
    res = crawl(spark, pages, seeds, robots, politeness, cfg, resume=args.resume)
    wall = time.monotonic() - t0
    n_sched = res.schedule.count()
    n_seen = res.seen.count()
    print(
        json.dumps(
            {
                "rounds": res.rounds,
                "urls_scheduled": n_sched,
                "urls_seen": n_seen,
                "wall_sec": round(wall, 3),
                "urls_scheduled_per_sec": round(n_sched / wall, 1) if wall > 0 else None,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
