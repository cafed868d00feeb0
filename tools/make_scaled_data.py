#!/usr/bin/env python
"""Build a deterministic K×-scaled copy of the sf0.1 fixtures under /tmp for
the OPT-IN scaling probe (round-15 verdict item #7: at sf0.1 every query is
task-dispatch-bound and the 8c/32c ratios measure overhead, not parallelism —
scaling evidence needs a bigger input).

NOT part of the graded bench or oracle surface: this synthesizes INPUT data
(never results) by unioning K key-shifted replicas of each sf0.1 table, so
every query computes from parquet exactly as at sf0.1, just on more rows.

Replica construction (replica i = 0..K-1; i=0 is the original):
* fact/dim keys shift by i × 1e9 (far above any sf0.1 key), so joins stay
  referentially consistent WITHIN a replica and replicas never collide;
* region/nation are fixed-domain dims (nationkey 0..24) and are not replicated;
* documents get a per-replica token suffix for i>0 (every shingle/word hash
  changes), so the corpus scales like K independent shards instead of K exact
  copies — replicating raw text would plant a fake everything-is-a-near-dup
  corpus and quadratic candidate volume no real 10× corpus has;
* embeddings get one deterministic per-replica component perturbation for the
  same reason (no fake exact-duplicate vectors).

Output is written with 32 files per table so the scans are splittable (a
production input is many files; the single-row-group sf fixtures are exactly
the degenerate shape spread_scan exists for).

Usage:  python tools/make_scaled_data.py [--k 4] [--out /tmp/scale_x4]
Then:   SPARK_GRAFT_CPUS=8  python tools/isolate.py --sf-dir /tmp/scale_x4 --runs 3 q ...
        SPARK_GRAFT_CPUS=32 python tools/isolate.py --sf-dir /tmp/scale_x4 --runs 3 q ...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from airflow_cms_inpatient_etl_spark.session import get_spark  # noqa: E402
from airflow_cms_inpatient_etl_spark.sources.registry import load_table  # noqa: E402

SHIFT = 1_000_000_000  # per-replica key offset, far above any sf0.1 key

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def replica(df, table: str, i: int):
    if i == 0:
        return df
    for c in KEY_COLS[table]:
        df = df.withColumn(c, (F.col(c) + F.lit(i * SHIFT)).cast(dict(df.dtypes)[c]))
    if table == "documents":
        tag = F.lit(f"_r{i}")
        df = df.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda w: F.concat(w, tag),
                ),
                " ",
            ),
        )
    if table == "embeddings":
        df = df.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda v, j: F.when(j == 0, v + F.lit(i * 0.37).cast("float")).otherwise(v),
            ),
        )
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/scale_x{args.k}"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make-scaled-data")
    spark.sparkContext.setLogLevel("ERROR")
    for table in COPY_ONLY:
        load_table(spark, args.src, table).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"{table}: copied", flush=True)
    for table in KEY_COLS:
        base = load_table(spark, args.src, table)
        union = replica(base, table, 0)
        for i in range(1, args.k):
            union = union.unionByName(replica(base, table, i))
        if table == "events":
            # events.ts is TIMESTAMP(NANOS) in the fixtures (read back as µs
            # by load_table); write plain µs — load_table normalizes either
            union = union.withColumn("ts", F.col("ts").cast("timestamp"))
        union.repartition(32).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        n = spark.read.parquet(f"{out}/{table}.parquet").count()
        print(f"{table}: {n} rows", flush=True)
    print(f"done: {out}", flush=True)


if __name__ == "__main__":
    main()
