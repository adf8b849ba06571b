"""Generate sf1-scale testdata by deterministic tiling of the driver's
sf0.1 tables (10x by default) — the next-decade scale point for the
bench sweep (SURVEY §5 pins cross-SF parity to sf0.1; this is the
"prove the 100x claim one notch up" evidence).

Tiling rules (all hash-deterministic, no RNG state):
- dims (region nation customer supplier part): copied unchanged — a
  scale-up grows facts against fixed dims, which is exactly the
  broadcast-join posture the engine claims.
- orders / lineitem: replicated with consistent orderkey offsets so the
  order↔lineitem join keeps its key structure; custkeys/partkeys/
  suppkeys unchanged (10x fan-in to the same dims).
- events: replicated with event_id and user_id offsets — 10x events AND
  10x distinct users, so user-keyed shuffles (sessionize, pagerank,
  per-user windows) scale in both rows and keys.
- documents: doc_id offset; replicas r>0 get a per-replica suffix token
  so exact-dup counts don't explode 10x while shingle distributions
  stay realistic; n_chars recomputed.
- embeddings: vec_id offset; replicas r>0 perturbed per-dimension with
  tiny hash noise (±0.005) — cluster structure survives, and each
  replica lands as a semantic near-dup of its source, so the
  per-cluster quadratic families (SemDeDup) get the compute-bound
  regime the amortization argument is about.

The DuckDB oracles read the same parquet, so cross-engine parity checks
stay valid at this scale wherever the twin is tractable.

Usage: python tools/gen_sf1.py [out_dir] [src_dir] [replicas]
       (defaults: /tmp/sf1 /root/testdata/sf0.1 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.session import get_session

COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_session("gen_sf1")
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(replicas).select(F.col("id").alias("r"))

    def src(name):
        return spark.read.parquet(f"{src_dir}/{name}.parquet")

    def write(df, name, nfiles: int = 1):
        # fact tables land as many files, like any real table at scale —
        # a 1-file 44 MB lineitem caps the scan at one task and turns
        # every downstream ratio into a parallelism artifact, not a
        # plan-quality measurement
        if nfiles > 1:
            df = df.repartition(nfiles)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{out_dir}/{name}.parquet').count()} rows")

    for t in COPY_TABLES:
        write(src(t), t)

    orders = src("orders")
    ok_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    write(
        orders.crossJoin(rep).select(
            (F.col("o_orderkey") + F.col("r") * ok_span).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        ),
        "orders", nfiles=16,
    )

    li = src("lineitem")
    write(
        li.crossJoin(rep).select(
            (F.col("l_orderkey") + F.col("r") * ok_span).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        "lineitem", nfiles=32,
    )

    ev = src("events")
    eid_span = ev.agg(F.max("event_id")).first()[0] + 1
    uid_span = ev.agg(F.max("user_id")).first()[0] + 1
    write(
        ev.crossJoin(rep).select(
            (F.col("event_id") + F.col("r") * eid_span).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("r") * uid_span).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events", nfiles=16,
    )

    docs = src("documents")
    did_span = docs.agg(F.max("doc_id")).first()[0] + 1
    new_text = F.when(F.col("r") == 0, F.col("text")).otherwise(
        F.concat(F.col("text"), F.lit(" r"), F.col("r").cast("string"))
    )
    write(
        docs.crossJoin(rep).select(
            (F.col("doc_id") + F.col("r") * did_span).alias("doc_id"),
            new_text.alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text").cast("long")),
        "documents", nfiles=8,
    )

    emb = src("embeddings")
    vid_span = emb.agg(F.max("vec_id")).first()[0] + 1
    perturbed = F.expr(
        "transform(embedding, (x, i) -> "
        "CASE WHEN r = 0 THEN x ELSE CAST(x + "
        "((pmod(xxhash64(vec_id, r, i), 1000) / 1000.0 - 0.5) * 0.01) "
        "AS FLOAT) END)"
    )
    write(
        emb.crossJoin(rep).select(
            (F.col("vec_id") + F.col("r") * vid_span).alias("vec_id"),
            perturbed.alias("embedding"),
            "label",
        ),
        "embeddings", nfiles=8,
    )
    spark.stop()


if __name__ == "__main__":
    main()
