"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall seconds across the headline queries (lower better);
the JSON also carries docs/sec throughput per query for the BASELINE.json
metric. ``--scaling`` additionally runs the flagship job at two parallelism
levels (local[8] vs local[32] — the sandbox proxy for N→4N executors, per
the driver instruction) and writes BENCH/BASELINE.md with throughput at
both and the scaling efficiency.

To exercise real data volume (the driver testdata documents cap at 5000
rows), the spatial bench queries run over the deterministic synthetic
spans-documents table at a size scaled to the sf directory's lineitem count.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# synthetic doc count per sf dir (≥ sf0.1 → 600k docs, the FIXTURES bench scale)
N_DOCS = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}
N_QUERIES = 200


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")) or "sf0.1"


def build_session(cores: int):
    from mbrngq_spark.config import session

    return session(app=f"bench-{cores}", cores=cores,
                   shuffle_partitions=max(2 * cores, 16))


def bench_once(spark, sf_dir: str) -> tuple[dict, dict]:
    """Run the headline queries; returns ({name: sec}, {name: docs/sec})."""
    from pyspark.sql import functions as F

    from mbrngq_spark import harness as H
    from mbrngq_spark.index import IndexLayout, build_index
    from mbrngq_spark.operators import dedup, similarity, text, tiles
    from mbrngq_spark.operators.knn import knn_join
    from mbrngq_spark.operators.ngq import nearest_group
    from mbrngq_spark.sources.synth import documents_spans, query_points, \
        with_geometry_spans

    n_docs = N_DOCS.get(_sf_tag(sf_dir), 600_000)
    # operators take int64 ids; the spans table's string doc_id carries its
    # numeric part, so derive it (doc_uid stays for the payload invariant)
    docs = (with_geometry_spans(documents_spans(spark, n_docs))
            .withColumn("doc_uid", F.col("doc_id"))
            .withColumn("doc_id",
                        F.substring("doc_id", 5, 8).cast("long"))
            .select("doc_id", "doc_uid", "x", "y", "category", "spans"))
    docs.cache().count()  # materialize outside the timings
    qpts = query_points(spark, N_QUERIES).toPandas()

    times: dict[str, float] = {}
    rates: dict[str, float] = {}

    def run(name: str, fn, rows_processed: int):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        rates[name] = round(rows_processed / dt, 1)

    geo = docs.drop("spans", "doc_uid")
    run("index_build",
        lambda: build_index(docs, IndexLayout())[0].write.mode("overwrite")
        .format("noop").save(),
        n_docs)
    run("knn",
        lambda: knn_join(spark, geo, qpts, k=10).count(),
        n_docs)
    run("ngq",
        lambda: nearest_group(spark, geo, qpts, k=10, L=32).count(),
        n_docs)
    run("tile_rollup",
        lambda: tiles.tile_rollup(geo).count(),
        n_docs)

    tdocs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_t = tdocs.count()
    run("dedup_minhash",
        lambda: dedup.near_duplicates_minhash(tdocs, threshold=0.7).count(),
        n_t)
    run("text_features",
        lambda: text.with_text_features(tdocs).select(
            F.sum("fingerprint")).collect(),
        n_t)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_e = emb.count()
    queries = emb.limit(16).select(F.col("vec_id").alias("q_id"), "embedding")
    run("ann_topk",
        lambda: similarity.cosine_topk_bruteforce(emb, queries, k=10).count(),
        n_e)

    docs.unpersist()
    return times, rates


def scaling_run(sf_dir: str) -> dict:
    """Same flagship job (index build + NGQ batch) at 8 and 32 cores on the
    SAME input → throughput at both + efficiency (BASELINE.json north rule;
    a real N→4N executor cluster is out of scope in this sandbox)."""
    results = {}
    n_docs = N_DOCS.get(_sf_tag(sf_dir), 600_000)
    for cores in (8, 32):
        spark = build_session(cores)
        spark.sparkContext.setLogLevel("ERROR")
        try:
            from mbrngq_spark.index import IndexLayout, build_index
            from mbrngq_spark.operators.ngq import nearest_group
            from mbrngq_spark.sources.synth import documents_spans, \
                query_points, with_geometry_spans

            from pyspark.sql import functions as F
            docs = (with_geometry_spans(documents_spans(spark, n_docs))
                    .withColumn("doc_id",
                                F.substring("doc_id", 5, 8).cast("long"))
                    .select("doc_id", "x", "y", "category", "spans"))
            docs.cache().count()
            qpts = query_points(spark, N_QUERIES).toPandas()
            geo = docs.drop("spans")

            t0 = time.time()
            build_index(docs, IndexLayout())[0].write.mode("overwrite") \
                .format("noop").save()
            nearest_group(spark, geo, qpts, k=10, L=32).count()
            dt = time.time() - t0
            results[cores] = {"sec": round(dt, 2),
                              "docs_per_sec": round(n_docs / dt, 1)}
        finally:
            spark.stop()
    speedup = results[32]["docs_per_sec"] / results[8]["docs_per_sec"]
    results["speedup_8_to_32"] = round(speedup, 3)
    results["scaling_efficiency"] = round(speedup / 4.0, 3)
    return results


def write_baseline_md(sf_dir: str, times: dict, rates: dict, scaling: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    n_docs = N_DOCS.get(_sf_tag(sf_dir), 600_000)
    lines = [
        "# BENCH/BASELINE.md — measured engine numbers",
        "",
        f"Input: synthetic spans-documents n={n_docs} (+ testdata {_sf_tag(sf_dir)}), "
        f"{N_QUERIES} query points, k=10, L=32.",
        "",
        "## Headline queries (local[%d])" % CPUS,
        "",
        "| query | wall sec | docs/sec |",
        "| --- | --- | --- |",
    ]
    for q in times:
        lines.append(f"| {q} | {times[q]} | {rates[q]} |")
    lines += [
        "",
        "## Scaling: local[8] → local[32] (sandbox proxy for N → 4N executors)",
        "",
        "| cores | wall sec | docs/sec |",
        "| --- | --- | --- |",
        f"| 8 | {scaling[8]['sec']} | {scaling[8]['docs_per_sec']} |",
        f"| 32 | {scaling[32]['sec']} | {scaling[32]['docs_per_sec']} |",
        "",
        f"speedup 8→32 (4× cores): **{scaling['speedup_8_to_32']}×**",
        "",
        f"scaling efficiency (speedup/4): **{scaling['scaling_efficiency']}** "
        f"(target ≥ 0.8 per BASELINE.json)",
        "",
        "Flagship job for scaling = index build + 200-query NGQ batch on the "
        "same input at both parallelism levels.",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    do_scaling = "--scaling" in sys.argv
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        times, rates = bench_once(spark, SF_DIR)
    finally:
        spark.stop()

    scaling = scaling_run(SF_DIR) if do_scaling else None
    if scaling:
        write_baseline_md(SF_DIR, times, rates, scaling)

    out = {
        "metric": "engine headline wall time (index+kNN+NGQ+tiles+dedup+text+ANN)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "docs_per_sec": rates,
        "sf": _sf_tag(SF_DIR),
    }
    if scaling:
        out["scaling"] = {str(k): v for k, v in scaling.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
