"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Each query materializes fully through the noop sink (no driver collect,
no column-pruning shortcut), timing the plan a cluster would execute.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _host_calibration() -> list[float]:
    """[single-thread, 16-way-parallel] seconds for a fixed CPU loop
    (~0.3s/0.4s on a quiet host). The VM shows multi-hour windows where
    the hypervisor steals cycles (load >15 at 98% idle, same-code
    queries 4-20x slow — see BASELINE.md round-5 variance note), and the
    theft can hit PARALLEL load while a single thread still runs at full
    speed — so both shapes are probed. Recording the calibration
    alongside the totals lets a reader separate engine cost from host
    weather."""

    def loop() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(5_000_000):
            s += i * i
        return time.perf_counter() - t0

    single = loop()
    from multiprocessing import Pool

    t0 = time.perf_counter()
    with Pool(16) as p:
        p.map(_cal_loop, range(16))
    par = time.perf_counter() - t0
    return [round(single, 3), round(par, 3)]


def _cal_loop(_):
    s = 0
    for i in range(5_000_000):
        s += i * i
    return s


def main() -> None:
    from kafka_connect_bigquery_storage_write_spark.session import get_spark
    from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all

    cal_start = _host_calibration()

    spark = get_spark(app_name="kafka_connect_bigquery_storage_write_spark-bench", cpus=CPUS, shuffle_partitions=CPUS)
    load_all()

    # warm the JVM/codegen paths the suite uses (parquet scan, hash agg,
    # broadcast join, window, JSON) so the first timed query doesn't pay
    # one-time compilation costs
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).limit(50_000)
    ords = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).limit(10_000)
    (
        li.join(F.broadcast(ords), li.l_orderkey == ords.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"), F.countDistinct("o_custkey"))
        .collect()
    )
    spark.range(10_000).select(F.from_json(F.to_json(F.struct("id")), "id long")).count()

    # spawn the python-worker pool + Arrow serialization once, so the first
    # Pandas-UDF query isn't billed the per-executor worker startup; import
    # numpy/pandas INSIDE the workers (the operators' kernels use both, and
    # a worker's first import costs ~1s each)
    def _warm_kernel(batches):
        import numpy as np  # noqa: F401

        for pdf in batches:
            yield pdf.assign(id=pdf["id"] + np.int64(0))

    spark.range(CPUS * 10_000, numPartitions=CPUS).mapInPandas(_warm_kernel, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    # grouped-map path (applyInPandas) compiles/warms separately
    spark.range(CPUS * 1_000, numPartitions=CPUS).withColumn("g", F.pmod("id", F.lit(CPUS))).repartition(
        CPUS, "g"
    ).groupBy("g").applyInPandas(lambda pdf: pdf.head(1), "id long, g long").write.format("noop").mode(
        "overwrite"
    ).save()

    def sweep(sf_dir: str) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in sorted(QUERIES):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            # queries are independent: drop any relation an operator
            # persisted so cache residency can't distort the next timings
            spark.catalog.clearCache()
        return timings

    # Two timed passes, reporting the per-query MIN. The host this suite
    # runs on shows large transient noise (same-code totals measured
    # 81s..174s; individual 1.4s queries spiking to 15s — see BASELINE.md
    # round-2 variance analysis), and a single cold pass also bills
    # per-plan JIT/codegen warmup to arbitrary queries. The min of two
    # passes is the engine's steady-state cost — the quantity that scales
    # with a cluster — while the raw pass totals stay in the JSON for
    # transparency. The second pass is skipped if the first already blew
    # the budget (slow host), keeping worst-case wall time bounded. (A
    # small-SF warm sweep was tried instead and rejected: 62 queries x
    # ~1.5s fixed overhead costs more than the cold effects it removes.)
    bench_start = time.perf_counter()
    runs = [sweep(SF_DIR)]
    # budget raised from 240s with the round-5 registry growth (107
    # queries): a noisy first pass must not disable the warm pass, or the
    # reported number is all cold-start noise (a 383s min-of-1 was
    # recorded where the warm suite runs ~90s)
    if time.perf_counter() - bench_start < 600:
        runs.append(sweep(SF_DIR))

    best = {name: min(r[name] for r in runs) for name in runs[0]}
    total = round(sum(best.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    payload = {
        "metric": "query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        # stdout JSON must survive a bounded tail-capture window (round-2's
        # BENCH artifact was truncated mid-line and unparseable): keys are
        # the unambiguous qNN prefixes at 2dp, keeping the line ~1KB. The
        # full-name 3dp detail goes to BENCH_LOCAL.json alongside bench.py.
        "queries": {name.split("_")[0]: round(t, 2) for name, t in sorted(best.items())},
        "agg": f"min_of_{len(runs)}_runs",
        "run_totals": [round(sum(r.values()), 3) for r in runs],
        # single-thread CPU loop seconds at bench start/end (~0.6s quiet
        # host; >1.2s = hypervisor contention window, totals inflated)
        "host_cal": [cal_start, _host_calibration()],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "detail": "BENCH_LOCAL.json",
    }
    detail = dict(payload)
    detail["queries"] = best
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(payload, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
