#!/usr/bin/env python3
"""Side benchmark for the optimization round (bench.py is FROZEN for
measurement, so extra instrumentation lives here).

Usage:
  python bench_extra.py time  <sf_dir> <query> [query ...]   # cold+warm secs
  python bench_extra.py plan  <out_dir> <sf_dir> <query> ... # explain files
  python bench_extra.py noop  <sf_dir> <query> [query ...]   # noop-sink warm
  python bench_extra.py probe <sf_dir> <query> [query ...]   # warm 1x vs 10x

Same session shape as bench.py's query section (local[$SPARK_GRAFT_CPUS],
shuffle partitions = cpus, 16g driver).  Timing protocol mirrors bench.py:
build the DataFrame and .count() it, cold then warm, recording the warm
pass.  The noop mode uses the guide §1.4 noop sink instead of count() so
every column is computed.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from pdftotext_plus_plus_spark import engine
    spark = engine.build_session(app_name="bench-extra", cpus=CPUS,
                                 shuffle_partitions=CPUS,
                                 driver_memory="16g")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    mode = sys.argv[1]
    from pdftotext_plus_plus_spark.datapipe import registry
    qs = registry.queries()

    if mode == "plan":
        out_dir, sf_dir, names = sys.argv[2], sys.argv[3], sys.argv[4:]
        os.makedirs(out_dir, exist_ok=True)
        spark = _session()
        for name in names:
            df = qs[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(p)
            print("wrote", name)
        spark.stop()
        return

    sf_dir, names = sys.argv[2], sys.argv[3:]
    spark = _session()
    # same warmup as bench.py's query section
    for table in ("documents", "embeddings", "events"):
        path = f"{sf_dir}/{table}.parquet"
        if os.path.exists(path):
            spark.read.parquet(path).count()
    out = {}
    if mode == "probe":
        import bench as bench_mod
        scale_dir = bench_mod.ensure_scale_corpus(spark, sf_dir)
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if mode == "noop":
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            out[name] = {"warm_noop": round(time.perf_counter() - t0, 3)}
        elif mode == "probe":
            import math
            qs[name](spark, sf_dir).count()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            t_lo = max(time.perf_counter() - t0, 1e-3)
            qs[name](spark, scale_dir).count()
            t0 = time.perf_counter()
            qs[name](spark, scale_dir).count()
            t_hi = time.perf_counter() - t0
            out[name] = {"sec_1x": round(t_lo, 3),
                         "sec_10x": round(t_hi, 3),
                         "exponent": round(
                             math.log(t_hi / t_lo) / math.log(10), 3)}
        else:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            warm = time.perf_counter() - t0
            out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
