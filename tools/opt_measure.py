"""Optimization-round measurement harness (guide §1): time declared queries
in isolation with the noop sink and capture their formatted plans.

Usage:
    python tools/opt_measure.py SF_DIR [--reps N] [--plans DIR --suffix before]
                                [--count] name [name ...]

Per query: builds the DataFrame, optionally writes the formatted explain to
<plans>/<name>_<suffix>.txt, then times REPS noop-sink materializations
(df.write.format("noop")) with a job description label. ``--count`` times
df.count() instead, mirroring bench.py's methodology, for comparability.
Prints one line per rep and a median summary. This tool is measurement-only;
bench.py stays the official harness.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0)
    reps = 3
    plans_dir = None
    suffix = "before"
    use_count = False
    names = []
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
        elif a == "--plans":
            plans_dir = args.pop(0)
        elif a == "--suffix":
            suffix = args.pop(0)
        elif a == "--count":
            use_count = True
        else:
            names.append(a)

    from vivace_graph_v3_spark import entry_queries as eq
    from vivace_graph_v3_spark.session import get_spark

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = eq.queries()
    # warm parquet footers once, like bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    meds = {}
    for name in names:
        samples = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            samples.append(dt)
            print(f"{name} rep{rep}: {dt}s", flush=True)
            if rep == 0 and plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                with open(f"{plans_dir}/{name}_{suffix}.txt", "w") as fh:
                    fh.write(formatted_plan(df))
        spark.sparkContext.setJobDescription(None)
        meds[name] = round(statistics.median(samples), 3)
    print("MEDIANS " + " ".join(f"{k}={v}" for k, v in meds.items()),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
