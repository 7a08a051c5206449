"""Past-the-guard probe (VERDICT r9 item 3): every local-finish operator
keeps its distributed loop as the at-scale fallback, but at sf0.1 the F6
fixtures sit under ``local_guard``, so the bench exercises the driver-local
path only. This probe runs each guarded ENTRY both ways at a given SF —

  - declared: exactly what the registry/bench runs (local path engages),
  - distributed: the same entry with the guarded operator(s) forced to
    ``local_guard=0`` (``driver_pairs_guard=0`` for the dedup union-find),

asserts the canonicalized results are IDENTICAL (the check_contract
canonicalization: %.6f floats, order-insensitive hash), times both with
the noop sink, and dumps the distributed plan to
``plans/<dir>/<name>_distributed.txt``.

Usage:
    python tools/guard_probe.py SF_DIR [--reps N] [--plans DIR] [names...]
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time
from unittest import mock

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python workers unpickle package UDFs by module reference; they inherit
# PYTHONPATH from the environment, not the driver's sys.path mutation.
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)

from check_contract import canon_pdf  # noqa: E402  (tools/ sibling)

# entry name -> (module path, [guarded operator attribute, ...], kwarg)
_GA = "vivace_graph_v3_spark.operators.graph_algorithms"
_DD = "vivace_graph_v3_spark.pipeline.dedup"
GUARDED: dict[str, tuple[str, list[str], str]] = {
    "graph_connected_components": (_GA, ["connected_components"],
                                   "local_guard"),
    "graph_ktruss": (_GA, ["k_truss"], "local_guard"),
    "graph_kcore": (_GA, ["k_core"], "local_guard"),
    "graph_shortest_paths": (_GA, ["shortest_paths"], "local_guard"),
    "graph_closeness_landmarks": (_GA, ["landmark_closeness"], "local_guard"),
    "graph_eccentricity": (_GA, ["landmark_eccentricity"], "local_guard"),
    "graph_stress_landmarks": (_GA, ["landmark_stress"], "local_guard"),
    "graph_scc": (_GA, ["strongly_connected_components"], "local_guard"),
    "graph_bowtie": (_GA, ["strongly_connected_components",
                           "bowtie_decomposition"], "local_guard"),
    "temporal_reach": (_GA, ["temporal_earliest_arrival"], "local_guard"),
    "temporal_reach_converged": (_GA, ["temporal_earliest_arrival"],
                                 "local_guard"),
    "dedup_survivors": (_DD, ["dedup_clusters"], "driver_pairs_guard"),
}


def _force_distributed(module_path: str, attrs: list[str], kwarg: str):
    """Context stack patching each operator with <kwarg>=0."""
    import importlib

    module = importlib.import_module(module_path)
    patches = []
    for attr in attrs:
        fn = getattr(module, attr)
        patches.append(mock.patch.object(
            module, attr, functools.partial(fn, **{kwarg: 0})))
    return patches


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0)
    reps = 1
    plans_dir = None
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
        elif a == "--plans":
            plans_dir = args.pop(0)
        else:
            names.append(a)
    names = names or list(GUARDED)

    from opt_measure import formatted_plan

    from vivace_graph_v3_spark import entry_queries as eq
    from vivace_graph_v3_spark.session import get_spark

    spark = get_spark("guard-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = eq.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    rows = []
    failures = []
    for name in names:
        module_path, attrs, kwarg = GUARDED[name]

        def run(mode: str):
            samples = []
            plan = None
            result_hash = None
            for rep in range(reps):
                spark.sparkContext.setJobDescription(
                    f"guard-probe {name} {mode} rep{rep}")
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
                if rep == 0:
                    result_hash = canon_pdf(df.toPandas())
                    if mode == "distributed" and plans_dir:
                        os.makedirs(plans_dir, exist_ok=True)
                        with open(f"{plans_dir}/{name}_distributed.txt",
                                  "w") as fh:
                            fh.write(formatted_plan(df))
            spark.sparkContext.setJobDescription(None)
            return statistics.median(samples), result_hash

        t_local, h_local = run("declared")
        patches = _force_distributed(module_path, attrs, kwarg)
        for p in patches:
            p.start()
        try:
            t_dist, h_dist = run("distributed")
        finally:
            for p in patches:
                p.stop()
        same = h_local == h_dist
        status = "IDENTICAL" if same else "MISMATCH"
        if not same:
            failures.append(name)
        rows.append((name, t_local, t_dist, status))
        print(f"{name}: declared={t_local}s distributed={t_dist}s "
              f"{status} (hash {h_local[0]} vs {h_dist[0]}, "
              f"rows {h_local[1]} vs {h_dist[1]})", flush=True)

    print("\n| entry | declared s | distributed s | results |")
    print("|---|---|---|---|")
    for name, tl, td, st in rows:
        print(f"| {name} | {tl} | {td} | {st} |")
    print(f"\n{len(rows) - len(failures)}/{len(rows)} identical; "
          f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
