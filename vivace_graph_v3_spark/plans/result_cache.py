"""MVCC-epoch-keyed query result cache.

The reference keeps hot query answers close to the store (its views are
pre-materialized reductions, views.lisp; its Prolog layer re-runs select
bodies on every call). Dashboards and agent loops re-issue the SAME
query between writes; on Spark the natural memo is *result parquet keyed
by (logical-plan fingerprint, store epoch)*:

- **Fingerprint**: the analyzed logical plan's string form. Two
  DataFrames built the same way print the same tree (modulo
  auto-generated expression ids, which are normalized out), so a repeat
  of the query — not merely the same Python object — hits.
- **Epoch**: :class:`~vivace_graph_v3_spark.mvcc.VersionedGraph`'s
  ``current_epoch()``. Every commit bumps it, so ANY write to the store
  invalidates EVERY cached result at once — coarse, but never stale, and
  epoch lookup is one WAL-footer aggregate, not a table scan. (Per-table
  invalidation is the matview catalog's job; this layer is the cheap
  outer memo.)
- **Hit** = read back the result parquet only: the base store is not
  rescanned (pinned by test via ``DataFrame.inputFiles``).

100 TB shape: a cached RESULT is usually orders of magnitude smaller
than its inputs (aggregates, top-k, reports), so the cache turns a
multi-TB scan into a KB-MB read. Writes stream through the executors
(``df.write.parquet``) — the driver never holds rows. Eviction is
count-bounded FIFO per cache directory.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
from typing import Callable

from pyspark.sql import DataFrame

__all__ = ["ResultCache"]

_EXPR_ID = re.compile(r"#\d+")


def plan_fingerprint(df: DataFrame) -> str:
    """Stable fingerprint of a DataFrame's analyzed logical plan.

    Two ingredients, because neither alone is safe:

    - Spark's **canonicalized** plan text: expr ids are normalized by
      the engine itself (rebuild-stable) while **literal values
      survive** — so two queries whose only difference is a string
      literal that itself looks like an expr id (``'a#1'`` vs
      ``'a#2'``) fingerprint apart. (Deleting every ``#\\d+`` from the
      analyzed text, the previous scheme, collapsed those two and could
      serve the wrong cached result. ``semanticHash()`` is NOT usable
      here: on MVCC read plans it hashes embedded in-memory relations
      by identity and drifts between builds of the same query.)
    - the analyzed plan text with every ``#<digits>`` token rewritten
      to its first-appearance index — canonicalization strips output
      aliases, so this ingredient keeps queries that differ only in a
      result column NAME apart.
    """
    analyzed = df._jdf.queryExecution().analyzed()
    seen: dict[str, str] = {}

    def canon(m: re.Match) -> str:
        return seen.setdefault(m.group(0), f"#c{len(seen)}")

    body = (analyzed.canonicalized().toString() + "\n===\n"
            + _EXPR_ID.sub(canon, analyzed.toString()))
    return hashlib.sha256(body.encode()).hexdigest()[:24]


class ResultCache:
    """Memoize query results against a :class:`VersionedGraph`.

    ``run(build)`` executes ``build()`` (a zero-arg callable returning a
    DataFrame) at most once per (plan, epoch); repeats are served from
    the cached parquet. ``stats`` counts hits/misses for observability.
    """

    def __init__(self, graph, cache_path: str, *,
                 max_entries: int = 64) -> None:
        self.graph = graph
        self.cache_path = cache_path
        self.max_entries = max_entries
        self._index: dict[str, str] = {}   # key -> result dir (FIFO)
        self.stats = {"hits": 0, "misses": 0}
        os.makedirs(cache_path, exist_ok=True)

    def _key(self, df: DataFrame, epoch: int) -> str:
        return f"e{epoch}_{plan_fingerprint(df)}"

    def run(self, build: Callable[[], DataFrame]) -> DataFrame:
        df = build()
        epoch = self.graph.current_epoch()
        key = self._key(df, epoch)
        path = self._index.get(key)
        if path is not None and os.path.isdir(path):
            self.stats["hits"] += 1
            return self.graph.spark.read.parquet(path)
        self.stats["misses"] += 1
        path = os.path.join(self.cache_path, key)
        df.write.mode("overwrite").parquet(path)
        self._index[key] = path
        while len(self._index) > self.max_entries:
            old_key = next(iter(self._index))
            shutil.rmtree(self._index.pop(old_key), ignore_errors=True)
        return self.graph.spark.read.parquet(path)

    def invalidate_all(self) -> None:
        for path in self._index.values():
            shutil.rmtree(path, ignore_errors=True)
        self._index.clear()
