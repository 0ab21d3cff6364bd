"""Iteration driver: convergence loops with checkpoint/resume + metrics.

The reference's iterative algorithms run in-place over big arrays with a
barrier per round (``algo/ParallelBreadthFirstVisit.java:272``,
``algo/HyperBall.java:1000``).  The Spark analogue is a driver loop over
state DataFrames where each round is a job; this module adds what Spark
does not give for free (SURVEY.md §4):

- **lineage truncation**: iterative plans grow unboundedly; every
  ``checkpoint_every`` rounds the state is written to parquet and re-read,
  cutting the plan (the Spark analogue of the reference's in-place
  arrays).
- **resumability** (north rule): each checkpoint directory carries a
  manifest (iteration, row count, partition/skew metrics); a new run with
  the same ``run_dir`` restarts from the latest complete checkpoint and
  reproduces the same final state.
- **per-iteration metrics**: rows changed, per-partition sizes, wall
  time — appended to ``runs.jsonl`` (the lineage/metrics table).

Checkpoints are plain parquet directories; on a cluster deployment the
same layout maps 1:1 onto an Iceberg table with snapshot-per-iteration
(this sandbox has no Iceberg runtime jar, so the implementation targets
the lowest common denominator while keeping the write pattern —
overwrite-by-directory, manifest-commit-last — atomic in the same way).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class IterationResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


class IterativeRunner:
    """Run ``state = step(state)`` until convergence with checkpoints.

    ``step(state, iteration) -> (new_state, changed_count_or_None)``;
    convergence = ``changed == 0`` (or a custom ``converged`` callable).
    """

    def __init__(
        self,
        spark: SparkSession,
        run_dir: str | None = None,
        checkpoint_every: int = 5,
        max_iterations: int = 200,
    ):
        self.spark = spark
        self.run_dir = run_dir
        self.checkpoint_every = checkpoint_every
        self.max_iterations = max_iterations

    # -- checkpoint bookkeeping ------------------------------------------
    def _ckpt_dir(self, it: int) -> str:
        return os.path.join(self.run_dir, f"iter_{it:06d}")

    def _manifest_path(self, it: int) -> str:
        return os.path.join(self._ckpt_dir(it), "manifest.json")

    def latest_checkpoint(self) -> int | None:
        """Latest iteration with a *complete* manifest (manifest is written
        after the parquet commit, so its presence proves completeness)."""
        if not self.run_dir or not os.path.isdir(self.run_dir):
            return None
        its = []
        for name in os.listdir(self.run_dir):
            if name.startswith("iter_") and os.path.exists(
                os.path.join(self.run_dir, name, "manifest.json")
            ):
                its.append(int(name.split("_")[1]))
        return max(its) if its else None

    def _write_checkpoint(self, state: DataFrame, it: int, extra: dict) -> DataFrame:
        d = self._ckpt_dir(it)
        data = os.path.join(d, "state")
        state.write.mode("overwrite").parquet(data)
        reread = self.spark.read.parquet(data)
        part_sizes = [
            r["cnt"]
            for r in reread.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .withColumnRenamed("count", "cnt")
            .collect()
        ]
        manifest = {
            "iteration": it,
            "rows": sum(part_sizes),
            "partition_sizes": part_sizes,
            "ts": time.time(),
            **extra,
        }
        tmp = self._manifest_path(it) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path(it))  # commit point
        return reread

    def _load_checkpoint(self, it: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._ckpt_dir(it), "state"))

    def _log_run(self, rec: dict) -> None:
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            with open(os.path.join(self.run_dir, "runs.jsonl"), "a") as fh:
                fh.write(json.dumps(rec) + "\n")

    # -- the loop ----------------------------------------------------------
    def run(
        self,
        initial: Callable[[], DataFrame],
        step: Callable[[DataFrame, int], tuple[DataFrame, int | None]],
        check: Callable[[DataFrame, DataFrame, int], int | None] | None = None,
        resume: bool = True,
    ) -> IterationResult:
        """``step(state, it) -> (new_state_plan, changed_or_None)``;
        ``check(old, new, it) -> changed_or_None`` runs *after* the new
        state is materialized (so convergence probes hit cached data, not
        a recompute).  Convergence = changed == 0.

        Every iteration the new state is **eagerly localCheckpoint-ed**:
        iterative DataFrame plans otherwise grow without bound and
        Catalyst re-optimization time explodes within ~5 rounds
        (SURVEY.md §7 hard part 4 — the Spark analogue of the reference's
        in-place big arrays).  Durable parquet checkpoints (resume path)
        happen every ``checkpoint_every`` rounds on top.
        """
        metrics: list[dict] = []
        start_iter = 0
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
        latest = self.latest_checkpoint() if (resume and self.run_dir) else None
        if latest is not None:
            state = self._load_checkpoint(latest)
            start_iter = latest
        else:
            state = initial()
        state = state.localCheckpoint(eager=True)

        converged = False
        it = start_iter
        while it < self.max_iterations:
            t0 = time.time()
            new_plan, changed = step(state, it)
            new_state = new_plan.localCheckpoint(eager=True)  # truncate lineage
            # row-count metric: one extra (tiny but not free) job per round —
            # only pay for it when a run_dir wants durable metrics/manifests
            n_rows = new_state.count() if self.run_dir else None
            if changed is None and check is not None:
                changed = check(state, new_state, it)
            it += 1
            rec = {
                "iteration": it,
                "rows": n_rows,
                "changed": changed,
                "sec": time.time() - t0,
            }
            metrics.append(rec)
            self._log_run(rec)
            if self.run_dir and (it % self.checkpoint_every == 0):
                self._write_checkpoint(new_state, it, {"changed": changed})
            state = new_state
            if changed is not None and changed == 0:
                converged = True
                break
        if self.run_dir:
            # final checkpoint so a resumed run sees the converged state
            self._write_checkpoint(state, it, {"final": True})
        return IterationResult(state=state, iterations=it, converged=converged, metrics=metrics)

    def clear(self) -> None:
        if self.run_dir and os.path.isdir(self.run_dir):
            shutil.rmtree(self.run_dir)
