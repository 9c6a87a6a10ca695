"""Dependency-ordered job runner — the thin scheduler layer the
reference declares but never ships (``README.md:57-62`` lists an
Airflow DAG dir and a dbt project; ``docker/dags/`` scans empty and no
dbt relations exist — SURVEY.md §0).  This is that layer, Spark-native:

- a **Job** is a named unit with explicit upstream deps and a
  ``run(spark, ctx)`` callable (ctx carries upstream outputs — the
  XCom/dbt-ref analog);
- **run_dag** topologically orders the jobs (deterministic: ready jobs
  execute in name order, so runs are reproducible), detects cycles and
  missing deps up front, and executes each job exactly once, recording
  status + wall time per job;
- failures mark every transitive downstream job ``upstream_failed``
  and the runner keeps going with independent branches — Airflow's
  default trigger rule, so one broken mart doesn't block siblings;
- **idempotency is the write contract**: every mart job writes with
  overwrite / dynamic-partition-overwrite semantics, so re-running the
  DAG (or re-running after a mid-DAG crash) converges to the same
  state (tests/test_marts.py proves bit-identical re-runs).

Scale note: the DAG machinery is driver-side metadata only — each
job's actual work is a distributed Spark action; nothing here touches
rows.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


@dataclass
class Job:
    name: str
    run: Callable[[SparkSession, dict[str, Any]], Any]
    deps: tuple[str, ...] = ()
    doc: str = ""


@dataclass
class JobResult:
    status: str  # ok | failed | upstream_failed
    seconds: float = 0.0
    output: Any = None
    error: str | None = None


@dataclass
class DagRun:
    order: list[str] = field(default_factory=list)
    results: dict[str, JobResult] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(r.status == "ok" for r in self.results.values())


def topo_order(jobs: dict[str, Job]) -> list[str]:
    """Deterministic topological order: among ready jobs, lexicographic
    name order.  Raises on unknown deps and on cycles (naming the
    members)."""
    for j in jobs.values():
        for d in j.deps:
            if d not in jobs:
                raise ValueError(f"job {j.name!r} depends on unknown job {d!r}")
    remaining = {n: set(j.deps) for n, j in jobs.items()}
    order: list[str] = []
    while remaining:
        ready = sorted(n for n, deps in remaining.items() if not deps)
        if not ready:
            raise ValueError(f"dependency cycle among {sorted(remaining)}")
        for n in ready:
            order.append(n)
            del remaining[n]
        for deps in remaining.values():
            deps.difference_update(ready)
    return order


def run_dag(
    spark: SparkSession, jobs: dict[str, Job], ctx: dict[str, Any] | None = None
) -> DagRun:
    """Execute ``jobs`` in dependency order.  ``ctx`` seeds the shared
    context; each job's return value is stored under its name (the
    XCom analog) and visible to downstream jobs."""
    run = DagRun(order=topo_order(jobs))
    ctx = dict(ctx or {})
    for name in run.order:
        job = jobs[name]
        failed_up = [
            d
            for d in job.deps
            if run.results[d].status != "ok"
        ]
        if failed_up:
            run.results[name] = JobResult(
                status="upstream_failed",
                error=f"upstream {failed_up} not ok",
            )
            continue
        t0 = time.monotonic()
        try:
            out = job.run(spark, ctx)
            ctx[name] = out
            run.results[name] = JobResult(
                status="ok", seconds=time.monotonic() - t0, output=out
            )
        except Exception as e:  # noqa: BLE001 — recorded, downstream skipped
            run.results[name] = JobResult(
                status="failed", seconds=time.monotonic() - t0, error=repr(e)
            )
    return run


# ---------------------------------------------------------------------------
# The banking-marts DAG (the reference's declared Airflow DAG, realized)
# ---------------------------------------------------------------------------


def banking_marts_dag(out_dir: str, n_customers: int = 200) -> dict[str, Job]:
    """silver (synth + persist per table, dependency-ordered like the
    generator's customers→accounts→transactions loop) → gold marts.
    Every write is overwrite-idempotent; re-running the DAG converges."""
    import os

    from pyspark.sql import functions as F  # noqa: F401 — mart fns use it

    from end_end_data_pipeline__spark.plans import marts
    from end_end_data_pipeline__spark.sources import datagen

    def silver(table: str):
        def _run(spark: SparkSession, ctx: dict[str, Any]) -> str:
            star = datagen.banking_star(
                spark, n_customers=n_customers, txns_per_account=5
            )
            p = os.path.join(out_dir, "silver", table)
            star[table].write.mode("overwrite").parquet(p)
            return p

        return _run

    def gold(builder: Callable[..., Any], *dep_tables: str):
        def _run(spark: SparkSession, ctx: dict[str, Any]) -> str:
            frames = [spark.read.parquet(ctx[f"silver_{t}"]) for t in dep_tables]
            name = builder.__name__.removeprefix("mart_")
            p = os.path.join(out_dir, "gold", name)
            builder(*frames).write.mode("overwrite").parquet(p)
            return p

        return _run

    return {
        "silver_customers": Job("silver_customers", silver("customers")),
        "silver_accounts": Job(
            "silver_accounts", silver("accounts"), deps=("silver_customers",)
        ),
        "silver_transactions": Job(
            "silver_transactions", silver("transactions"), deps=("silver_accounts",)
        ),
        "gold_daily_txn_volume": Job(
            "gold_daily_txn_volume",
            gold(marts.mart_daily_txn_volume, "transactions", "accounts"),
            deps=("silver_transactions", "silver_accounts"),
        ),
        "gold_customer_value": Job(
            "gold_customer_value",
            gold(
                marts.mart_customer_value, "customers", "accounts", "transactions"
            ),
            deps=("silver_customers", "silver_accounts", "silver_transactions"),
        ),
        "gold_account_running_balance": Job(
            "gold_account_running_balance",
            gold(marts.mart_account_running_balance, "transactions"),
            deps=("silver_transactions",),
        ),
    }
