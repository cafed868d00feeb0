"""Orchestration (reference A19): linear task chains with retries.

The reference wires its work as Airflow task chains —
``start >> drop >> create >> load >> dq >> load >> dq >> join >> dq >> ready``
(``/root/reference/dags/patient_claims_plus_postgres.py:203-214``) with
``retries=1, retry_delay=2min`` (``:14-19``) — where every task is a SQL
round-trip to Postgres.  In the Spark-native engine, the *intra-job* chain
collapses into one lazy Spark plan; what remains for an orchestrator are the
coarse stages (ingest → transform/DQ → publish).

``Pipeline`` is a dependency-ordered runner with per-task retries so the engine
is orchestrator-agnostic (usable from a cron, a test, or a notebook);
``build_airflow_dag`` shows the identical graph on Airflow when it is
installed (it is not in this container — import-gated).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Task:
    name: str
    fn: Callable[[], object]
    upstream: list[str] = field(default_factory=list)
    retries: int = 1  # reference default (:17)
    retry_delay_s: float = 120.0  # reference: 2 minutes (:18)


class PipelineError(RuntimeError):
    pass


class Pipeline:
    """Tiny DAG runner: topological execution, per-task retries, fail-fast."""

    def __init__(self) -> None:
        self._tasks: dict[str, Task] = {}

    def add(
        self,
        name: str,
        fn: Callable[[], object],
        upstream: list[str] | None = None,
        retries: int = 1,
        retry_delay_s: float = 120.0,
    ) -> "Pipeline":
        if name in self._tasks:
            raise ValueError(f"duplicate task {name!r}")
        for up in upstream or []:
            if up not in self._tasks:
                raise ValueError(f"task {name!r} depends on unknown task {up!r}")
        self._tasks[name] = Task(name, fn, list(upstream or []), retries, retry_delay_s)
        return self

    def topo_order(self) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()

        def visit(n: str, stack: tuple[str, ...]) -> None:
            if n in stack:
                raise PipelineError(f"cycle detected at {n!r}")
            if n in seen:
                return
            for up in self._tasks[n].upstream:
                visit(up, stack + (n,))
            seen.add(n)
            order.append(n)

        for n in self._tasks:
            visit(n, ())
        return order

    def run(self, sleep: Callable[[float], None] = time.sleep) -> dict[str, object]:
        """Execute in dependency order; each task gets `retries` extra attempts."""
        results: dict[str, object] = {}
        for name in self.topo_order():
            task = self._tasks[name]
            attempts = task.retries + 1
            for attempt in range(1, attempts + 1):
                try:
                    results[name] = task.fn()
                    break
                except Exception as exc:
                    if attempt == attempts:
                        raise PipelineError(f"task {name!r} failed after {attempts} attempts") from exc
                    sleep(task.retry_delay_s)
        return results


def patient_claims_pipeline(spark, claims_csv: str, beneficiary_csv: str, out_path: str) -> Pipeline:
    """The reference DAG 2 as an engine pipeline: load → DQ → join → DQ → publish.

    The drop/create/COPY triplet of the reference collapses into the Spark
    load+cast scan; DQ checks actually raise (fixing A14)."""
    from airflow_cms_inpatient_etl_spark.plans import dq
    from airflow_cms_inpatient_etl_spark.plans.patient_claims import build_patient_claims_plus
    from airflow_cms_inpatient_etl_spark.schemas import (
        BENEFICIARY_KEEP_COLS,
        BENEFICIARY_SCHEMA,
        CLAIMS_KEEP_COLS,
        CLAIMS_SCHEMA,
    )
    from airflow_cms_inpatient_etl_spark.sources.files import read_csv_projected, write_table

    state: dict[str, object] = {}

    def load_claims():
        state["claims"] = read_csv_projected(spark, claims_csv, CLAIMS_KEEP_COLS, CLAIMS_SCHEMA)
        return "loaded"

    def load_beneficiary():
        state["bene"] = read_csv_projected(
            spark, beneficiary_csv, BENEFICIARY_KEEP_COLS, BENEFICIARY_SCHEMA
        )
        return "loaded"

    def dq_claims():
        return dq.assert_non_empty(state["claims"], "claims")

    def dq_beneficiary():
        dq.assert_unique_key(state["bene"], "desynpuf_id", "beneficiary")
        return dq.assert_non_empty(state["bene"], "beneficiary")

    def join_and_publish():
        out = build_patient_claims_plus(state["claims"], state["bene"])
        write_table(out, out_path)
        return out_path

    def dq_final():
        final = spark.read.parquet(out_path)
        return dq.assert_non_empty(final, "patient_claims_plus")

    return (
        Pipeline()
        .add("load_claims", load_claims)
        .add("load_beneficiary", load_beneficiary)
        .add("dq_claims", dq_claims, upstream=["load_claims"])
        .add("dq_beneficiary", dq_beneficiary, upstream=["load_beneficiary"])
        .add("join_and_publish", join_and_publish, upstream=["dq_claims", "dq_beneficiary"])
        .add("dq_final", dq_final, upstream=["join_and_publish"])
    )


def build_airflow_dag(dag_id: str, pipeline: Pipeline, schedule=None):
    """Wire the same graph as an Airflow DAG (reference's orchestrator).

    Import-gated: Airflow is not installed in this container; on a real
    deployment each task becomes a PythonOperator (or the Spark jobs submit via
    SparkSubmitOperator) with the reference's retry policy."""
    try:
        from airflow import DAG
        from airflow.operators.python import PythonOperator
    except ImportError as exc:  # pragma: no cover - exercised only with Airflow
        raise ImportError("apache-airflow is not installed in this environment") from exc

    import datetime

    dag = DAG(dag_id=dag_id, schedule=schedule, start_date=datetime.datetime(2024, 1, 1))
    ops = {}
    for name in pipeline.topo_order():
        task = pipeline._tasks[name]
        ops[name] = PythonOperator(
            task_id=name,
            python_callable=task.fn,
            retries=task.retries,
            retry_delay=datetime.timedelta(seconds=task.retry_delay_s),
            dag=dag,
        )
    for name, task in pipeline._tasks.items():
        for up in task.upstream:
            ops[up] >> ops[name]
    return dag
