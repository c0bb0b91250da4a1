"""Async task execution — ``lantern.async_task(query[, name])``
(lantern_hnsw/sql/lantern.sql:454-592: pg_cron-scheduled SQL, a tasks
table with status/duration/error, ``cancel_all_async_tasks``).

Spark recast: tasks are spark.sql strings executed on background threads
(Spark is thread-safe per-session; each task gets a job group so
cancellation maps to Spark's own job-group cancel). The task table is a
plain list-of-dicts mirrored to a DataFrame — same columns as the
reference's ``lantern.tasks``.
"""

from __future__ import annotations

import threading
import time
import traceback
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class AsyncTasks:
    spark: SparkSession
    tasks: list[dict] = field(default_factory=list)
    _threads: dict[int, threading.Thread] = field(default_factory=dict)

    def async_task(self, query: str, name: str | None = None) -> int:
        """Submit a SQL string; returns the task id (jobid analogue)."""
        task_id = len(self.tasks) + 1
        row = {
            "jobid": task_id, "query": query, "pg_cron_job_name": name,
            "started_at": time.time(), "duration_s": None,
            "status": "running", "error_message": None, "row_count": None,
        }
        self.tasks.append(row)

        def run():
            group = f"async_task_{task_id}"
            self.spark.sparkContext.setJobGroup(group, name or query[:80])
            t0 = time.monotonic()
            try:
                out = self.spark.sql(query)
                row["row_count"] = out.count()
                row["status"] = "done"
            except Exception:
                row["status"] = "failed"
                row["error_message"] = traceback.format_exc(limit=1)
            finally:
                row["duration_s"] = round(time.monotonic() - t0, 3)

        th = threading.Thread(target=run, daemon=True)
        self._threads[task_id] = th
        th.start()
        return task_id

    def wait(self, task_id: int, timeout: float | None = None) -> dict:
        self._threads[task_id].join(timeout)
        return self.tasks[task_id - 1]

    def cancel_all_async_tasks(self) -> None:
        """Cancel running tasks via their Spark job groups."""
        for t in self.tasks:
            if t["status"] == "running":
                self.spark.sparkContext.cancelJobGroup(f"async_task_{t['jobid']}")
                t["status"] = "canceled"

    def tasks_df(self) -> DataFrame:
        """The ``lantern.tasks`` table view."""
        return self.spark.createDataFrame(
            [
                (
                    t["jobid"], t["query"], t["pg_cron_job_name"], t["status"],
                    t["duration_s"], t["error_message"], t["row_count"],
                )
                for t in self.tasks
            ],
            "jobid int, query string, pg_cron_job_name string, status string, "
            "duration_s double, error_message string, row_count bigint",
        )
