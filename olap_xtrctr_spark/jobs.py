"""Async job orchestration: the reference's PENDING→RUNNING→COMPLETED/
FAILED lifecycle (X1/X2, backend/db_runner.py:25-103,
database/migrations/002_jobs_table.sql:5-14) collapsed onto the Spark
driver — a thread pool submits Spark actions; every node-boundary hop
of the reference (Worker → GitHub Actions → Windows runner → SSAS)
disappears.

Job record fields mirror the jobs table: id (uuid), catalog_code,
mdx_query, status, result_data, error_message, created_at/updated_at.
"""
from __future__ import annotations

import json
import os
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame

from .sinks import to_json_result

PENDING, RUNNING, COMPLETED, FAILED = "PENDING", "RUNNING", "COMPLETED", "FAILED"
QUEUED = "QUEUED"   # cross-process dispatch: persisted, no owner yet


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%S")


@dataclass
class Job:
    id: str
    catalog_code: str
    mdx_query: str
    status: str = PENDING
    result_data: Optional[dict[str, Any]] = None
    error_message: Optional[str] = None
    created_at: str = field(default_factory=_now)
    updated_at: str = field(default_factory=_now)

    def to_dict(self) -> dict[str, Any]:
        return {
            "id": self.id, "catalog_code": self.catalog_code,
            "mdx_query": self.mdx_query, "status": self.status,
            "result_data": self.result_data,
            "error_message": self.error_message,
            "created_at": self.created_at, "updated_at": self.updated_at,
        }


class JobRegistry:
    """Job table + background execution.  Thread-safe; the Spark driver is
    safe for concurrent job submission (no COM-thread dance needed —
    reference X3 is obsolete here).

    ``store_dir`` makes the table DURABLE, matching the persistence the
    reference gets from its Postgres jobs table (``result_data JSONB``,
    database/migrations/002_jobs_table.sql:5-14): every status transition
    is written through to ``{store_dir}/{job_id}.json`` (atomic
    write-temp-then-rename), and a new registry over the same directory
    recovers all records — COMPLETED/FAILED verbatim; jobs that were
    PENDING/RUNNING when the process died become FAILED('interrupted by
    engine restart'), since their executing thread did not survive.  One
    tiny driver-side JSON file per job — this is service metadata, not
    data-plane state, so a distributed store would be the wrong tool."""

    def __init__(self, max_workers: int = 4, result_limit: int = 10_000,
                 store_dir: Optional[str] = None):
        self._jobs: dict[str, Job] = {}
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=max_workers,
                                        thread_name_prefix="olap-job")
        self._result_limit = result_limit
        self._store_dir = store_dir
        if store_dir:
            os.makedirs(store_dir, exist_ok=True)
            self._recover()

    def _persist(self, job: Job) -> None:
        if not self._store_dir:
            return
        path = os.path.join(self._store_dir, f"{job.id}.json")
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(job.to_dict(), f)
        os.replace(tmp, path)

    def _recover(self) -> None:
        """QUEUED jobs survive recovery untouched (no process owned them);
        PENDING/RUNNING ones are failed — their executing thread died with
        the process.  Recovery assumes no OTHER live process is mid-run on
        this store (same single-owner assumption the reference's runner
        makes about its claimed rows)."""
        assert self._store_dir is not None
        for fn in sorted(os.listdir(self._store_dir)):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(self._store_dir, fn)) as f:
                    job = Job(**json.load(f))
            except Exception:
                continue        # torn/foreign file: skip, don't crash boot
            if job.status in (PENDING, RUNNING):
                job.status = FAILED
                job.error_message = "interrupted by engine restart"
                job.updated_at = _now()
                self._persist(job)
            self._jobs[job.id] = job

    def submit(self, catalog_code: str, mdx_query: str,
               runner: Callable[[], DataFrame]) -> str:
        """Create a PENDING job and dispatch it.  ``runner`` builds the
        result DataFrame (usually engine.execute(parse_mdx(...)))."""
        job = Job(id=str(uuid.uuid4()), catalog_code=catalog_code,
                  mdx_query=mdx_query)
        with self._lock:
            self._jobs[job.id] = job
            self._persist(job)
        self._pool.submit(self._run, job.id, runner)
        return job.id

    # ---- cross-process dispatch (reference v3: Worker enqueues a row,
    # a separate runner process claims and executes it —
    # workers/api/src/routes/jobs.ts:45-112, backend/db_runner.py:25-103;
    # here the shared jobs directory plays the Postgres table) ----------

    def enqueue(self, catalog_code: str, mdx_query: str) -> str:
        """Submitter side: persist a QUEUED job carrying only the query
        text (the portable payload — no callable crosses the boundary)
        and return immediately.  A worker process over the same
        ``store_dir`` picks it up via :meth:`run_queued`."""
        if not self._store_dir:
            raise ValueError("enqueue() requires a store_dir "
                             "(cross-process dispatch is disk-backed)")
        job = Job(id=str(uuid.uuid4()), catalog_code=catalog_code,
                  mdx_query=mdx_query, status=QUEUED)
        with self._lock:
            self._jobs[job.id] = job
            self._persist(job)
        return job.id

    def run_queued(self, executor: Callable[[str, str], DataFrame],
                   max_jobs: Optional[int] = None) -> int:
        """Worker side: scan the shared store for QUEUED jobs, claim each
        atomically (``O_EXCL`` claim file — exactly one competing worker
        wins a job, the reference's row-level claim), execute via
        ``executor(catalog_code, mdx_query)`` and write the terminal
        status through the store where the submitting process polls it.
        Returns the number of jobs executed."""
        assert self._store_dir is not None, "run_queued requires store_dir"
        n = 0
        for fn in sorted(os.listdir(self._store_dir)):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(self._store_dir, fn)) as f:
                    rec = json.load(f)
            except Exception:
                continue
            if rec.get("status") != QUEUED:
                continue
            claim = os.path.join(self._store_dir, rec["id"] + ".claim")
            try:
                os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            except FileExistsError:
                continue                    # another worker won this job
            job = Job(**rec)
            with self._lock:
                self._jobs[job.id] = job
            self._run(job.id,
                      lambda j=job: executor(j.catalog_code, j.mdx_query))
            n += 1
            if max_jobs is not None and n >= max_jobs:
                break
        return n

    def _update(self, job_id: str, **kw) -> None:
        with self._lock:
            job = self._jobs[job_id]
            for k, v in kw.items():
                setattr(job, k, v)
            job.updated_at = _now()
            self._persist(job)

    def _run(self, job_id: str, runner: Callable[[], DataFrame]) -> None:
        self._update(job_id, status=RUNNING)
        t0 = time.time()
        try:
            df = runner()
            result = to_json_result(df, limit=self._result_limit)
            result["duration_seconds"] = round(time.time() - t0, 3)
            self._update(job_id, status=COMPLETED, result_data=result)
        except Exception as exc:  # error path mirrors db_runner.py:92-103
            self._update(job_id, status=FAILED, error_message=str(exc)[:2000])

    def get(self, job_id: str) -> Optional[dict[str, Any]]:
        with self._lock:
            job = self._jobs.get(job_id)
            if (self._store_dir is not None
                    and (job is None
                         or job.status not in (COMPLETED, FAILED))):
                # non-terminal + disk-backed: another process may have
                # progressed the job — read through the shared store
                path = os.path.join(self._store_dir, f"{job_id}.json")
                try:
                    with open(path) as f:
                        job = Job(**json.load(f))
                    self._jobs[job_id] = job
                except Exception:
                    pass        # keep the in-memory view on torn reads
            return job.to_dict() if job else None

    def list(self, limit: int = 50) -> list[dict[str, Any]]:
        with self._lock:
            jobs = sorted(self._jobs.values(),
                          key=lambda j: j.created_at, reverse=True)
            return [j.to_dict() for j in jobs[:limit]]

    def wait(self, job_id: str, timeout: float = 60.0,
             poll: float = 0.1) -> dict[str, Any]:
        """Poll-for-completion (X2; the reference polls every 2 s)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            job = self.get(job_id)
            if job and job["status"] in (COMPLETED, FAILED):
                return job
            time.sleep(poll)
        raise TimeoutError(f"job {job_id} still running after {timeout}s")

    def shutdown(self) -> None:
        self._pool.shutdown(wait=False)
