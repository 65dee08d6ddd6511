"""Historical-analysis task documents — the ADTask state machine.

The reference tracks every historical (batch) run in the
``.opendistro-anomaly-detection-state`` index: an ADTask doc advances
CREATED → INIT → RUNNING → FINISHED/FAILED/STOPPED with
``task_progress``/``init_progress`` updated per piece and resume
metadata (``ad/task/ADTaskManager.java``, ``ADBatchTaskRunner.java:
1271-1331``; SURVEY.md §3.2). Our batch pipeline has no pieces —
Ray streams the whole range and per-partition manifests carry resume —
so the doc tracks the RUN-level lifecycle: a deterministic task id
(config ⊕ date-range hash), state transitions with a monotonic
``seq``, the result row count on FINISH, the error string on FAIL.
Plain JSON on shared storage, atomic writes, no wall clock (callers
pass logical ticks if they want timestamps).
"""

from __future__ import annotations

import hashlib
import json
import os

VALID_STATES = ("CREATED", "INIT", "RUNNING", "FINISHED", "FAILED", "STOPPED")
# legal transitions, reference ADTaskState shape
_NEXT = {
    "CREATED": {"INIT", "RUNNING", "FAILED", "STOPPED"},
    "INIT": {"RUNNING", "FAILED", "STOPPED"},
    "RUNNING": {"FINISHED", "FAILED", "STOPPED"},
    "FINISHED": set(),
    "FAILED": set(),
    "STOPPED": set(),
}


class TaskStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @staticmethod
    def task_id(config_id: str, time_range_ms=None) -> str:
        key = f"{config_id}|{tuple(time_range_ms) if time_range_ms else 'realtime'}"
        return "task-" + hashlib.sha1(key.encode()).hexdigest()[:16]

    def _path(self, task_id: str) -> str:
        return os.path.join(self.root, f"{task_id}.json")

    def create(self, config_id: str, task_type: str = "historical",
               time_range_ms=None) -> dict:
        """Idempotent create: re-running the same (config, range) reuses
        the doc — a FINISHED task stays finished (the rerun is served by
        the idempotent pipeline), any other state resets to CREATED (the
        reference restarts non-finished tasks)."""
        tid = self.task_id(config_id, time_range_ms)
        path = self._path(tid)
        if os.path.exists(path):
            doc = self.get(tid)
            if doc["state"] == "FINISHED":
                return doc
        doc = {
            "_id": tid,
            "config_id": config_id,
            "task_type": task_type,
            "time_range_ms": list(time_range_ms) if time_range_ms else None,
            "state": "CREATED",
            "seq": 0,
            "n_result_rows": None,
            "error": None,
            # per-piece progress, mirroring the reference's ADTask fields
            # (ADBatchTaskRunner.java:1271-1301 updates task_progress /
            # init_progress and the current-piece resume marker after
            # every scored piece)
            "task_progress": 0.0,
            "init_progress": 0.0,
            "current_piece": None,
        }
        self._write(doc)
        return doc

    def get(self, task_id: str) -> dict:
        with open(self._path(task_id)) as f:
            return json.load(f)

    def transition(self, task_id: str, state: str, *, n_result_rows: int | None = None,
                   error: str | None = None) -> dict:
        if state not in VALID_STATES:
            raise ValueError(f"unknown task state {state!r}")
        doc = self.get(task_id)
        if state not in _NEXT[doc["state"]]:
            raise ValueError(f"illegal transition {doc['state']} → {state}")
        doc["state"] = state
        doc["seq"] += 1
        if state == "FINISHED":
            doc["task_progress"] = 1.0
        if n_result_rows is not None:
            doc["n_result_rows"] = int(n_result_rows)
        if error is not None:
            doc["error"] = str(error)
        self._write(doc)
        return doc

    def update_progress(self, task_id: str, *, task_progress: float | None = None,
                        init_progress: float | None = None,
                        current_piece=None) -> dict:
        """Per-piece progress update while the task is live (CREATED/
        INIT/RUNNING). Progress is clamped to [0, 1] and MONOTONE —
        a late out-of-order update can't walk it backwards (the
        reference only ever advances these fields)."""
        doc = self.get(task_id)
        if doc["state"] in ("FINISHED", "FAILED", "STOPPED"):
            raise ValueError(f"cannot update progress of a {doc['state']} task")
        if task_progress is not None:
            doc["task_progress"] = max(doc.get("task_progress") or 0.0,
                                       min(1.0, float(task_progress)))
        if init_progress is not None:
            doc["init_progress"] = max(doc.get("init_progress") or 0.0,
                                       min(1.0, float(init_progress)))
        if current_piece is not None:
            doc["current_piece"] = list(current_piece)
        doc["seq"] += 1
        self._write(doc)
        return doc

    def list(self, config_id: str | None = None, state: str | None = None) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(self.root, fn)) as f:
                doc = json.load(f)
            if config_id is not None and doc["config_id"] != config_id:
                continue
            if state is not None and doc["state"] != state:
                continue
            out.append(doc)
        return out

    def _write(self, doc: dict) -> None:
        path = self._path(doc["_id"])
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
