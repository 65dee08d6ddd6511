"""Detector/forecaster config + job document store — the CRUD surface.

The reference keeps configs in the ``.opendistro-anomaly-detectors``
system index and job docs in ``...-anomaly-detector-jobs``, with 18
REST actions over them (create/update/get/delete/search detector, job
start/stop — `/root/reference/src/main/java/org/opensearch/ad/rest/`,
SURVEY.md §2.G). Rebuilt as a filesystem JSON store with the same
semantics:

- **deterministic ids**: sha1 of the detector name (the reference
  auto-generates ids; determinism here per the no-RNG rule) or a
  caller-provided id;
- **name uniqueness** on create, like
  ``AbstractAnomalyDetectorActionHandler``'s duplicate-name search;
- **optimistic concurrency** on update via a ``seq_no`` the caller
  must echo (`if_seq_no`/`if_primary_term` in the REST layer) —
  a stale seq_no raises :class:`ConflictError`;
- **delete refuses while the job is enabled**
  (``DeleteConfigTransportAction`` checks the job doc first) and can
  cascade to results/checkpoints the way the reference's
  delete-by-query cleanup does;
- **search** evaluates simple field filters + name substring over all
  configs (tiny table — config counts are thousands, not billions).

Writes are atomic (tmp + replace) so a crashed writer never leaves a
torn config; everything is plain JSON on shared storage, readable by
every Ray worker without coordination.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict

from ..config import DetectorConfig, FeatureSpec


class ConflictError(RuntimeError):
    """Optimistic-concurrency failure (stale seq_no)."""


class JobRunningError(RuntimeError):
    """Delete/update refused while the job is enabled."""


def config_to_json(config: DetectorConfig) -> dict:
    return asdict(config)


def config_from_json(doc: dict) -> DetectorConfig:
    doc = dict(doc)
    doc["features"] = tuple(
        f if isinstance(f, FeatureSpec) else FeatureSpec(**f)
        for f in doc.get("features", ())
    )
    doc["category_fields"] = tuple(doc.get("category_fields", ()))
    rules = doc.get("rules", ())
    if rules:
        from ..functions.rules import Rule

        doc["rules"] = tuple(r if not isinstance(r, dict) else Rule(**r) for r in rules)
    else:
        doc["rules"] = ()
    return DetectorConfig(**doc)


def _atomic_write(path: str, doc: dict) -> None:
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


class ConfigStore:
    def __init__(self, root: str):
        self.root = root
        self.configs_dir = os.path.join(root, "configs")
        self.jobs_dir = os.path.join(root, "jobs")
        os.makedirs(self.configs_dir, exist_ok=True)
        os.makedirs(self.jobs_dir, exist_ok=True)

    # ---- config documents ----

    def _path(self, config_id: str) -> str:
        return os.path.join(self.configs_dir, f"{config_id}.json")

    @staticmethod
    def derive_id(name: str) -> str:
        return "config-" + hashlib.sha1(name.encode()).hexdigest()[:16]

    def create(self, name: str, config: DetectorConfig | dict,
               config_id: str | None = None) -> dict:
        """Index a new config; rejects duplicate names AND duplicate ids."""
        for doc in self.iter_docs():
            if doc["name"] == name:
                raise ValueError(f"detector name {name!r} already exists "
                                 f"(id {doc['_id']})")
        cid = config_id or self.derive_id(name)
        path = self._path(cid)
        if os.path.exists(path):
            raise ValueError(f"config id {cid!r} already exists")
        body = config_to_json(config) if isinstance(config, DetectorConfig) else dict(config)
        doc = {"_id": cid, "seq_no": 0, "name": name, "config": body}
        _atomic_write(path, doc)
        return doc

    def get(self, config_id: str) -> dict:
        with open(self._path(config_id)) as f:
            return json.load(f)

    def get_config(self, config_id: str) -> DetectorConfig:
        return config_from_json(self.get(config_id)["config"])

    def update(self, config_id: str, config: DetectorConfig | dict,
               if_seq_no: int | None = None, name: str | None = None) -> dict:
        """Replace the config body; ``if_seq_no`` must match the stored
        seq_no when given (optimistic concurrency). Updating a config
        whose job is running is refused, like the reference's update
        path (job must be stopped so models restart cleanly)."""
        cur = self.get(config_id)
        if if_seq_no is not None and cur["seq_no"] != if_seq_no:
            raise ConflictError(
                f"seq_no {if_seq_no} != current {cur['seq_no']} for {config_id}"
            )
        if self.job_enabled(config_id):
            raise JobRunningError(f"stop the job for {config_id} before updating")
        if name is not None and name != cur["name"]:
            # the reference's update handler re-checks name uniqueness
            # (it would otherwise let two configs share a name that
            # create() had rejected)
            for doc in self.iter_docs():
                if doc["_id"] != config_id and doc["name"] == name:
                    raise ValueError(f"detector name {name!r} already exists "
                                     f"(id {doc['_id']})")
        body = config_to_json(config) if isinstance(config, DetectorConfig) else dict(config)
        doc = {
            "_id": config_id,
            "seq_no": cur["seq_no"] + 1,
            "name": name or cur["name"],
            "config": body,
        }
        _atomic_write(self._path(config_id), doc)
        return doc

    def delete(self, config_id: str, *, results_dir: str | None = None,
               checkpoint_dir: str | None = None) -> None:
        """Delete a config; refused while its job is enabled
        (``DeleteConfigTransportAction`` semantics). ``results_dir`` /
        ``checkpoint_dir`` cascade like the reference's delete-by-query
        cleanup of result/checkpoint indices."""
        if self.job_enabled(config_id):
            raise JobRunningError(f"stop the job for {config_id} before deleting")
        os.remove(self._path(config_id))
        job = os.path.join(self.jobs_dir, f"{config_id}.json")
        if os.path.exists(job):
            os.remove(job)
        for d in (results_dir, checkpoint_dir):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    def iter_docs(self):
        for fn in sorted(os.listdir(self.configs_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.configs_dir, fn)) as f:
                    yield json.load(f)

    def search(self, name_contains: str | None = None, **field_equals) -> list[dict]:
        """Simple config search: name substring + exact field matches on
        the config body (the reference's search API over the config
        index, sans full DSL — config tables are tiny)."""
        out = []
        for doc in self.iter_docs():
            if name_contains is not None and name_contains not in doc["name"]:
                continue
            if any(doc["config"].get(k) != v for k, v in field_equals.items()):
                continue
            out.append(doc)
        return out

    # ---- job documents (start/stop; AnomalyDetectorJob analogue) ----

    def _job_path(self, config_id: str) -> str:
        return os.path.join(self.jobs_dir, f"{config_id}.json")

    def job_enabled(self, config_id: str) -> bool:
        p = self._job_path(config_id)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return bool(json.load(f).get("enabled", False))

    def start_job(self, config_id: str, *, tick: int = 0) -> dict:
        """Enable the job doc (idempotent). ``tick`` is the logical
        enable point (no wall clock — determinism rule); the scheduler
        CLI advances it per tick."""
        self.get(config_id)  # must exist
        doc = {"_id": config_id, "enabled": True, "enabled_tick": int(tick),
               "disabled_tick": None}
        _atomic_write(self._job_path(config_id), doc)
        return doc

    def stop_job(self, config_id: str, *, tick: int = 0) -> dict:
        p = self._job_path(config_id)
        doc = {"_id": config_id, "enabled": False, "enabled_tick": None,
               "disabled_tick": int(tick)}
        if os.path.exists(p):
            with open(p) as f:
                old = json.load(f)
            doc["enabled_tick"] = old.get("enabled_tick")
        _atomic_write(p, doc)
        return doc
