"""Model checkpointing — the analogue of ``ADCheckpointDao.java:60-591``.

Models are pickled per model-id under ``checkpoint_dir`` with a JSON
manifest (sha256, n_points, last_window_end — the lineage the north
rule asks for). A scoring pass restores each model it touches and
re-saves after processing, so a second pipeline run over later windows
continues streams instead of retraining (C6 semantics); restoring and
reprocessing the same windows is idempotent because out-of-order
samples are dropped (§2.F ordering rule).

Model ids can contain characters unsafe for filenames, so files are
keyed by sha256(model_id).

Blobs are stamped with a ``format_version`` (the reference keeps golden
checkpoints of every historical schema and reads them all —
``ADCheckpointDao.java:60-138`` legacy-JSON handling,
``src/test/resources/.../checkpoint_1..4.json``): blobs WITHOUT the
field are version 1 (the pre-stamp shape, still the current layout), a
known version loads, an unknown/newer version refuses with a clear
message instead of mis-deserializing a running job's state.
"""

from __future__ import annotations

import json
import os
import pickle

from ..functions.hashing import sha256_hex
from .model import TRCFModel

# bump when the state-dict layout changes; add a migration branch in
# load_state for every version this reader still accepts
FORMAT_VERSION = 1


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, model_id: str) -> str:
        # two-level fan-out by hash prefix: 1M models in one flat dir
        # makes listing/GC and many filesystems miserable; 256 shards
        # keep each directory ~4k files at that scale. Side-effect free:
        # only save_state() creates the shard dir, so pure reads (cache
        # misses, profile lookups) never pollute the store.
        h = sha256_hex(model_id)
        return os.path.join(self.root, h[:2], h[:32] + ".pkl")

    # ---- generic state blobs (shared by the AD and forecast sides) ----

    def load_state(self, model_id: str) -> dict | None:
        p = self._path(model_id)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            state = pickle.load(f)
        if state.get("model_id") != model_id:
            return None  # hash-prefix collision — treat as cold start
        # BWC: a blob without the stamp predates versioning = format 1,
        # which is still the live layout — read it as-is. An UNKNOWN
        # version must refuse loudly (silently mis-reading a newer
        # engine's state would corrupt a running job), never cold-start.
        version = int(state.get("format_version", 1))
        if version != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint for {model_id!r} has format_version={version}; "
                f"this engine reads version {FORMAT_VERSION} — upgrade the "
                "engine or re-train the model"
            )
        return state

    def save_state(self, model_id: str, state: dict, n_points: int | None = None,
                   last_window_end: int | None = None) -> dict:
        p = self._path(model_id)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        state = dict(state, model_id=model_id, format_version=FORMAT_VERSION)
        blob = pickle.dumps(state, protocol=pickle.HIGHEST_PROTOCOL)
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, p)
        meta = {
            "model_id": model_id,
            "format_version": FORMAT_VERSION,
            "sha256": sha256_hex(blob),
            "n_points": n_points,
            "last_window_end": last_window_end,
            "bytes": len(blob),
        }
        meta_tmp = f"{p}.json.tmp.{os.getpid()}"
        with open(meta_tmp, "w") as f:
            json.dump(meta, f)
        os.replace(meta_tmp, p + ".json")
        return meta

    # ---- TRCF models ----

    def load(self, model_id: str) -> TRCFModel | None:
        state = self.load_state(model_id)
        return TRCFModel.from_state(state) if state is not None else None

    def save(self, model: TRCFModel) -> dict:
        return self.save_state(
            model.model_id, model.to_state(),
            n_points=model.n_points, last_window_end=model.last_window_end,
        )

    def gc(self, before_window_end_ms: int) -> int:
        """E3 retention cleanup (``ad/cluster/diskcleanup/*``, 3-day TTL
        hourly in the reference): drop checkpoints whose stream hasn't
        advanced past the cutoff. Returns the number removed."""
        import glob

        removed = 0
        for meta_path in glob.glob(os.path.join(self.root, "*", "*.pkl.json")):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            last = meta.get("last_window_end")
            if last is not None and last < before_window_end_ms:
                pkl = meta_path[: -len(".json")]
                for p in (pkl, meta_path):
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        pass
                removed += 1
        return removed
