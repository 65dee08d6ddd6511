"""Bounded in-actor model cache with evict-to-checkpoint — the analogue
of the reference's ``PriorityCache`` (``PriorityCache.java:68-303``:
memory-bounded shared cache, LRU-flavored eviction, evicted entity
models persist to the checkpoint index and restore on re-touch).

A scoring actor that serves many model-ids across calls (realtime ticks,
streaming groups) holds at most ``max_models`` TRCF models in memory;
touching one beyond the bound evicts the least-recently-used model to
the checkpoint store first, so results are byte-identical whether or not
a model ever left memory (tested). Without a user checkpoint dir the
evictions spill to a private temp store — the spill path of the
reference's cache, not durable realtime state.
"""

from __future__ import annotations

import tempfile
from collections import OrderedDict

from ..config import DetectorConfig
from .checkpoint import CheckpointStore
from .model import TRCFModel


class ModelCache:
    def __init__(self, config: DetectorConfig, store: CheckpointStore | None = None,
                 max_models: int = 1024):
        self.config = config
        self.store = store
        self.max_models = int(max_models)
        self._spill: CheckpointStore | None = None
        self._lru: OrderedDict[str, TRCFModel] = OrderedDict()
        self.n_evictions = 0

    def _spill_store(self) -> CheckpointStore:
        if self.store is not None:
            return self.store
        if self._spill is None:
            # TemporaryDirectory cleans itself up on finalization, so
            # long-lived scoring actors don't leak spilled model pickles
            self._spill_dir = tempfile.TemporaryDirectory(prefix="adr_model_spill_")
            self._spill = CheckpointStore(self._spill_dir.name)
        return self._spill

    def get(self, model_id: str) -> TRCFModel:
        """Cached model, else restore from checkpoint/spill, else cold
        start. Marks the model most-recently-used."""
        m = self._lru.pop(model_id, None)
        if m is None:
            if self.store is not None:
                m = self.store.load(model_id)
            if m is None and self._spill is not None:
                m = self._spill.load(model_id)
            if m is None:
                m = TRCFModel(self.config, model_id)
        self._lru[model_id] = m
        self._enforce_bound()
        return m

    def _enforce_bound(self) -> None:
        while len(self._lru) > self.max_models:
            victim_id, victim = self._lru.popitem(last=False)
            self._spill_store().save(victim)
            self.n_evictions += 1

    def checkpoint(self, model_id: str) -> None:
        """Persist a model after processing (durable store only — the
        model also stays cached until evicted)."""
        if self.store is not None and model_id in self._lru:
            self.store.save(self._lru[model_id])

    def __len__(self) -> int:
        return len(self._lru)
