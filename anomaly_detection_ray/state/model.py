"""TRCF model: forest + thresholder + shingle buffer + stream semantics.

The analogue of the reference's per-model-id
``ThresholdedRandomCutForest`` state plus the streaming rules around it
(SURVEY.md §2.C1–C4, §2.F):

- strict in-order processing; out-of-order windows are dropped with a
  counter (``RealTimeInferencer.java:292-304``),
- gaps of 1..``max_impute_gap`` missing intervals are filled with the
  configured imputation policy and fed to the model without emitting
  results (the reference backfills 2×..10000× interval by query,
  ``RealTimeInferencer.java:174-196``); larger gaps reset the model
  (re-cold-start, :199-209),
- scores are emitted only after ``output_after = max(shingle, 32)``
  points (``ADColdStart.java:181-226`` outputAfter),
- NaN features are imputed per ``ImputationOption`` (B7),
- grade/confidence from the ECDF thresholder (C3); the sketch is
  updated *after* grading so a score never ranks against itself.

Determinism: model seed = config.seed ⊕ murmur3(model_id) — two runs on
the same ordered input produce byte-identical results (the reference
preview's ``randomSeed(0)`` promise, ``ADModelManager.java:486-516``).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from ..config import DetectorConfig
from ..functions.hashing import murmur3_x64_128
from .rcf import RCForest
from .threshold import ThresholdModel


class TRCFModel:
    def __init__(self, config: DetectorConfig, model_id: str):
        self.config = config
        self.model_id = model_id
        seed = config.seed ^ murmur3_x64_128(model_id.encode())[0]
        self._seed = seed
        self._new_state()

    def _new_state(self) -> None:
        c = self.config
        self.forest = RCForest(c.num_trees, c.sample_size, seed=self._seed)
        self.threshold = ThresholdModel(c.min_score, c.threshold_p, c.max_sketch_size)
        self.shingle: deque[np.ndarray] = deque(maxlen=c.shingle_size)
        self.last_window_end: int | None = None
        self.last_point: np.ndarray | None = None
        self.n_points = 0
        self.n_dropped_ooo = 0
        self.max_impute_gap = 32
        self.reset_gap = 10_000  # ×interval → re-cold-start (TimeSeriesSettings.java:250)

    # ---- streaming ----

    def _fill(self, point: np.ndarray) -> np.ndarray:
        c = self.config
        point = np.asarray(point, dtype=np.float64).copy()
        m = ~np.isfinite(point)
        if m.any():
            if c.imputation == "zero":
                point[m] = 0.0
            elif c.imputation == "fixed":
                point[m] = c.fixed_value
            elif c.imputation in ("previous", "linear"):
                # 'linear' degrades to previous-fill HERE because a NaN
                # feature inside an observed point has no known future
                # endpoint in a streaming pass; true interpolation happens
                # in the gap-backfill path of process(), where both
                # endpoints exist (LinearUpdatingImputer semantics).
                if self.last_point is not None:
                    point[m] = self.last_point[m]
                else:
                    point[m] = 0.0
            else:
                raise ValueError(f"unknown imputation {c.imputation!r}")
        return point

    def _advance(self, point: np.ndarray) -> float:
        """Feed one in-order point; returns raw anomaly score (0 while warming)."""
        self.shingle.append(point)
        self.last_point = point
        self.n_points += 1
        if len(self.shingle) < self.config.shingle_size:
            return 0.0
        shingled = np.concatenate(self.shingle)
        score = self.forest.score_and_update(shingled)
        if self.n_points < self.config.model_output_after():
            return 0.0
        return score

    def process(self, features: np.ndarray, window_end_ms: int) -> dict | None:
        """Process one (features, window) sample → result dict, or None
        when the sample was dropped as out-of-order."""
        interval_ms = self.config.interval_s * 1000
        if self.last_window_end is not None:
            if window_end_ms <= self.last_window_end:
                self.n_dropped_ooo += 1
                return None
            gap = (window_end_ms - self.last_window_end) // interval_ms - 1
            if gap > self.reset_gap:
                self._new_state()
            elif gap > 0:
                n_fill = min(int(gap), self.max_impute_gap)
                if self.config.imputation == "linear" and self.last_point is not None:
                    # both endpoints are known when backfilling: interpolate
                    # last_point → the incoming point (reference
                    # LinearUpdatingImputer; NaN endpoint dims fall back to
                    # previous-fill since they have no target value)
                    end = np.asarray(features, dtype=np.float64).copy()
                    bad = ~np.isfinite(end)
                    end[bad] = self.last_point[bad]
                    start = self.last_point.copy()
                    for i in range(n_fill):
                        frac = (i + 1) / (float(gap) + 1.0)
                        self._advance(start + frac * (end - start))
                else:
                    nan_point = np.full(len(features), np.nan)
                    for _ in range(n_fill):
                        self._advance(self._fill(nan_point))
        self.last_window_end = window_end_ms

        point = self._fill(features)
        score = self._advance(point)
        grade = self.threshold.grade(score)
        conf = self.threshold.confidence() if self.n_points >= self.config.model_output_after() else 0.0
        # Feed only non-anomalous, post-warm-up scores to the ECDF so it
        # estimates the NORMAL score distribution: an anomaly's shingle
        # tail would otherwise mask subsequent anomalies' ranks. (The
        # reference's HybridThresholdingModel updates unconditionally but
        # sits behind the RCF library's own expected-score thresholder;
        # this is our equivalent guard.)
        if score > 0.0 and grade == 0.0:
            self.threshold.update(score)
        return {
            "anomaly_score": score,
            "anomaly_grade": grade,
            "confidence": conf,
            "is_anomaly": grade > 0.0,
        }

    # ---- serde ----

    def to_state(self) -> dict:
        return {
            "model_id": self.model_id,
            "config": self.config,
            "forest": self.forest,
            "threshold": self.threshold.to_state(),
            "shingle": list(self.shingle),
            "last_window_end": self.last_window_end,
            "last_point": self.last_point,
            "n_points": self.n_points,
        }

    @classmethod
    def from_state(cls, state: dict) -> "TRCFModel":
        m = cls(state["config"], state["model_id"])
        m.forest = state["forest"]
        m.threshold = ThresholdModel.from_state(state["threshold"])
        m.shingle = deque(state["shingle"], maxlen=state["config"].shingle_size)
        m.last_window_end = state["last_window_end"]
        m.last_point = state["last_point"]
        m.n_points = state["n_points"]
        return m
