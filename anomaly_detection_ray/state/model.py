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
        self.forest = RCForest(
            c.num_trees, c.sample_size, seed=self._seed, time_decay=c.time_decay
        )
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

    def process(self, features: np.ndarray, window_end_ms: int) -> dict | None:
        """Process one (features, window) sample → result dict, or None
        when the sample was dropped as out-of-order. Thin wrapper over
        :meth:`process_many` (one stream-semantics implementation — the
        two used to be hand-kept copies and their bit-identity rested on
        a test alone)."""
        out = self.process_many(np.asarray(features, dtype=np.float64)[None, :],
                                np.asarray([window_end_ms], dtype=np.int64))
        if not out["keep"][0]:
            return None
        return {
            "anomaly_score": float(out["anomaly_score"][0]),
            "anomaly_grade": float(out["anomaly_grade"][0]),
            "confidence": float(out["confidence"][0]),
            "is_anomaly": bool(out["is_anomaly"][0]),
        }

    # ---- batched streaming (the fast path used by ScoreGroups) ----

    def process_many(self, features: np.ndarray, window_ends: np.ndarray, detailed: bool = False) -> dict:
        """Process many in-order (features, window_end) samples at once —
        bit-identical to calling :meth:`process` per row (the forest's
        chunked scoring is batching-independent by construction), but the
        forest work runs vectorized across points.

        → dict of arrays aligned to the input rows: ``keep`` (False for
        out-of-order drops), score/grade/confidence/is_anomaly; with
        ``detailed=True`` also per-feature ``expected`` (the forest's
        leaf-consensus normal value for the current window,
        ``ThresholdingResult.java:323-374`` expected_values analogue),
        ``attribution`` (per-feature share of the anomaly score,
        relevant_attribution), and ``past`` (previous window's actual
        values)."""
        c = self.config
        features = np.asarray(features, dtype=np.float64)
        window_ends = np.asarray(window_ends, dtype=np.int64)
        n = len(features)
        F = features.shape[1] if n else len(c.feature_names())
        s = c.shingle_size
        interval_ms = c.interval_s * 1000
        score_a = np.zeros(n)
        grade_a = np.zeros(n)
        conf_a = np.zeros(n)
        keep = np.zeros(n, dtype=bool)
        if detailed:
            exp_a = np.full((n, F), np.nan)
            attr_a = np.zeros((n, F))
            past_a = np.full((n, F), np.nan)

        fed: list[np.ndarray] = []
        emit: list[tuple[int, int]] = []  # (input row, index into fed)

        def append_fed(pt: np.ndarray) -> None:
            fed.append(pt)
            self.last_point = pt

        def flush() -> None:
            nonlocal fed, emit
            m = len(fed)
            if not m:
                return
            fed_arr = np.asarray(fed)
            prior = list(self.shingle)[-(s - 1):] if s > 1 else []
            j0 = max(0, s - 1 - len(prior))
            raw = np.zeros(m)
            if detailed:
                exp_f = np.full((m, F), np.nan)
                attr_f = np.zeros((m, F))
            if m - j0 > 0:
                if s > 1:
                    from numpy.lib.stride_tricks import sliding_window_view

                    seq = np.vstack([*prior, fed_arr]) if prior else fed_arr
                    win = sliding_window_view(seq, (s, F)).reshape(-1, s * F)
                    start = len(prior) + j0 - (s - 1)
                    sh = win[start : start + (m - j0)]
                else:
                    sh = fed_arr[j0:]
                if detailed:
                    r, at, ex = self.forest.score_then_observe_batch(sh, detailed=True)
                    at3 = at.reshape(-1, s, F)
                    attr_f[j0:] = at3.sum(axis=1)
                    exp_f[j0:] = ex[:, -F:]
                else:
                    r = self.forest.score_then_observe_batch(sh)
                raw[j0:] = r
            start_np = self.n_points
            self.n_points = start_np + m
            npts = start_np + np.arange(1, m + 1)
            warm = npts < c.model_output_after()
            raw[warm] = 0.0
            for row, j in emit:
                sc = float(raw[j])
                g = self.threshold.grade(sc)
                conf = 0.0 if warm[j] else self.threshold.confidence()
                # Feed only non-anomalous, post-warm-up scores to the ECDF
                # so it estimates the NORMAL score distribution: an
                # anomaly's shingle tail would otherwise mask subsequent
                # anomalies' ranks. (The reference's HybridThresholdingModel
                # updates unconditionally but sits behind the RCF library's
                # own expected-score thresholder; this is our equivalent.)
                if sc > 0.0 and g == 0.0:
                    self.threshold.update(sc)
                score_a[row] = sc
                grade_a[row] = g
                conf_a[row] = conf
                keep[row] = True
                if detailed:
                    exp_a[row] = exp_f[j]
                    attr_a[row] = attr_f[j]
                    if j > 0:
                        past_a[row] = fed_arr[j - 1]
                    elif prior:
                        past_a[row] = prior[-1]
            for p in fed_arr:
                self.shingle.append(p)
            fed = []
            emit = []

        for i in range(n):
            we = int(window_ends[i])
            if self.last_window_end is not None:
                if we <= self.last_window_end:
                    self.n_dropped_ooo += 1
                    continue
                gap = (we - self.last_window_end) // interval_ms - 1
                if gap > self.reset_gap:
                    flush()
                    self._new_state()
                elif gap > 0:
                    n_fill = min(int(gap), self.max_impute_gap)
                    if c.imputation == "linear" and self.last_point is not None:
                        end = features[i].copy()
                        bad = ~np.isfinite(end)
                        end[bad] = self.last_point[bad]
                        startp = self.last_point.copy()
                        for k in range(n_fill):
                            frac = (k + 1) / (float(gap) + 1.0)
                            append_fed(startp + frac * (end - startp))
                    else:
                        nanp = np.full(F, np.nan)
                        for _ in range(n_fill):
                            append_fed(self._fill(nanp))
            self.last_window_end = we
            emit.append((i, len(fed)))
            append_fed(self._fill(features[i]))
        flush()

        out = {
            "anomaly_score": score_a,
            "anomaly_grade": grade_a,
            "confidence": conf_a,
            "is_anomaly": grade_a > 0.0,
            "keep": keep,
        }
        if detailed:
            out["expected"] = exp_a
            out["attribution"] = attr_a
            out["past"] = past_a
        return out

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
