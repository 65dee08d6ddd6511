"""Streaming forecaster — the Layer-B analogue of the reference's
``forecast/`` side (``forecast/ml/ForecastColdStart.java:113-149`` builds
an ``RCFCaster`` with a ``forecastHorizon``; results carry per-horizon
value + lower/upper bounds, ``forecast/ml/RCFCasterResult.java``).

NOT a port of the AWS RCFCaster: the forecasting core here is
additive Holt-Winters (triple exponential smoothing — level, trend,
seasonal; Winters 1960, public algorithm) with **empirical residual
quantiles** per horizon for the lower/upper bounds — the same
role the caster's calibration plays (bounds widen with horizon as
observed h-step errors accumulate). Deterministic: no RNG at all.

Stream semantics (ordering, gap fill, warm-up) are shared with the
anomaly side via the same conventions: strictly ascending windows,
out-of-order dropped, scores emitted after ``output_after`` points.
"""

from __future__ import annotations

from collections import deque

import numpy as np


class _ErrorBoundForecaster:
    """Shared per-horizon error bookkeeping + bound construction for the
    forecaster backends (one implementation — the round-1 horizon
    off-by-one lived exactly in this logic, so it must not be duplicated
    per backend). Subclasses provide ``_point_forecast()`` and may
    override ``_fallback_half`` (the bound floor before enough observed
    errors exist) and ``_record_on_forecast``."""

    _record_on_forecast = False  # append a pending inside forecast() too?

    def _init_bounds(self, horizon: int, max_error_window: int, confidence: float,
                     record_stride: int = 1) -> None:
        self.horizon = horizon
        self.confidence = confidence
        self.record_stride = max(1, int(record_stride))
        # per-horizon rolling h-step errors: deque of |actual − forecast_h|
        self._errors: list[deque] = [deque(maxlen=max_error_window) for _ in range(horizon)]
        # pending forecasts waiting for their actuals: (made_at_n, values)
        self._pending: deque = deque()

    def _score_pending(self, v: float) -> None:
        """Score pending forecasts against this in-order value: a forecast
        made after observing ``made_at`` points predicts points
        made_at+1, …, so THIS point (the (n_points+1)-th) is horizon step
        h = n_points − made_at + 1 (1-based)."""
        for made_at, fc in self._pending:
            h = self.n_points - made_at + 1
            if 1 <= h <= self.horizon:
                self._errors[h - 1].append(abs(v - fc[h - 1]))
        while self._pending and self.n_points - self._pending[0][0] + 1 >= self.horizon:
            self._pending.popleft()

    def record_forecast(self) -> bool:
        """Cheap per-point bookkeeping: remember this step's point forecast
        so later updates can score h-step errors (no bounds, no
        quantiles). Recorded only at stream positions divisible by
        ``record_stride`` (absolute → split-run deterministic)."""
        if self.n_points % self.record_stride != 0:
            return False
        vals = self._point_forecast()
        if vals is None:
            return False
        self._pending.append((self.n_points, vals))
        return True

    def _fallback_half(self, i: int) -> float:
        return 1e-9 * (i + 1)

    def forecast(self) -> dict | None:
        """→ dict(values, lower, upper, confidence) arrays of len horizon,
        or None while warming up."""
        vals = self._point_forecast()
        if vals is None:
            return None
        q = self.confidence
        half = np.empty(self.horizon)
        last = 0.0
        for i in range(self.horizon):
            errs = self._errors[i]
            if len(errs) >= 5:
                last = float(np.quantile(np.asarray(errs), q))
            half[i] = last if last > 0 else self._fallback_half(i)
        # bounds must not shrink with horizon
        half = np.maximum.accumulate(half)
        if self._record_on_forecast and not (
            self._pending and self._pending[-1][0] == self.n_points
        ):
            # dedupe by stream position: callers that did record_forecast()
            # for this point already hold a pending here, and appending a
            # second would double-count this position's error samples
            self._pending.append((self.n_points, vals.copy()))
        return {
            "values": vals,
            "lower": vals - half,
            "upper": vals + half,
            "confidence": self.confidence,
        }


class RCFForecaster(_ErrorBoundForecaster):
    """Caster-style forecaster on the random cut forest itself — the
    shape of the reference's RCFCaster (``forecast/ml/ForecastColdStart
    .java:113-149`` builds one with a forecastHorizon): the model IS a
    forest over value shingles, and the h-step point forecast is
    ITERATED CONDITIONAL IMPUTATION of the next shingle slot
    (:meth:`~.rcf.RCForest.impute_batch`: walk each tree on the known
    dims, heavier child on the missing dim, leaf consensus). Lower/upper
    bounds use the same empirical per-horizon error quantiles as the
    Holt-Winters backend.

    ``record_stride``: a forecast costs ``horizon`` sequential tree
    walks, so error bookkeeping records pendings only at absolute stream
    positions divisible by the stride (deterministic across run splits);
    every recorded forecast still scores all its horizon slots.
    """

    def __init__(
        self,
        horizon: int = 24,
        shingle: int = 8,
        num_trees: int = 20,
        sample_size: int = 128,
        seed: int = 0,
        time_decay: float = 1.0 / 2560.0,
        output_after: int = 32,
        max_error_window: int = 1024,
        confidence: float = 0.9,
        record_stride: int = 4,
    ):
        from .rcf import RCForest

        self.shingle = max(1, int(shingle))
        self.output_after = output_after
        self._init_bounds(horizon, max_error_window, confidence, record_stride)
        self.forest = RCForest(num_trees, sample_size, seed=seed, time_decay=time_decay)
        self._window: deque = deque(maxlen=self.shingle)
        self.n_points = 0

    def update(self, value: float) -> None:
        v = float(value)
        self._score_pending(v)
        self._window.append(v)
        if len(self._window) == self.shingle:
            self.forest.observe(np.asarray(self._window, dtype=np.float64))
        self.n_points += 1

    def _point_forecast(self) -> np.ndarray | None:
        if self.n_points < max(2, self.output_after) or not self.forest._built:
            return None
        win = list(self._window)
        if len(win) < self.shingle:
            return None
        vals = np.empty(self.horizon)
        miss = np.zeros((1, self.shingle), dtype=bool)
        miss[0, -1] = True
        for i in range(self.horizon):
            x = np.asarray(win[-(self.shingle - 1):] + [0.0] if self.shingle > 1 else [0.0])
            est = float(self.forest.impute_batch(x[None, :], miss)[0, -1])
            vals[i] = est
            win.append(est)
        return vals


class HoltWintersForecaster(_ErrorBoundForecaster):
    """Single-series additive Holt-Winters with per-horizon empirical
    error bounds.

    ``period`` = seasonal length in windows (0/1 disables seasonality);
    ``horizon`` = number of future windows per forecast call.
    """

    def __init__(
        self,
        horizon: int = 24,
        period: int = 0,
        alpha: float = 0.25,
        beta: float = 0.05,
        gamma: float = 0.3,
        output_after: int = 32,
        max_error_window: int = 1024,
        confidence: float = 0.9,
    ):
        self.period = period if period and period > 1 else 0
        self.alpha, self.beta, self.gamma = alpha, beta, gamma
        self.output_after = output_after
        self._init_bounds(horizon, max_error_window, confidence)
        self.level: float | None = None
        self.trend = 0.0
        self.season = np.zeros(self.period) if self.period else None
        self._init_buf: list[float] | None = [] if self.period else None
        self.n_points = 0

    # the round-1 per-point walk called forecast() for bookkeeping and
    # relied on it appending a pending entry — keep that behavior
    _record_on_forecast = True

    def _fallback_half(self, i: int) -> float:
        return (abs(self.trend) + 1e-9) * (i + 1)

    # ---- update ----

    def _season_idx(self, n: int) -> int:
        return n % self.period if self.period else 0

    def update(self, value: float) -> None:
        """Feed one in-order window value."""
        v = float(value)
        self._score_pending(v)

        if self.period and self._init_buf is not None:
            # buffer the first full season: init level = its mean, season =
            # per-slot deviations (standard HW initialization — without it
            # the level chases the wave and convergence is slow/biased)
            self._init_buf.append(v)
            if len(self._init_buf) == self.period:
                arr = np.asarray(self._init_buf)
                self.level = float(arr.mean())
                self.season = arr - self.level
                self._init_buf = None
            self.n_points += 1
            return
        if self.level is None:
            self.level = v
        else:
            s = self.season[self._season_idx(self.n_points)] if self.period else 0.0
            prev_level = self.level
            self.level = self.alpha * (v - s) + (1 - self.alpha) * (self.level + self.trend)
            self.trend = self.beta * (self.level - prev_level) + (1 - self.beta) * self.trend
            if self.period:
                i = self._season_idx(self.n_points)
                self.season[i] = self.gamma * (v - self.level) + (1 - self.gamma) * self.season[i]
        self.n_points += 1

    # ---- forecast ----

    def _point_forecast(self) -> np.ndarray | None:
        """Point forecast for the next ``horizon`` steps — no bounds, no
        quantiles. O(horizon)."""
        if self.level is None or self.n_points < max(2, self.output_after):
            return None  # warming up (incl. first-season init buffering)
        h = np.arange(1, self.horizon + 1, dtype=np.float64)
        vals = self.level + self.trend * h
        if self.period:
            idx = (self.n_points + np.arange(self.horizon)) % self.period
            vals = vals + self.season[idx]
        return vals
