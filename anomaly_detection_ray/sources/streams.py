"""Labeled synthetic event streams — FIXTURES.md F3.

Mirrors the reference's cosine-wave generator
(``/root/reference/dataGeneration/generate-cosine-data-multi-entity.py:40-47``:
cosine + uniform noise, ×5 spikes with probability 0.005) and the
labeled e2e datasets (``src/test/resources/org/opensearch/ad/e2e/data/
synthetic.data``/``.label``). Pure function of the seed.

Two shapes:
- ``generate_interval_stream``: one row per (entity, window) with a
  ``value`` column + ``is_anomaly_truth`` label — detector-stage input.
- raw-event form via ``events_per_window > 1``: several raw events per
  window so the window_aggregate stage is exercised too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BASE_MS = 1_700_000_400_000  # fixed epoch base (no wall clock); multiple of 600 s so generator windows align with detector windows


def generate_interval_stream(
    n_entities: int = 20,
    n_windows: int = 256,
    interval_s: int = 600,
    seed: int = 42,
    anomaly_prob: float = 0.005,
    spike_factor: float = 5.0,
    missing_prob: float = 0.0,
    events_per_window: int = 1,
    amplitude: float = 100.0,
    noise: float = 5.0,
    period: int = 48,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows_e, rows_ts, rows_v, rows_label = [], [], [], []
    for e in range(n_entities):
        phase = rng.uniform(0, 2 * np.pi)
        amp = amplitude * rng.uniform(0.5, 1.5)
        base = amp * 2.0
        i = np.arange(n_windows)
        vals = base + amp * np.cos(2 * np.pi * i / period + phase)
        is_anom = rng.random(n_windows) < anomaly_prob
        is_anom[: period * 2] = False  # warm-up region stays clean
        vals = np.where(is_anom, vals * spike_factor, vals)
        keep = rng.random(n_windows) >= missing_prob
        for w in np.flatnonzero(keep):
            wstart = BASE_MS + int(w) * interval_s * 1000
            for k in range(events_per_window):
                ts = wstart + int((k + 0.5) * interval_s * 1000 / events_per_window)
                rows_e.append(f"entity{e:03d}")
                rows_ts.append(ts)
                rows_v.append(float(vals[w] + rng.uniform(-noise, noise)))
                rows_label.append(bool(is_anom[w]))
    return pa.table(
        {
            "entity": pa.array(rows_e),
            "ts": pa.array(np.asarray(rows_ts, dtype="int64")).cast(pa.timestamp("ms")),
            "value": pa.array(rows_v),
            "is_anomaly_truth": pa.array(rows_label),
        }
    )
