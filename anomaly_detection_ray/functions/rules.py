"""Suppression rules — SURVEY.md §2.B9.

Reimplements the semantics of ``ad/model/Rule.java:1-116`` /
``ThresholdType.java:16-93`` / ``ad/ml/IgnoreSimilarExtractor.java``:
a detector's rules (Action=IGNORE_ANOMALY, conditions over features)
compile to per-feature ignore-near-expected margins; a flagged window is
suppressed when the actual value is within the margin of the expected
value on the rule's side:

- ACTUAL_OVER_EXPECTED_MARGIN:  ignore if 0 < actual−expected ≤ margin
- EXPECTED_OVER_ACTUAL_MARGIN:  ignore if 0 < expected−actual ≤ margin
- ACTUAL_OVER_EXPECTED_RATIO:   ignore if 0 < actual−expected ≤ ratio·|expected|
- EXPECTED_OVER_ACTUAL_RATIO:   ignore if 0 < expected−actual ≤ ratio·|expected|

The reference feeds these thresholds into the RCF library
(``ADColdStart.java:304-324``); here they post-process result rows.
Wiring: set ``DetectorConfig.rules`` and ``ScoreGroups`` applies them
against the scorer's own per-feature expected values
(``{feature}_expected`` columns from the forest's leaf consensus);
``apply_rules`` also accepts any caller-supplied expected column.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

THRESHOLD_TYPES = (
    "actual_over_expected_margin",
    "expected_over_actual_margin",
    "actual_over_expected_ratio",
    "expected_over_actual_ratio",
)


@dataclass(frozen=True)
class Rule:
    feature_name: str
    threshold_type: str
    value: float  # margin (absolute) or ratio (relative)

    def __post_init__(self):
        if self.threshold_type not in THRESHOLD_TYPES:
            raise ValueError(f"unknown threshold type {self.threshold_type!r}")


def suppressed_mask(actual: np.ndarray, expected: np.ndarray, rule: Rule) -> np.ndarray:
    """True where the rule says to ignore the anomaly."""
    actual = np.asarray(actual, dtype=np.float64)
    expected = np.asarray(expected, dtype=np.float64)
    diff = actual - expected
    t = rule.threshold_type
    if t == "actual_over_expected_margin":
        return (diff > 0) & (diff <= rule.value)
    if t == "expected_over_actual_margin":
        return (-diff > 0) & (-diff <= rule.value)
    if t == "actual_over_expected_ratio":
        return (diff > 0) & (diff <= rule.value * np.abs(expected))
    return (-diff > 0) & (-diff <= rule.value * np.abs(expected))


def apply_rules(results, rules: list[Rule], expected_cols: dict[str, str]):
    """pandas DataFrame of result rows → same frame with grades zeroed
    where ANY rule suppresses (rules OR together, like the reference's
    ignore arrays). ``expected_cols`` maps feature_name → column holding
    its expected value."""
    import pandas as pd

    out = results.copy()
    if not rules:
        return out
    mask = np.zeros(len(out), dtype=bool)
    for r in rules:
        exp_col = expected_cols[r.feature_name]
        mask |= suppressed_mask(out[r.feature_name].to_numpy(), out[exp_col].to_numpy(), r)
    mask &= out["anomaly_grade"].to_numpy() > 0
    out.loc[mask, "anomaly_grade"] = 0.0
    out.loc[mask, "is_anomaly"] = False
    out["suppressed_by_rule"] = mask
    return out
