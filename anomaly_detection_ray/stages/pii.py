"""PII redaction — a stateless Arrow-native scrubbing stage.

Large-scale training-data pipelines scrub personally identifiable
information before anything else ships: emails, IP addresses and
phone-shaped numbers are the standard regex-redactable classes (the
C4 / RefinedWeb / CCNet cleaning recipes all carry a variant of this
pass). This stage is the graft-mandate analogue: one zero-copy
``map_batches`` over the text column, RE2 kernels end to end.

Design for 100 TB:
- stateless task-pool stage (no actor state, no shuffle) — every block
  is independent, the streaming executor pipelines it behind the read;
- ``pyarrow.compute`` regex kernels (RE2, C++) — no Python loop over
  rows, no string materialization outside Arrow;
- the patterns are RE2-compatible on BOTH engines, so the DuckDB twin
  (`regexp_replace(..., 'g')` / `regexp_extract_all`) verifies the
  redacted text VALUE-EXACT — same guarantee class as the analyzer
  twins (``functions/analyzer.py``).

Counts are measured on the ORIGINAL text (each pattern independently);
replacements apply sequentially (email → ipv4 → phone), so a pattern
swallowed by an earlier replacement (an IP inside an email's domain)
counts but does not double-redact — documented contract, identical in
the SQL twin.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — ASCII classes only so Python re,
# Arrow RE2 and DuckDB RE2 agree byte-for-byte (verified in
# tests/test_pipeline_ops.py and the pii_redact oracle twin).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_batch(batch: pa.Table, text_col: str = "text",
                 out_col: str | None = None, counts: bool = True) -> pa.Table:
    """Redact one Arrow batch: adds ``n_<name>`` match-count columns
    (counted on the original text; ``counts=False`` skips them for
    schema-stable composition inside other pipelines) and replaces/adds
    the text column with the sequentially redacted value."""
    col = batch[text_col]
    if counts:
        for name, pat, _ in PII_PATTERNS:
            batch = batch.append_column(
                f"n_{name}", pc.cast(pc.count_substring_regex(col, pattern=pat), pa.int64())
            )
    red = col
    for _, pat, rep in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pattern=pat, replacement=rep)
    target = out_col or text_col
    if target in batch.column_names:
        batch = batch.set_column(batch.column_names.index(target), target, red)
    else:
        batch = batch.append_column(target, red)
    return batch


def redact_pii(ds, text_col: str = "text", out_col: str | None = None,
               counts: bool = True):
    """Dataset → Dataset with the text column redacted and per-class
    match counts appended. Stateless task pool, Arrow batches."""
    return ds.map_batches(
        lambda b: redact_batch(b, text_col=text_col, out_col=out_col, counts=counts),
        batch_format="pyarrow",
    )
