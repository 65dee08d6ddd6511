"""Hardware scaling control: sustained regex-tokenize throughput at two
process counts, NO Ray — measures what this box itself allows before any
engine overhead (DRAM-bandwidth-bound string work; see BASELINE.md's
scaling methodology notes).

The engine's 2→8 CPU efficiency should be read against this number: if
the box's own sustained-tokenize scaling is 0.8, an engine number of 0.8
is 100 % of the achievable. Interleaved pairs, median of per-pair
efficiencies (same methodology as bench.py --scaling).

    python tools/hw_ceiling.py [lo hi reps]   # default 2 8 3
"""

from __future__ import annotations

import multiprocessing as mp
import re
import sys
import time

_TOKEN = re.compile(r"[A-Z]{2,}[0-9]*(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")


def _make_text(seed: int) -> str:
    # deterministic code-like text, ~1 MB
    words = [f"someVariableName{i} CONST_{i} parse{i}Response util{i}_fn" for i in range(2000)]
    return " ".join(words * 8)


def _worker(args) -> int:
    seed, secs = args
    text = _make_text(seed)
    n = 0
    t_end = time.perf_counter() + secs
    while time.perf_counter() < t_end:
        n += len(_TOKEN.findall(text))
    return n


def run(nproc: int, secs: float = 12.0) -> float:
    with mp.Pool(nproc) as pool:
        tot = sum(pool.map(_worker, [(i, secs) for i in range(nproc)]))
    return tot / secs  # tokens/sec aggregate


def main() -> None:
    lo, hi, reps = (int(x) for x in (sys.argv[1:4] + ["2", "8", "3"][len(sys.argv) - 1:]))
    pairs = []
    for _ in range(reps):
        r_lo = run(lo)
        r_hi = run(hi)
        pairs.append((r_lo, r_hi, (r_hi / r_lo) / (hi / lo)))
    pairs.sort(key=lambda p: p[2])
    r_lo, r_hi, eff = pairs[len(pairs) // 2]
    import json

    print(json.dumps({
        "metric": "hw_tokenize_scaling", "value": round(eff, 3), "unit": "ratio",
        "cpus": [lo, hi], "tokens_per_sec": [round(r_lo), round(r_hi)],
        "pair_efficiencies": [round(p[2], 3) for p in pairs],
    }))


if __name__ == "__main__":
    main()
