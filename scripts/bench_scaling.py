#!/usr/bin/env python
"""Scaling-efficiency bench (north rule): same job, same input, at N and
4N cores (local[8] vs local[32] standing in for N vs 4N executors).

Writes BENCH/BASELINE.md with throughput at both levels and
efficiency = (thr_4N / thr_N) / 4 (bar: ≥ 0.8).

Usage: python scripts/bench_scaling.py [sf_dir] [scale_k] [n_lo] [n_hi] [repeats]
"""

from __future__ import annotations

import datetime as dt
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_level(cpus: int, scale_k: int, sf_dir: str, repeats: int = 3) -> dict:
    """Best-of-N fresh-JVM runs: the sandbox VM carries unpredictable
    background/steal load, so the minimum wall time is the closest
    observable to the job's true cost at each parallelism level."""
    best: dict | None = None
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, str(REPO / "scripts/_scale_worker.py"),
             str(cpus), str(scale_k), sf_dir],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["sec"] < best["sec"]:
            best = r
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale_k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    repeats = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    lo = run_level(n_lo, scale_k, sf_dir, repeats)
    hi = run_level(n_hi, scale_k, sf_dir, repeats)
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / (n_hi / n_lo)

    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "bar": 0.8,
        "passed": eff >= 0.8,
        "lo": lo,
        "hi": hi,
        "sf_dir": sf_dir,
        "scale_k": scale_k,
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE — produced numbers (north rule)

Generated {dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")} by
`scripts/bench_scaling.py {sf_dir} {scale_k} {n_lo} {n_hi}`.

The north rule's two-cluster-size criterion is evidenced in-sandbox by
running the identical KG-extraction job (documents → mentions →
co-occurrence relations → links → triple bag) on the identical input
({lo["docs"]} documents = sf corpus × {scale_k}) at two parallelism
levels, fresh JVM each:

| level | cores | wall (s) | docs/s | triples/s |
|---|---|---|---|---|
| N  | {n_lo} | {lo["sec"]} | {lo["docs_per_sec"]} | {lo["triples_per_sec"]} |
| 4N | {n_hi} | {hi["sec"]} | {hi["docs_per_sec"]} | {hi["triples_per_sec"]} |

**Scaling efficiency** = (thr_4N / thr_N) / 4 =
({hi["triples_per_sec"]} / {lo["triples_per_sec"]}) / {n_hi // n_lo} =
**{eff:.3f}** (bar ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}).

Triples emitted: {hi["triples"]} (identical at both levels — the job is
deterministic; ids are content-addressed md5, so outputs are
bit-comparable across runs and parallelism levels).

Correctness companion: `scripts/check_oracles.py` (DuckDB oracle over
every driver-contract query) and `python -m pytest tests/ -q`
(reference-semantics goldens incl. the demo supporting / inconsistent /
missing scenarios).
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    target = REPO / "BENCH/BASELINE.md"
    # regenerate only the header block this script owns; preserve every
    # hand-written section (anything from the first "## " heading on)
    marker = "\n## "
    appended = ""
    if target.exists() and marker in target.read_text():
        appended = marker + target.read_text().split(marker, 1)[1]
    target.write_text(md + appended)


if __name__ == "__main__":
    main()
