"""Execute EVERY registered query at a scale dir and report wall times.

The per-round health sweep behind BASELINE.md's "full query-set sweep"
numbers: no oracle comparison (that is check_driver_contract.py's job at
sf0.01), just "does every registered pipeline run clean at 10× the gate
scale, and what does each cost".

Usage: python tools/sweep_queries.py [sf_dir] [num_cpus]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import ray

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> int:
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        log_to_driver=False,
    )
    import __ray_entry__ as e

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_all = time.perf_counter()
    for name, fn in e.queries().items():
        t0 = time.perf_counter()
        try:
            res = fn(SF_DIR)
            n = res.count() if hasattr(res, "count") else len(res)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"  {name}: ERROR {errors[name]}", flush=True)
            continue
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {n} rows in {timings[name]}s", flush=True)
    total = round(time.perf_counter() - t_all, 1)
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    print(
        json.dumps(
            {
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "n_queries": len(timings) + len(errors),
                "n_errors": len(errors),
                "total_sec": total,
                "slowest": slowest,
                **({"errors": errors} if errors else {}),
            }
        )
    )
    ray.shutdown()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
