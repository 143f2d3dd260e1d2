"""Scaling-phase-only rerun of bench.py: the two-parallelism-level
criterion (two consecutive VALID windows >= SPARK_GRAFT_SCALING_CRITERION
of the per-window canonical-job ceiling) without repeating the serial
query block. Emits the same JSON scaling dict as bench.py's `scaling`
key, one line, plus per-attempt snapshots — for quieter-window retries
when a full run's scaling phase was budget-stopped under load.
Usage: python tools/scaling_only.py [out.json]"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    corpus_dir = bench.ensure_bench_corpus()
    t0 = time.time()
    scaling = bench.scaling_measurement(
        corpus_dir, bench.SCALE_A, bench.SCALE_B, reps=2, windows=2
    )
    doc = {
        "metric": "scaling_only",
        "sf": 0.1,
        "scaling": scaling,
        "wall_sec": round(time.time() - t0, 1),
    }
    line = json.dumps(doc)
    print(line, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
