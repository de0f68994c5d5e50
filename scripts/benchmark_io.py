#!/usr/bin/env python
"""CSV-parse benchmark: waveforms-load wall time vs engine x n_jobs.

Behavioral analog of the reference IO benchmark
(reference: scripts/benchmark_io.py:1-100): generates a synthetic VX2730 run
and times parse_and_stack_files across parse engines and job counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-files", type=int, default=50)
    p.add_argument("--n-channels", type=int, default=2)
    p.add_argument("--n-rows", type=int, default=200)
    p.add_argument("--n-samples", type=int, default=200)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--engines", default="auto,pyarrow,pandas,numpy")
    p.add_argument("--jobs", default="1,4,16")
    args = p.parse_args()

    from utils import create_daq_run

    from waveformanalysis_tpu.formats.adapter import get_adapter
    from waveformanalysis_tpu.utils.io import parse_and_stack_files

    tmp = Path(tempfile.mkdtemp(prefix="wfa_bench_io_"))
    create_daq_run(
        tmp, run_name="bench", n_channels=args.n_channels,
        n_files_per_channel=args.n_files // args.n_channels,
        n_rows=args.n_rows, n_samples=args.n_samples,
    )
    groups = get_adapter("vx2730").scan_run(str(tmp), "bench")
    raw_files = [groups[ch] for ch in sorted(groups)]
    total_rows = sum(len(f) for f in raw_files) * args.n_rows

    results = []
    for engine in args.engines.split(","):
        for n_jobs in (int(j) for j in args.jobs.split(",")):
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                try:
                    parse_and_stack_files(
                        raw_files, n_jobs=n_jobs, parse_engine=engine
                    )
                except Exception as e:
                    print(f"engine={engine} failed: {e}", file=sys.stderr)
                    times = None
                    break
                times.append(time.perf_counter() - t0)
            if times is None:
                continue
            best = min(times)
            results.append({
                "engine": engine, "n_jobs": n_jobs,
                "best_s": round(best, 4),
                "rows_per_s": round(total_rows / best, 1),
            })
            print(f"engine={engine:<8} jobs={n_jobs:<3} "
                  f"best={best:.4f}s  {total_rows / best:,.0f} rows/s")

    print(json.dumps({"results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
