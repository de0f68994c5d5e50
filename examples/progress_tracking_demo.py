#!/usr/bin/env python
"""Progress tracking surface: with_progress / progress_iter / progress_map.

Mirrors the reference's progress demo arc (examples/
progress_tracking_demo.py): decorated generators, decorated list-returning
functions, wall-time display on plain functions, and the two functional
helpers. (reference analog: examples/progress_tracking_demo.py)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from waveformanalysis_tpu.foundation.progress import (
    format_throughput,
    format_time,
    get_global_tracker,
    progress_iter,
    progress_map,
    with_progress,
)


# -- 1. decorated generator: each yield advances the bar ---------------------
@with_progress(total=20, desc="generating items")
def generate_items():
    for i in range(20):
        time.sleep(0.01)
        yield i * i


# -- 2. decorated list-returning function ------------------------------------
@with_progress(desc="loading files")
def load_files(file_list):
    return [f"<{name}>" for name in file_list]


# -- 3. plain function: shows wall time --------------------------------------
@with_progress(desc="expensive computation")
def expensive_computation(n):
    return sum(i * i for i in range(n))


def main() -> None:
    items = list(generate_items())
    print(f"generated {len(items)} items, last={items[-1]}")

    loaded = load_files([f"file_{i}.csv" for i in range(5)])
    print(f"loaded {len(loaded)}")

    total = expensive_computation(200_000)
    print(f"sum of squares: {total}")

    # -- 4. progress_iter over any iterable ----------------------------------
    acc = 0
    for x in progress_iter(range(50), desc="accumulating"):
        acc += x
    print(f"accumulated {acc}")

    # -- 5. progress_map ------------------------------------------------------
    squares = progress_map(lambda v: v * v, list(range(10)), desc="mapping")
    print(f"squares tail: {squares[-3:]}")

    # -- 6. the global tracker + formatting helpers ---------------------------
    tracker = get_global_tracker()
    print(f"tracker: {type(tracker).__name__}")
    print("format_time(4000s):", format_time(4000))
    print("format_throughput:", format_throughput(1_234_567, "wf"))


if __name__ == "__main__":
    main()
