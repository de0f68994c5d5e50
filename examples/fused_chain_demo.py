#!/usr/bin/env python
"""Fused-chain demo: the flagship Pallas kernels end to end.

Runs the same mixed S1/S2 batch through the three chain implementations —
XLA (models/full_chain.py), tile Pallas (ops/chain_pallas.py), and the
streaming-scan Pallas kernel (ops/chain_scan_pallas.py) — verifies they
agree, and reports classification accuracy. On CPU the Pallas kernels run
in interpret mode; on TPU they compile via Mosaic.

(reference analog: examples/s1_s2_pipeline_demo.ipynb, BASELINE config #4 —
but through the fused device chain instead of the plugin DAG)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax

import waveformanalysis_tpu as wa
from waveformanalysis_tpu.models.full_chain import example_chain_batch


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    n_events = 4096 if on_tpu else 256

    cfg = wa.ChainConfig(use_derivative=False, peak_height=80.0,
                         peak_prominence=50.0, peak_width=2.0)
    batch = example_chain_batch(n_events=n_events, wave_length=256)
    truth = np.where(np.arange(n_events) % 2 == 0, 1, 2)  # odd idx = wide S2

    steps = {
        "xla": wa.make_jit_chain(cfg),
        "tile-pallas": wa.make_jit_chain_pallas(cfg, interpret=interpret),
        "scan-pallas": wa.make_jit_chain_scan(cfg, interpret=interpret),
    }

    outs = {}
    for name, step in steps.items():
        t0 = time.perf_counter()
        out = step(*batch)
        jax.block_until_ready(out)
        outs[name] = out
        labels = np.asarray(out["label"])
        acc = float(np.mean(labels == truth))
        print(f"{name:12s} {time.perf_counter() - t0:6.2f} s "
              f"(incl. compile)  accuracy={acc:.3f}  "
              f"S1={int((labels == 1).sum())} S2={int((labels == 2).sum())}")

    ref = outs["xla"]
    for name in ("tile-pallas", "scan-pallas"):
        same = all(
            np.array_equal(np.asarray(ref[k]), np.asarray(outs[name][k]))
            for k in ("label", "n_peaks", "peak_position", "n_hits")
        )
        print(f"{name:12s} outputs identical to XLA chain: {same}")


if __name__ == "__main__":
    main()
