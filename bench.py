"""Benchmark: fused waveform feature pipeline throughput on one TPU chip.

Measures waveforms/sec/chip through the baseline -> features -> hits -> S1/S2
fused device pipeline (the TPU-native rebuild of the reference's
records -> basic_features -> s1_s2 chain), and compares against a
single-socket CPU implementation of the same per-event semantics in the
reference's style (per-event NumPy loop, basic_features.py:224-265).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def make_batch(n_events: int, wave_length: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    waves = np.full((n_events, wave_length), 1000.0)
    waves += rng.normal(0, 3, size=waves.shape)
    starts = rng.integers(30, 60, n_events)
    widths = rng.integers(4, 40, n_events)
    cols = np.arange(wave_length)[None, :]
    pulse = (cols >= starts[:, None]) & (cols < (starts + widths)[:, None])
    waves = np.where(pulse, waves - 200, waves)
    return np.round(waves).astype(np.int16)


def cpu_reference_rate(waves: np.ndarray, n_sample: int = 1000) -> float:
    """Per-event loop in the reference's style; returns events/sec."""
    sub = waves[:n_sample]
    t0 = time.perf_counter()
    for i in range(len(sub)):
        wave = sub[i]
        b = float(np.mean(wave[0:20]))
        wp = wave[40:90]
        _height = b - float(np.min(wp))
        _amp = float(np.max(wp)) - float(np.min(wp))
        wc = wave.astype(np.float64)
        _area = float(np.sum(b - wc))
        signal = b - wc
        above = signal > 30.0
        _n_hits = int(np.sum(above[1:] & ~above[:-1]) + above[0])
        _width = int(np.sum(signal > 0.1 * _height))
        _label = 1 if _width <= 12 else (2 if _width >= 30 else 0)
    dt = time.perf_counter() - t0
    return len(sub) / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from waveformanalysis_tpu.models.pipeline import PipelineConfig, make_jit_step

    n_events, wave_length = 262_144, 256

    # absorb one-time tunnel costs (first transfer ~77 s on axon)
    np.asarray(jnp.zeros(8))

    waves_np = make_batch(n_events, wave_length)
    event_length = np.full(n_events, wave_length, np.int32)
    pol = np.full(n_events, -1, np.int8)

    step = make_jit_step(PipelineConfig())
    waves = jnp.asarray(waves_np)
    el = jnp.asarray(event_length)
    pc = jnp.asarray(pol)

    # compile + warm
    jax.block_until_ready(step(waves, el, pc))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(waves, el, pc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    tpu_rate = n_events / dt

    cpu_rate = cpu_reference_rate(waves_np, n_sample=1000)

    print(
        json.dumps(
            {
                "metric": "waveforms_per_sec_per_chip (baseline->features->hits->S1/S2 fused pipeline)",
                "value": round(tpu_rate, 1),
                "unit": "waveforms/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
