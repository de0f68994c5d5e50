"""Flagship fused feature pipeline (jittable, shardable).

This is the device-side composition of the hot path that the reference runs
as separate per-plugin NumPy loops (records -> baseline -> basic features ->
hits -> S1/S2; reference call stack: SURVEY.md §3.1): one jitted program over
a padded (n_events, wave_len) batch, designed so XLA fuses the whole sweep
into a single HBM pass per operand.

Multi-chip: :func:`make_sharded_step` wraps the step in ``shard_map`` over a
1-D ``("data",)`` mesh — events are the data-parallel axis, run statistics
are combined with ``psum`` over ICI. This mirrors the reference's
chunk-parallel thread pools (streaming.py:740) as an SPMD program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


PIPELINE_VERSION = "pipeline-v1"


@dataclass(frozen=True)
class PipelineConfig:
    """Static configuration baked into the compiled step."""

    baseline_window: Tuple[int, int] = (0, 20)
    height_range: Tuple[int, int] = (40, 90)
    area_start: int = 0
    hit_threshold: float = 30.0
    # S1/S2 separation on simple features (width proxy via area/height)
    s1_max_width_samples: float = 12.0
    s2_min_width_samples: float = 30.0

    def __hash__(self) -> int:
        return hash(
            (self.baseline_window, self.height_range, self.area_start,
             self.hit_threshold, self.s1_max_width_samples,
             self.s2_min_width_samples)
        )


def forward_step(
    waves: jax.Array,
    event_length: jax.Array,
    polarity_codes: jax.Array,
    cfg: PipelineConfig,
) -> Dict[str, jax.Array]:
    """One fused device pass: baseline -> features -> hits -> S1/S2 labels.

    All outputs are per-event arrays (or scalars for run stats); everything
    stays on device.
    """
    n, L = waves.shape
    w = waves.astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, L), dimension=1)
    valid = idx < event_length[:, None]

    # baseline: mean over the baseline window (f32 on device)
    bs, be = cfg.baseline_window
    bmask = valid & (idx >= bs) & (idx < be)
    bcount = jnp.maximum(jnp.sum(bmask, axis=1), 1)
    baseline = jnp.sum(jnp.where(bmask, w, 0), axis=1) / bcount.astype(jnp.float32)

    # polarity-normalized signal: positive-going pulse
    sign = jnp.where(polarity_codes > 0, 1.0, -1.0).astype(jnp.float32)
    signal = sign[:, None] * (w.astype(jnp.float32) - baseline[:, None])
    signal = jnp.where(valid, signal, 0.0)

    # features over windows
    hs, he = cfg.height_range
    hmask = valid & (idx >= hs) & (idx < he)
    height = jnp.max(jnp.where(hmask, signal, -jnp.inf), axis=1)
    height = jnp.where(jnp.any(hmask, axis=1), height, 0.0)
    amask = valid & (idx >= cfg.area_start)
    area = jnp.sum(jnp.where(amask, signal, 0.0), axis=1)

    # threshold hit detection: samples above threshold, contiguous-run proxy
    above = signal > cfg.hit_threshold
    n_above = jnp.sum(above & valid, axis=1)
    has_hit = n_above > 0
    # rising edges = starts of hit runs
    prev = jnp.concatenate([jnp.zeros((n, 1), bool), above[:, :-1]], axis=1)
    n_hits = jnp.sum(above & ~prev, axis=1)

    # width proxy: samples above 10% of height
    thresh10 = 0.1 * height[:, None]
    width_samples = jnp.sum((signal > thresh10) & valid & (height[:, None] > 0), axis=1)

    # S1/S2 classification (0 unknown, 1 S1, 2 S2)
    w_f = width_samples.astype(jnp.float32)
    label = jnp.where(
        has_hit & (w_f <= cfg.s1_max_width_samples), 1,
        jnp.where(has_hit & (w_f >= cfg.s2_min_width_samples), 2, 0),
    ).astype(jnp.int8)

    return {
        "baseline": baseline,
        "height": height,
        "area": area,
        "n_hits": n_hits.astype(jnp.int32),
        "width_samples": width_samples.astype(jnp.int32),
        "label": label,
    }


def make_jit_step(cfg: Optional[PipelineConfig] = None):
    """Single-device jitted step closure."""
    cfg = cfg or PipelineConfig()

    @jax.jit
    def step(waves, event_length, polarity_codes):
        return forward_step(waves, event_length, polarity_codes, cfg)

    return step


def make_sharded_step(mesh: Mesh, cfg: Optional[PipelineConfig] = None,
                      axis: str = "data"):
    """Full pipeline step sharded over the event axis of ``mesh``.

    Per-event outputs stay sharded like their inputs; run-level statistics
    (event counts per label, total area) are psum-reduced across the mesh so
    every shard returns the same global summary — this is the collective that
    replaces the reference's cross-chunk aggregation on the host.
    """
    cfg = cfg or PipelineConfig()

    def local_step(waves, event_length, polarity_codes):
        out = forward_step(waves, event_length, polarity_codes, cfg)
        # global run statistics over ICI
        n_s1 = jax.lax.psum(jnp.sum(out["label"] == 1), axis_name=axis)
        n_s2 = jax.lax.psum(jnp.sum(out["label"] == 2), axis_name=axis)
        total_area = jax.lax.psum(jnp.sum(out["area"]), axis_name=axis)
        out["run_stats"] = jnp.stack(
            [n_s1.astype(jnp.float32), n_s2.astype(jnp.float32), total_area]
        )
        return out

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs={
            "baseline": P(axis),
            "height": P(axis),
            "area": P(axis),
            "n_hits": P(axis),
            "width_samples": P(axis),
            "label": P(axis),
            "run_stats": P(),  # replicated after psum
        },
        check_vma=False,
    )
    return jax.jit(sharded)


def example_batch(
    n_events: int = 256, wave_length: int = 128, seed: int = 0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Small synthetic batch for compile checks and dry runs."""
    rng = np.random.default_rng(seed)
    waves = np.full((n_events, wave_length), 1000.0)
    waves += rng.normal(0, 3, size=waves.shape)
    starts = rng.integers(30, 60, n_events)
    widths = rng.integers(4, 40, n_events)
    for i in range(n_events):
        waves[i, starts[i] : starts[i] + widths[i]] -= 200
    waves = np.round(waves).astype(np.int16)
    event_length = np.full(n_events, wave_length, np.int32)
    pol = np.full(n_events, -1, np.int8)
    return jnp.asarray(waves), jnp.asarray(event_length), jnp.asarray(pol)
