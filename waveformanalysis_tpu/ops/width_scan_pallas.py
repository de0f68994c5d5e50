"""Streaming-scan width crossings: all K peak slots in one time-major walk.

``width_from_peak_slots`` (ops/widths.py) evaluates four threshold
crossings per slot with K x 4 masked (n, L) min-reductions — ~128
full-width passes over the wave matrix at K=32. Measured on the axon v5e
at 65536x256, K=32, it costs ~215 ms and dominates the fused S1/S2 bundle
(262 ms total; every other stage is < 27 ms — BENCHMARKS.md round 3).

This kernel instead walks the sample axis per 1024-event block with
per-slot state in VMEM (the ops/chain_scan_pallas.py layout): pass A
captures each slot's corrected peak value (needed to form the crossing
thresholds), pass B updates all four first-crossing indices for every slot
per step, capturing the two interpolation samples (corr[idx-1], corr[idx])
at the moment the first crossing fires. The wave block streams from HBM
once and the crossing search is O(L) per event instead of O(K*L).

Only the crossing SEARCH runs here. The interpolation / validity
arithmetic (division, width differences) stays in jnp —
``ops.widths.width_from_peak_slots_scan`` applies literally the same
expressions as the XLA kernel to the emitted indices and samples, so
consumed outputs are bit-identical (tests/test_width_scan_pallas.py).

Crossing semantics (contract of ops/widths._width_for_positions, itself
the behavioral analog of the reference per-hit loops,
waveform_analysis/core/plugins/builtin/cpu/waveform_width.py:153-380):

- corr = float32(wave) - baseline (baseline computed by the caller);
- rising crossing for threshold thr: FIRST t in [0, p) with corr[t] >= thr;
- falling crossing: FIRST t in [p, L) with corr[t] <= thr;
- not-found is reported as index L (the XLA kernel's min-over-empty fill).

Slots with out-of-range positions (p < 0 or >= L, i.e. unoccupied peak
slots) never capture a peak value here, where the XLA kernel reads
corr[clip(p)] — both paths mark those slots width-invalid and every
consumer filters on that mask, so the difference is unobservable.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waveformanalysis_tpu.ops.chain_scan_pallas import (
    BLOCK_EVENTS,
    _LANE,
    _SUB,
    _scan_steps,
    _sel,
)

KERNEL_VERSION = "width-scan-pallas-v1"


def _width_scan_kernel(
    w_ref, bl_ref, pos_ref,
    rl_i_ref, rh_i_ref, fh_i_ref, fl_i_ref,
    rl_y0_ref, rl_y1_ref, rh_y0_ref, rh_y1_ref,
    fh_y0_ref, fh_y1_ref, fl_y0_ref, fl_y1_ref,
    pv_ref,
    thr_sc,
    *,
    L: int,
    K: int,
    rise_low: float,
    rise_high: float,
    fall_high: float,
    fall_low: float,
    interpolation: bool,
    unrolled: bool,
):
    S = (_SUB, _LANE)
    f32, i32 = jnp.float32, jnp.int32
    bl = bl_ref[:].astype(f32)
    zi = jnp.zeros(S, i32)
    zf = jnp.zeros(S, f32)
    li = jnp.full(S, L, i32)

    def corr_at(t):
        return w_ref[t, :, :].astype(f32) - bl

    idx_refs = (rl_i_ref, rh_i_ref, fh_i_ref, fl_i_ref)
    y0_refs = (rl_y0_ref, rh_y0_ref, fh_y0_ref, fl_y0_ref)
    y1_refs = (rl_y1_ref, rh_y1_ref, fh_y1_ref, fl_y1_ref)

    for k in range(K):
        for r in idx_refs:
            r[k, :, :] = li
        for r in y0_refs + y1_refs:
            r[k, :, :] = zf
        pv_ref[k, :, :] = zf

    pos_s = [pos_ref[k, :, :] for k in range(K)]
    # occupancy gate (pass granularity — the measured-fastest form): blocks
    # whose every slot is unoccupied (position < 0) skip both walks
    m = pos_s[0]
    for k in range(1, K):
        m = jnp.maximum(m, pos_s[k])
    smax_s = jnp.max(m)

    # ---- pass A: capture corr[p] per slot, form thresholds ---------------
    def pva(t, c):
        c_t = corr_at(t)
        ti = zi + t
        for k in range(K):
            wr = ti == pos_s[k]
            pv_ref[k, :, :] = _sel(wr, c_t, pv_ref[k, :, :])
        return c

    def run_pva():
        _scan_steps(L, pva, 0, unrolled)
        for k in range(K):
            pv = pv_ref[k, :, :]
            thr_sc[k, :, :] = pv * rise_low
            thr_sc[K + k, :, :] = pv * rise_high
            thr_sc[2 * K + k, :, :] = pv * fall_high
            thr_sc[3 * K + k, :, :] = pv * fall_low

    pl.when(smax_s >= 0)(run_pva)

    # ---- pass B: first-crossing search, all four thresholds per slot -----
    def make_pb():
        thr_s = [thr_sc[j, :, :] for j in range(4 * K)]

        def pb(t, c):
            c_t = corr_at(t)
            c_p = corr_at(jnp.maximum(t - 1, 0))
            ti = zi + t
            for k in range(K):
                p = pos_s[k]
                before = ti < p       # rising window [0, p)
                after = ti >= p       # falling window [p, L)
                for j, (win, rising) in enumerate(
                    ((before, True), (before, True),
                     (after, False), (after, False))
                ):
                    thr = thr_s[j * K + k]
                    hit = (c_t >= thr) if rising else (c_t <= thr)
                    r = idx_refs[j]
                    upd = win & hit & (r[k, :, :] == L)
                    r[k, :, :] = _sel(upd, ti, r[k, :, :])
                    if interpolation:
                        y0_refs[j][k, :, :] = _sel(
                            upd, c_p, y0_refs[j][k, :, :]
                        )
                        y1_refs[j][k, :, :] = _sel(
                            upd, c_t, y1_refs[j][k, :, :]
                        )
            return c

        return pb

    def run_pb():
        _scan_steps(L, make_pb(), 0, unrolled)

    pl.when(smax_s >= 0)(run_pb)


def width_crossings_scan(
    waves: jax.Array,
    baseline: jax.Array,
    positions: jax.Array,
    rise_low: float,
    rise_high: float,
    fall_high: float,
    fall_low: float,
    interpolation: bool = True,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """First-crossing indices + interpolation samples for K peak slots.

    waves: (n, L) int16/float32; baseline: (n,) float32 (the width
    baseline, mean of the first samples — computed by the caller so the
    corrected signal matches the XLA kernel bit for bit); positions:
    (n, K) int32 slot positions (< 0 = unoccupied).

    Returns (n, K) arrays: ``{r_low,r_high,f_high,f_low}_idx`` (int32,
    L = not found), matching ``_y0``/``_y1`` capture samples (float32,
    zeros when ``interpolation=False``), and ``peak_value`` (float32,
    0 for slots whose position is out of range).
    """
    n, L = waves.shape
    K = int(positions.shape[1])
    pad = (-n) % BLOCK_EVENTS
    if pad:
        waves = jnp.pad(waves, ((0, pad), (0, 0)))
        baseline = jnp.pad(baseline, (0, pad))
        positions = jnp.pad(
            positions, ((0, pad), (0, 0)), constant_values=-1
        )
    n_pad = n + pad

    w_T = waves.T.reshape(L, n_pad // _LANE, _LANE)
    bl2 = baseline.astype(jnp.float32).reshape(n_pad // _LANE, _LANE)
    pos_T = positions.astype(jnp.int32).T.reshape(K, n_pad // _LANE, _LANE)

    kernel = functools.partial(
        _width_scan_kernel,
        L=L, K=K,
        rise_low=float(rise_low), rise_high=float(rise_high),
        fall_high=float(fall_high), fall_low=float(fall_low),
        interpolation=bool(interpolation),
        unrolled=not interpret,
    )
    f32, i32 = jnp.float32, jnp.int32
    evt_spec = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    slot_spec = pl.BlockSpec((K, _SUB, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    out_dtypes = [i32] * 4 + [f32] * 8 + [f32]
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // BLOCK_EVENTS,),
        in_specs=[
            pl.BlockSpec((L, _SUB, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            evt_spec,
            slot_spec,
        ],
        out_specs=[slot_spec] * 13,
        out_shape=[
            jax.ShapeDtypeStruct((K, n_pad // _LANE, _LANE), dt)
            for dt in out_dtypes
        ],
        scratch_shapes=[pltpu.VMEM((4 * K, _SUB, _LANE), f32)],
        interpret=interpret,
    )(w_T, bl2, pos_T)

    keys = (
        "r_low_idx", "r_high_idx", "f_high_idx", "f_low_idx",
        "r_low_y0", "r_low_y1", "r_high_y0", "r_high_y1",
        "f_high_y0", "f_high_y1", "f_low_y0", "f_low_y1",
        "peak_value",
    )
    return {
        k: v.reshape(K, n_pad).T[:n] for k, v in zip(keys, outs)
    }
