"""Fused Pallas TPU kernel: the ENTIRE per-event chain in one HBM pass.

The XLA full chain (models/full_chain.py) is elementwise/reduction dominated:
~450 (n, L) passes that stream the wave matrix from HBM hundreds of times.
This kernel loads each (TILE_R, L) tile of waveforms into VMEM ONCE and
computes everything there — basic features, scipy-parity find_peaks
(plateau midpoints, greedy distance pruning, prominences, rel-height ips),
threshold-hit runs, 10-90% widths, and S1/S2 labels — writing only tiny
(n,) per-event outputs back.

Semantics mirror the XLA kernels exactly (ops/features.py, ops/peaks.py,
ops/hits.py, ops/widths.py); equality is enforced by
tests/test_chain_pallas.py. Scan primitives (cummax/cumsum along the sample
axis) use log-depth shift doubling; per-row dynamic gathers become one-hot
masked reductions — TPU has no fast lane-axis gather.

(reference analog: the per-event NumPy/SciPy loops this replaces live in
waveform_analysis/core/plugins/builtin/cpu/{basic_features,peak_finding,
hit_finder,waveform_width,s1_s2_classifier}.py)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_VERSION = "chain-pallas-v1"

_NEG = -3.0e38
_INF = 3.0e38
_BIG = 2**30

DEFAULT_TILE_ROWS = 256


def _shift_right(x, s, fill, col):
    """y[i] = x[i-s] for i >= s else fill (static s)."""
    rolled = pltpu.roll(x, shift=s, axis=1)
    return jnp.where(col < s, fill, rolled)


def _shift_left(x, s, fill, col, L):
    """y[i] = x[i+s] for i < L-s else fill (static s)."""
    rolled = pltpu.roll(x, shift=L - s, axis=1)  # roll takes shift >= 0
    return jnp.where(col >= L - s, fill, rolled)


def _cummax(x, col, L, fill):
    s = 1
    while s < L:
        x = jnp.maximum(x, _shift_right(x, s, fill, col))
        s *= 2
    return x


def _cumsum(x, col, L):
    s = 1
    while s < L:
        x = x + _shift_right(x, s, jnp.zeros((), x.dtype), col)
        s *= 2
    return x


def _any_row(m):
    """Row-wise any() — Mosaic has no bool reductions."""
    return jnp.max(m.astype(jnp.int32), axis=1, keepdims=True) > 0


def _extract(arr, idx, neutral, col):
    """Per-row arr[idx] via one-hot masked max-reduction (no lane gather)."""
    m = col == idx
    return jnp.max(jnp.where(m, arr, neutral), axis=1, keepdims=True)


def _chain_kernel(
    w_ref, el_ref, bl_ref, sign_ref,
    # outputs
    height_ref, amp_ref, area_ref, mad_ref, peak_pos_ref, n_peaks_ref,
    n_hits_ref, hit_integral_ref, rise_ref, fall_ref, width_ref, label_ref,
    ncand_ref, nruns_ref,
    *,
    L: int,
    height_window: Tuple[int, int],
    peak_height: float,
    peak_distance: int,
    peak_prominence: float,
    peak_width: float,
    rel_height: float,
    use_derivative: bool,
    K: int,
    hit_threshold: float,
    left_extension: int,
    right_extension: int,
    K_hits: int,
    height_ext: int,
    rise_low: float,
    rise_high: float,
    s1_width_max: float,
    s2_width_min: float,
    baseline_samples: int,
):
    w = w_ref[:].astype(jnp.float32)  # (R, L)
    R = w.shape[0]
    el = el_ref[:].astype(jnp.int32)  # (R, 1)
    bl = bl_ref[:]                    # (R, 1)
    sign = sign_ref[:]                # (R, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

    # ================= basic features (ops/features.py semantics) ==========
    valid = col < el
    hs, he = height_window
    hmask = valid & (col >= hs) & (col < he)
    min_h = jnp.min(jnp.where(hmask, w, float(_BIG)), axis=1, keepdims=True)
    max_h = jnp.max(jnp.where(hmask, w, float(-_BIG)), axis=1, keepdims=True)
    count_h = jnp.sum(hmask.astype(jnp.float32), axis=1, keepdims=True)
    sum_a = jnp.sum(jnp.where(valid, w, 0.0), axis=1, keepdims=True)
    count_a = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
    w_next = _shift_left(w, 1, 0.0, col, L)
    d_raw = w_next - w  # diff index i valid while i < el-1
    dvalid = col < (el - 1)
    mad = jnp.max(jnp.where(dvalid, jnp.abs(d_raw), 0.0), axis=1, keepdims=True)

    positive = sign > 0
    has_h = count_h > 0
    height = jnp.where(positive, max_h - bl, bl - min_h)
    height = jnp.where(has_h, height, 0.0)
    amp = jnp.where(has_h, max_h - min_h, 0.0)
    area = jnp.where(positive, sum_a - count_a * bl, count_a * bl - sum_a)
    area = jnp.where(count_a > 0, area, 0.0)

    # ================= detection signal =====================================
    signal = sign * (w - bl)
    if use_derivative:
        det_raw = sign * d_raw
        det_len = jnp.maximum(el - 1, 0)
    else:
        det_raw = signal
        det_len = el
    in_det = col < det_len
    x = jnp.where(in_det, det_raw, _NEG)

    # ================= find_peaks front-end (ops/peaks.py) ==================
    x_next = _shift_left(x, 1, 0.0, col, L)
    d2 = x_next - x
    on_diff = col < (L - 1)
    nonzero = (d2 != 0) & on_diff
    packed = jnp.where(nonzero, col * 2 + (d2 > 0).astype(jnp.int32), -1)
    cm = _cummax(packed, col, L, jnp.int32(-1))
    prev_ff = _shift_right(cm, 1, jnp.int32(-1), col)
    prev_rise = (prev_ff >= 0) & (prev_ff % 2 == 1)
    left_edge = jnp.where(prev_ff >= 0, prev_ff // 2 + 1, 0)
    midpoint = (left_edge + col) // 2
    is_peak = (d2 < 0) & prev_rise & on_diff
    is_peak &= (midpoint <= det_len - 2) & (midpoint >= 1)
    # falling edge must be real (sample col+1 inside the valid window) —
    # otherwise a plateau running into the boundary fabricates a peak
    is_peak &= col <= det_len - 2
    is_peak &= x >= peak_height  # plateau value == right-edge sample

    rank = _cumsum(is_peak.astype(jnp.int32), col, L)
    n_cand_raw = jnp.sum(is_peak.astype(jnp.int32), axis=1, keepdims=True)

    # compact first K candidates (positional order)
    pos_k, val_k, ok_k = [], [], []
    for k in range(K):
        hit = is_peak & (rank == k + 1)
        okk = _any_row(hit)
        pos_k.append(jnp.where(
            okk, jnp.max(jnp.where(hit, midpoint, -1), axis=1, keepdims=True), -1
        ))
        val_k.append(jnp.where(
            okk, jnp.max(jnp.where(hit, x, _NEG), axis=1, keepdims=True), _NEG
        ))
        ok_k.append(okk)
    positions = jnp.concatenate(pos_k, axis=1)   # (R, K)
    values = jnp.concatenate(val_k, axis=1)
    cand_valid = jnp.concatenate(
        [o.astype(jnp.int32) for o in ok_k], axis=1
    ) > 0  # Mosaic cannot concat i1 vectors

    # greedy distance pruning by height priority (ties: later position first)
    if peak_distance > 1:
        v_i = values[:, :, None]
        v_j = values[:, None, :]
        jdx = jax.lax.broadcasted_iota(jnp.int32, (R, K, K), 2)
        idx3 = jax.lax.broadcasted_iota(jnp.int32, (R, K, K), 1)
        beats = (v_j > v_i) | ((v_j == v_i) & (jdx > idx3))
        prio_rank = jnp.sum(beats.astype(jnp.int32), axis=2)  # (R, K)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
        keep = cand_valid
        for k in range(K):
            hit = prio_rank == k
            p = jnp.sum(jnp.where(hit, positions, 0), axis=1, keepdims=True)
            v_ok = _any_row(hit & cand_valid)
            kept_k = _any_row(hit & keep)
            sel = jnp.sum(jnp.where(hit, kcol, 0), axis=1, keepdims=True)
            close = jnp.abs(positions - p) < peak_distance
            suppress = close & (kcol != sel) & (v_ok & kept_k)
            keep = keep & ~suppress
        cand_valid = cand_valid & keep

    # per-candidate prominence / bases / rel-height ips — all VMEM-resident
    proms, lips, rips, fvalid, pheights = [], [], [], [], []
    for k in range(K):
        p = positions[:, k:k + 1]
        v = values[:, k:k + 1]
        ok = cand_valid[:, k:k + 1]
        higher = x > v
        prev_higher = jnp.max(
            jnp.where(higher & (col < p), col, -1), axis=1, keepdims=True
        )
        lmask = (col >= prev_higher + 1) & (col <= p) & in_det
        left_min = jnp.min(jnp.where(lmask, x, _INF), axis=1, keepdims=True)
        lbase = jnp.max(
            jnp.where(lmask & (x == left_min), col, -1), axis=1, keepdims=True
        )
        lbase = jnp.maximum(lbase, 0)
        next_higher = jnp.min(
            jnp.where(higher & (col > p), col, L), axis=1, keepdims=True
        )
        rmask = (col >= p) & (col <= next_higher - 1) & in_det
        right_min = jnp.min(jnp.where(rmask, x, _INF), axis=1, keepdims=True)
        rbase = jnp.min(
            jnp.where(rmask & (x == right_min), col, L), axis=1, keepdims=True
        )
        prom = jnp.where(ok, v - jnp.maximum(left_min, right_min), 0.0)

        h_eval = v - prom * rel_height
        below_l = (x <= h_eval) & (col >= lbase) & (col <= p) & in_det
        jl = jnp.max(jnp.where(below_l, col, -1), axis=1, keepdims=True)
        has_l = jl >= 0
        jl_safe = jnp.clip(jl, 0, L - 2)
        xl = _extract(x, jl_safe, _NEG, col)
        xl1 = _extract(x, jl_safe + 1, _NEG, col)
        lip = jnp.where(
            has_l,
            jnp.where(
                xl < h_eval,
                jl_safe.astype(jnp.float32)
                + (h_eval - xl) / jnp.where(xl1 != xl, xl1 - xl, 1.0),
                jl.astype(jnp.float32),
            ),
            lbase.astype(jnp.float32),
        )
        below_r = (x <= h_eval) & (col <= rbase) & (col >= p) & in_det
        jr = jnp.min(jnp.where(below_r, col, L), axis=1, keepdims=True)
        has_r = jr < L
        jr_safe = jnp.clip(jr, 1, L - 1)
        xr = _extract(x, jr_safe, _NEG, col)
        xr_1 = _extract(x, jr_safe - 1, _NEG, col)
        rip = jnp.where(
            has_r,
            jnp.where(
                xr < h_eval,
                jr.astype(jnp.float32)
                - (h_eval - xr) / jnp.where(xr_1 != xr, xr_1 - xr, 1.0),
                jr.astype(jnp.float32),
            ),
            rbase.astype(jnp.float32),
        )
        wk = rip - lip
        fv = ok & (prom >= peak_prominence) & (wk >= peak_width)
        proms.append(prom)
        lips.append(lip)
        rips.append(rip)
        fvalid.append(fv)

        # peak height from the ORIGINAL waveform (minmax window)
        s = jnp.clip(jnp.round(lip).astype(jnp.int32), 0, L - 1)
        e = jnp.clip(jnp.round(rip).astype(jnp.int32), 0, L - 1)
        m = (col >= jnp.maximum(s - height_ext, 0)) & (
            col < jnp.minimum(e + height_ext, L)
        )
        mx = jnp.max(jnp.where(m, w, -_INF), axis=1, keepdims=True)
        mn = jnp.min(jnp.where(m, w, _INF), axis=1, keepdims=True)
        ph = jnp.where(_any_row(m), mx - mn, 0.0)
        pheights.append(jnp.where(fv, ph, 0.0))

    final_valid = jnp.concatenate(
        [f.astype(jnp.int32) for f in fvalid], axis=1
    ) > 0  # (R, K); int32 route for Mosaic
    n_peaks = jnp.sum(final_valid.astype(jnp.int32), axis=1, keepdims=True)

    # dominant peak: argmax over peak heights (first max wins, as jnp.argmax)
    best_v = jnp.full((R, 1), -_INF, jnp.float32)
    best_p = positions[:, 0:1]
    for k in range(K):
        cand = jnp.where(final_valid[:, k:k + 1], pheights[k], -_INF)
        take = cand > best_v
        best_v = jnp.where(take, cand, best_v)
        best_p = jnp.where(take, positions[:, k:k + 1], best_p)
    has_peak = _any_row(final_valid)

    # ================= threshold hits (ops/hits.py semantics) ===============
    hmask2 = (signal >= hit_threshold) & valid
    hmask2_i = hmask2.astype(jnp.int32)  # Mosaic cannot rotate i1 vectors
    is_start = hmask2 & (_shift_right(hmask2_i, 1, jnp.int32(0), col) == 0)
    is_end = hmask2 & (_shift_left(hmask2_i, 1, jnp.int32(0), col, L) == 0)
    rank_s = _cumsum(is_start.astype(jnp.int32), col, L)
    n_runs_raw = jnp.sum(is_start.astype(jnp.int32), axis=1, keepdims=True)
    rank_e = _cumsum(is_end.astype(jnp.int32), col, L)
    n_hits = jnp.zeros((R, 1), jnp.int32)
    hit_integral = jnp.zeros((R, 1), jnp.float32)
    sig_pos = jnp.maximum(signal, 0.0)
    for k in range(K_hits):
        sh = is_start & (rank_s == k + 1)
        eh = is_end & (rank_e == k + 1)
        ok_s = _any_row(sh)
        ok_e = _any_row(eh)
        run_ok = ok_s & ok_e
        start = jnp.sum(jnp.where(sh, col, 0), axis=1, keepdims=True)
        end = jnp.sum(jnp.where(eh, col, 0), axis=1, keepdims=True) + 1
        seg_s = jnp.maximum(start - left_extension, 0)
        seg_e = jnp.minimum(end + right_extension, L)
        m = (col >= seg_s) & (col < seg_e)
        integ = jnp.sum(jnp.where(m, sig_pos, 0.0), axis=1, keepdims=True)
        n_hits += run_ok.astype(jnp.int32)
        hit_integral += jnp.where(run_ok, integ, 0.0)

    # ================= widths at the dominant peak (ops/widths.py) ==========
    p_w = jnp.where(has_peak, best_p, 0)
    nb = min(baseline_samples, L)
    bl_w = jnp.sum(jnp.where(col < nb, signal, 0.0), axis=1, keepdims=True) / nb
    corr = signal - bl_w
    p_safe = jnp.clip(p_w, 0, L - 1)
    peak_value = _extract(corr, p_safe, _NEG, col)
    valid_w = (p_w >= 0) & (p_w < L) & (peak_value > 0)

    def crossing_rising(thr):
        m = (corr >= thr) & (col < p_w)
        idx = jnp.min(jnp.where(m, col, L), axis=1, keepdims=True)
        found = idx < L
        i_safe = jnp.clip(idx, 1, L - 1)
        y0 = _extract(corr, i_safe - 1, _NEG, col)
        y1 = _extract(corr, i_safe, _NEG, col)
        denom = y1 - y0
        small = jnp.abs(denom) < 1e-10
        frac = jnp.where(small, 0.0, (thr - y0) / jnp.where(small, 1.0, denom))
        interp = (i_safe - 1).astype(jnp.float32) + frac
        out = jnp.where((idx > 0) & ~small, interp, idx.astype(jnp.float32))
        return out, found

    def crossing_falling(thr):
        m = (corr <= thr) & (col >= p_w)
        idx = jnp.min(jnp.where(m, col, L), axis=1, keepdims=True)
        found = idx < L
        rel = idx - p_w
        i_safe = jnp.clip(idx, 1, L - 1)
        y0 = _extract(corr, i_safe - 1, _NEG, col)
        y1 = _extract(corr, i_safe, _NEG, col)
        denom = y1 - y0
        small = jnp.abs(denom) < 1e-10
        frac = jnp.where(small, 0.0, (thr - y0) / jnp.where(small, 1.0, denom))
        interp = (i_safe - 1).astype(jnp.float32) + frac
        out = jnp.where((rel > 0) & ~small, interp, idx.astype(jnp.float32))
        return out, found

    r_low, r_low_ok = crossing_rising(peak_value * rise_low)
    r_high, r_high_ok = crossing_rising(peak_value * rise_high)
    f_high, f_high_ok = crossing_falling(peak_value * rise_high)
    f_low, f_low_ok = crossing_falling(peak_value * rise_low)
    rise = jnp.where(r_low_ok & r_high_ok, r_high - r_low, 0.0)
    fall = jnp.where(f_high_ok & f_low_ok, f_low - f_high, 0.0)
    total = jnp.where(r_low_ok & f_low_ok, f_low - r_low, 0.0)

    width_samples = jnp.where(has_peak & valid_w, total, 0.0)
    rise_out = jnp.where(has_peak, rise, 0.0)
    fall_out = jnp.where(has_peak, fall, 0.0)

    # ================= S1/S2 labels =========================================
    classified = has_peak & (width_samples > 0)
    label = jnp.where(
        classified & (width_samples <= s1_width_max), 1,
        jnp.where(classified & (width_samples >= s2_width_min), 2, 0),
    ).astype(jnp.int32)

    # ================= outputs ==============================================
    height_ref[:] = height
    amp_ref[:] = amp
    area_ref[:] = area
    mad_ref[:] = mad
    peak_pos_ref[:] = jnp.where(has_peak, best_p, -1).astype(jnp.int32)
    n_peaks_ref[:] = n_peaks
    n_hits_ref[:] = n_hits
    hit_integral_ref[:] = hit_integral
    rise_ref[:] = rise_out
    fall_ref[:] = fall_out
    width_ref[:] = width_samples
    label_ref[:] = label
    # raw (uncapped) candidate/run counts for the overflow contract
    ncand_ref[:] = n_cand_raw
    nruns_ref[:] = n_runs_raw


def chain_pallas(
    waves: jax.Array,
    event_length: jax.Array,
    baselines: jax.Array,
    polarity_codes: jax.Array,
    cfg: Any = None,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """Fused-chain forward step; same contract as
    models.full_chain.full_chain_step but one Pallas kernel.

    n must be a multiple of 8; rows are padded to tile_rows internally.
    """
    from waveformanalysis_tpu.models.full_chain import ChainConfig

    cfg = cfg or ChainConfig()
    n, L = waves.shape
    R = min(tile_rows, max(8, n))
    pad = (-n) % R
    if pad:
        waves = jnp.pad(waves, ((0, pad), (0, 0)))
        event_length = jnp.pad(event_length, (0, pad))
        baselines = jnp.pad(baselines, (0, pad))
        polarity_codes = jnp.pad(polarity_codes, (0, pad))
    n_pad = n + pad

    sign = jnp.where(polarity_codes > 0, 1.0, -1.0).astype(jnp.float32)
    el2 = event_length.astype(jnp.int32)[:, None]
    bl2 = baselines.astype(jnp.float32)[:, None]
    sign2 = sign[:, None]

    hs, he = cfg.height_range
    kernel = functools.partial(
        _chain_kernel,
        L=L,
        height_window=(hs, min(he, L)),
        peak_height=float(cfg.peak_height),
        peak_distance=int(cfg.peak_distance),
        peak_prominence=float(cfg.peak_prominence),
        peak_width=float(cfg.peak_width),
        rel_height=0.5,
        use_derivative=bool(cfg.use_derivative),
        K=int(cfg.max_peaks),
        hit_threshold=float(cfg.hit_threshold),
        left_extension=int(cfg.left_extension),
        right_extension=int(cfg.right_extension),
        K_hits=int(cfg.max_hits),
        height_ext=4,
        rise_low=float(cfg.rise_low),
        rise_high=float(cfg.rise_high),
        s1_width_max=float(cfg.s1_width_max),
        s2_width_min=float(cfg.s2_width_min),
        baseline_samples=50,
    )

    row_spec = pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    i32 = jnp.int32
    out_dtypes = [f32, f32, f32, f32, i32, i32, i32, f32, f32, f32, f32,
                  i32, i32, i32]
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // R,),
        in_specs=[
            pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=[row_spec] * 14,
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), dt) for dt in out_dtypes],
        interpret=interpret,
    )(waves, el2, bl2, sign2)

    keys = (
        "height", "amp", "area", "max_abs_diff", "peak_position", "n_peaks",
        "n_hits", "hit_integral", "rise_samples", "fall_samples",
        "width_samples", "label", "_n_candidates", "_n_runs",
    )
    result = {k: v[:n, 0] for k, v in zip(keys, outs)}
    result["label"] = result["label"].astype(jnp.int8)
    result["n_peak_overflow"] = jnp.sum(
        result.pop("_n_candidates") > int(cfg.max_peaks)
    ).astype(jnp.int32)
    result["n_hit_overflow"] = jnp.sum(
        result.pop("_n_runs") > int(cfg.max_hits)
    ).astype(jnp.int32)
    return result


def make_jit_chain_pallas(cfg: Any = None, tile_rows: int = DEFAULT_TILE_ROWS,
                          interpret: bool = False):
    """Jitted fused-Pallas chain with the full_chain_step contract."""
    from waveformanalysis_tpu.models.full_chain import ChainConfig

    cfg = cfg or ChainConfig()

    @jax.jit
    def step(waves, event_length, baselines, polarity_codes):
        return chain_pallas(waves, event_length, baselines, polarity_codes,
                            cfg, tile_rows=tile_rows, interpret=interpret)

    return step


def make_sharded_chain_pallas(mesh, cfg: Any = None, axis: str = "data",
                              tile_rows: int = DEFAULT_TILE_ROWS,
                              interpret: bool = False):
    """Pallas chain sharded over the event axis: each chip runs the fused
    kernel on its shard; label counts and total area psum over ICI.

    Same output contract as models.full_chain.make_sharded_chain. Pass
    interpret=True on CPU meshes (Mosaic compiles on TPU only).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from waveformanalysis_tpu.models.full_chain import (
        CHAIN_OUT_KEYS,
        CHAIN_STATS_KEYS,
        ChainConfig,
    )

    cfg = cfg or ChainConfig()

    def local(waves, event_length, baselines, polarity_codes):
        out = chain_pallas(waves, event_length, baselines, polarity_codes,
                           cfg, tile_rows=tile_rows, interpret=interpret)
        out["n_s1"] = jax.lax.psum(
            jnp.sum(out["label"] == 1).astype(jnp.int32), axis
        )
        out["n_s2"] = jax.lax.psum(
            jnp.sum(out["label"] == 2).astype(jnp.int32), axis
        )
        out["total_area"] = jax.lax.psum(jnp.sum(out["area"]), axis)
        for k in ("n_peak_overflow", "n_hit_overflow"):
            out[k] = jax.lax.psum(out[k], axis)
        return out

    out_specs = {k: P(axis) for k in CHAIN_OUT_KEYS}
    out_specs.update({k: P() for k in CHAIN_STATS_KEYS})
    out_specs.update({k: P() for k in ("n_peak_overflow", "n_hit_overflow")})
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)
