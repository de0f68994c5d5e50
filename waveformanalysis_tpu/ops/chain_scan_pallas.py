"""Streaming-scan Pallas chain: time-major, O(L) per event, zero (R, L) passes.

The tile kernel (ops/chain_pallas.py) evaluates each peak candidate with
masked reductions over the whole wave — K x ~40 full-width passes per tile.
This kernel transposes to time-major, packs 1024 events per (8, 128) vector
register, and walks the sample axis a fixed small number of times (5 scan
passes), carrying per-event state:

  pass 1  features + threshold-hit runs + plateau peak-candidate emission
  pass 2  prominence bases (left reset-min, right first-higher freeze)
  pass 3  rel-height crossings with interpolation captures
  pass 4  peak heights (min/max over the rounded ips window on the raw wave)
  pass 5  10-90% widths at the dominant peak + S1/S2 labels

Per-sample work is ~300 single-vreg ops instead of ~40 full-(R, L) sweeps
per candidate, an ~L/K-fold algorithmic reduction. Semantics are identical
to chain_pallas / models.full_chain (tests/test_chain_scan_pallas.py).

Mosaic constraints baked in (each crashed the remote compiler when violated):
K-slot state lives in VMEM scratch refs, NOT loop carries — moving one
carry's value into a different carry slot (even masked or through arithmetic)
breaks the loop lowering; lookback values are re-read from the input ref
instead of carried through a delay ring; where() predicates are always
vectors; carries only ever self-update.

Adaptivity: whole scan passes are gated per 1024-event block on scalar
occupancy (pl.when on jnp.max of the pass-1 candidate/run counts): blocks
with no threshold runs skip the hit-slot pass, blocks with no peak
candidates skip the prominence/crossing/height passes, and peakless blocks
skip the width passes. Measured: no cost on dense data (every event has a
pulse, ~9.8 ms @ 65536x256), up to 1.7x on sparse noise-only data (5.5 vs
8.5 ms) — the scipy-loop analog where per-event work follows what the data
contains. Finer per-SLOT pl.when gates were measured 40% SLOWER on dense
data (per-sample scalar branches defeat Mosaic's loop pipelining) and were
removed; gate only at pass granularity.

(reference analog: same per-event loops as ops/chain_pallas.py; see that
module's docstring for citations.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
from functools import partial
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_VERSION = "chain-scan-pallas-v1"

_NEG = -3.0e38
_INF = 3.0e38

_SUB = 8
_LANE = 128
BLOCK_EVENTS = _SUB * _LANE  # 1024 events per grid step

# debug: compile only the first N passes (module-level, static at trace time)
_DEBUG_PASSES = 5


def _sel(c, a, b):
    return jnp.where(c, a, b)


def _scan_steps(L, body, init, unrolled=True):
    """fori_loop over L steps, manually unrolled 4x/2x when L allows —
    cuts per-step loop overhead (Mosaic supports no partial unroll).
    Pass unrolled=False in interpret mode: the larger traced body makes
    tracing (which dominates there) slower for no benefit."""
    if not unrolled:
        return jax.lax.fori_loop(0, L, body, init)
    if L % 4 == 0:
        def quad(i, c):
            c = body(4 * i, c)
            c = body(4 * i + 1, c)
            c = body(4 * i + 2, c)
            return body(4 * i + 3, c)
        return jax.lax.fori_loop(0, L // 4, quad, init)
    if L % 2 == 0:
        return jax.lax.fori_loop(
            0, L // 2, lambda i, c: body(2 * i + 1, body(2 * i, c)), init
        )
    return jax.lax.fori_loop(0, L, body, init)


def _chain_scan_kernel(
    w_ref, el_ref, bl_ref, sign_ref,
    height_ref, amp_ref, area_ref, mad_ref, peak_pos_ref, n_peaks_ref,
    n_hits_ref, hit_integral_ref, rise_ref, fall_ref, width_ref, label_ref,
    ncand_ref, nruns_ref,
    # scratch (VMEM)
    pos_sc, val_sc, hseg_sc, hacc_sc, prm_sc, crs_sc, ph_sc, wid_sc,
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
    unrolled: bool = True,
    k_small: int = 2,
    p1_quad: bool = False,
):
    S = (_SUB, _LANE)
    f32 = jnp.float32
    i32 = jnp.int32

    el = el_ref[:].astype(i32)      # (8, 128)
    bl = bl_ref[:]
    sign = sign_ref[:]
    det_len = jnp.maximum(el - 1, 0) if use_derivative else el
    hs, he = height_window

    zf = jnp.zeros(S, f32)
    zi = jnp.zeros(S, i32)
    zb = jnp.zeros(S, jnp.bool_)

    def wv(t):
        return w_ref[t, :, :].astype(f32)

    def sig_at(t):
        return sign * (wv(t) - bl)

    def x_at(t):
        """Detection value at det index t (vector-masked beyond det_len)."""
        if use_derivative:
            w_n = w_ref[jnp.minimum(t + 1, L - 1), :, :].astype(f32)
            raw = sign * (w_n - wv(t))
        else:
            raw = sig_at(t)
        return _sel((zi + t) < det_len, raw, f32(_NEG))

    # ---- init scratch ----
    for k in range(K):
        pos_sc[k, :, :] = jnp.full(S, -1, i32)
        val_sc[k, :, :] = jnp.full(S, _NEG, f32)
    for k in range(K_hits):
        hseg_sc[k, :, :] = jnp.full(S, L + 16, i32)                 # seg_s
        hseg_sc[K_hits + k, :, :] = jnp.full(S, L + 16, i32)        # seg_e
        hseg_sc[2 * K_hits + k, :, :] = zi                          # started
        hseg_sc[3 * K_hits + k, :, :] = zi                          # ended
        hacc_sc[k, :, :] = zf

    # ======================= pass 1 =========================================
    # Features + candidate emission + run COUNTING only; the per-slot hit
    # bookkeeping moves to pass 1h, gated on this pass's occupancy totals.
    # p1_step takes the CURRENT and PREVIOUS sample values preloaded so the
    # quad runner below can share one read+convert across the 4 unrolled
    # steps (the per-step dynamic-index re-reads are pass 1's dominant cost
    # candidate — see BENCHMARKS.md r3 pass attribution).
    def p1_step(t, c, w_t, w_p):
        (min_h, max_h, count_h, sum_a, count_a, mad, bl_w_sum,
         prev_on_i, n_runs, prev_rise_i, left_edge, cand_count) = c
        prev_on = prev_on_i > 0
        prev_rise = prev_rise_i > 0  # read-only view; updates stay in int32

        valid_t = (zi + t) < el
        sig_t = sign * (w_t - bl)

        # ---- features ----
        in_h = valid_t & ((zi + t) >= hs) & ((zi + t) < he)
        min_h = _sel(in_h, jnp.minimum(min_h, w_t), min_h)
        max_h = _sel(in_h, jnp.maximum(max_h, w_t), max_h)
        count_h = count_h + in_h.astype(f32)
        sum_a = sum_a + _sel(valid_t, w_t, 0.0)
        count_a = count_a + valid_t.astype(f32)
        d_raw = w_t - w_p
        mad = _sel(((zi + t) >= 1) & valid_t,
                   jnp.maximum(mad, jnp.abs(d_raw)), mad)
        bl_w_sum = bl_w_sum + _sel(
            (zi + t) < min(baseline_samples, L), sig_t, 0.0
        )

        # ---- threshold-run count (slots handled in pass 1h) ----
        on = (sig_t >= hit_threshold) & valid_t
        is_start = on & ~prev_on
        n_runs = n_runs + is_start.astype(i32)

        # ---- peak candidate emission (det grid) ----
        i_det = t - 1 if use_derivative else t
        if use_derivative:
            cur_x = x_at(jnp.maximum(i_det, 0))
            prev_xv = x_at(jnp.maximum(i_det - 1, 0))
        else:
            # x_at(t) == masked sig_t and x_at(max(t-1,0)) == masked sig of
            # w_p — reuse the preloaded values instead of re-reading w_ref
            cur_x = _sel((zi + t) < det_len, sig_t, f32(_NEG))
            jp = jnp.maximum(t - 1, 0)
            prev_xv = _sel((zi + jp) < det_len, sign * (w_p - bl),
                           f32(_NEG))
        d2 = cur_x - prev_xv
        have = (zi + i_det) >= 1
        emit = have & (d2 < 0) & prev_rise & ((zi + i_det) <= det_len - 1)
        r_edge = i_det - 1
        m_pt = (left_edge + r_edge) // 2
        emit = emit & (m_pt >= 1) & (m_pt <= det_len - 2) & (
            prev_xv >= peak_height
        )
        for k in range(K):
            wr = emit & (cand_count == k)
            pos_sc[k, :, :] = _sel(wr, m_pt, pos_sc[k, :, :])
            val_sc[k, :, :] = _sel(wr, prev_xv, val_sc[k, :, :])
        cand_count = cand_count + emit.astype(i32)
        nz = have & (d2 != 0)
        # where() with i1 branches breaks Mosaic: update the flag in int32
        prev_rise_i = _sel(nz, (d2 > 0).astype(i32), prev_rise_i)
        left_edge = _sel(nz, zi + i_det, left_edge)

        return (min_h, max_h, count_h, sum_a, count_a, mad, bl_w_sum,
                on.astype(i32), n_runs, prev_rise_i, left_edge, cand_count)

    def p1(t, c):
        return p1_step(t, c, wv(t),
                       w_ref[jnp.maximum(t - 1, 0), :, :].astype(f32))

    carry1 = (jnp.full(S, _INF, f32), jnp.full(S, -_INF, f32), zf, zf, zf,
              zf, zf, zi, zi, zi, zi, zi)
    if p1_quad and not use_derivative and L % 4 == 0:
        # read+convert 5 samples per quad instead of 4 steps x 4 re-reads;
        # values flow between the inlined steps as registers (NOT loop
        # carries — carrying samples across iterations breaks Mosaic)
        def p1_quad_body(i, c):
            base = 4 * i
            w_m1 = w_ref[jnp.maximum(base - 1, 0), :, :].astype(f32)
            w0 = w_ref[base, :, :].astype(f32)
            w1 = w_ref[base + 1, :, :].astype(f32)
            w2 = w_ref[base + 2, :, :].astype(f32)
            w3 = w_ref[base + 3, :, :].astype(f32)
            c = p1_step(base, c, w0, w_m1)
            c = p1_step(base + 1, c, w1, w0)
            c = p1_step(base + 2, c, w2, w1)
            return p1_step(base + 3, c, w3, w2)

        out1 = jax.lax.fori_loop(0, L // 4, p1_quad_body, carry1)
    else:
        out1 = _scan_steps(L, p1, carry1, unrolled)
    (min_h, max_h, count_h, sum_a, count_a, mad, bl_w_sum,
     _, n_runs, _, _, cand_count) = out1

    # ---- per-block occupancy gates (scalars) ----
    # Upper bounds over the whole block; pl.when-gated slot work below is a
    # no-op for slots no event reaches, so runtime follows the data.
    max_cands_s = jnp.max(jnp.minimum(cand_count, K))
    max_runs_s = jnp.max(jnp.minimum(n_runs, K_hits))

    # ======================= pass 1h: hit-run slots =========================
    def make_p1h(kh_eff):
      def p1h(t, c):
        prev_on_i, run_idx = c
        prev_on = prev_on_i > 0
        w_t = wv(t)
        valid_t = (zi + t) < el
        sig_t = sign * (w_t - bl)
        sp_t = jnp.maximum(sig_t, 0.0)
        on = (sig_t >= hit_threshold) & valid_t
        is_start = on & ~prev_on
        ended_prev = prev_on & ~on   # run's exclusive end = t

        for k in range(kh_eff):
            def close_slot(k=k):
                started_k = hseg_sc[2 * K_hits + k, :, :] > 0
                ended_k = hseg_sc[3 * K_hits + k, :, :] > 0
                close_k = ended_prev & started_k & ~ended_k & (
                    run_idx == k + 1
                )
                hseg_sc[K_hits + k, :, :] = _sel(
                    close_k, jnp.minimum(zi + t + right_extension, L),
                    hseg_sc[K_hits + k, :, :],
                )
                hseg_sc[3 * K_hits + k, :, :] = (
                    ended_k | close_k
                ).astype(i32)
            close_slot()
        # left-extension lookback re-read from the input (no delay ring);
        # no per-step pl.when here — the whole walk is already gated on
        # max_runs_s below, and per-step scalar branches defeat Mosaic's
        # loop pipelining (see the module docstring)
        retro = zf
        for back in range(1, left_extension + 1):
            w_b = w_ref[jnp.maximum(t - back, 0), :, :].astype(f32)
            sp_b = jnp.maximum(sign * (w_b - bl), 0.0)
            retro = retro + _sel((zi + t - back) >= 0, sp_b, 0.0)
        for k in range(kh_eff):
            def open_slot(k=k, retro=retro):
                open_k = is_start & (run_idx == k)
                hseg_sc[k, :, :] = _sel(
                    open_k, jnp.maximum(zi + t - left_extension, 0),
                    hseg_sc[k, :, :],
                )
                started_k = hseg_sc[2 * K_hits + k, :, :] > 0
                hseg_sc[2 * K_hits + k, :, :] = (
                    started_k | open_k
                ).astype(i32)
                hacc_sc[k, :, :] = _sel(
                    open_k, hacc_sc[k, :, :] + retro, hacc_sc[k, :, :]
                )
            open_slot()

        run_idx = run_idx + (is_start & (run_idx < K_hits)).astype(i32)
        for k in range(kh_eff):
            def accum_slot(k=k):
                started_k = hseg_sc[2 * K_hits + k, :, :] > 0
                ended_k = hseg_sc[3 * K_hits + k, :, :] > 0
                active = started_k & ((zi + t) >= hseg_sc[k, :, :]) & (
                    (~ended_k) | ((zi + t) < hseg_sc[K_hits + k, :, :])
                )
                hacc_sc[k, :, :] = _sel(active, hacc_sc[k, :, :] + sp_t,
                                        hacc_sc[k, :, :])
            accum_slot()
        return (on.astype(i32), run_idx)
      return p1h

    # per-BLOCK occupancy SPECIALIZATION (roofline probe, BENCHMARKS.md r3):
    # ~80% of per-sample ops are K-indexed slot work; blocks whose pass-1
    # maxima fit K_SMALL slots run a variant compiled with the slot loops at
    # K_SMALL. Block-scalar pl.when branches — NOT the per-slot per-sample
    # gates r2 measured 40% slower. Slots >= K_SMALL keep their init values,
    # which downstream combines mask out (cand_valid / started_k are False
    # for every event in such a block).
    def _run_p1h(kh_eff):
        def run():
            _scan_steps(L, make_p1h(kh_eff), (zi, zi), unrolled)
        return run

    if k_small and k_small < K_hits:
        pl.when((max_runs_s > 0) & (max_runs_s <= k_small))(_run_p1h(k_small))
        pl.when(max_runs_s > k_small)(_run_p1h(K_hits))
    else:
        pl.when(max_runs_s > 0)(_run_p1h(K_hits))

    # a started run is always valid: it was either closed during the scan or
    # stays open to the wave end (integral then covers [seg_s, L))
    n_hits = zi
    hit_integral = zf
    for k in range(K_hits):
        started_k = hseg_sc[2 * K_hits + k, :, :] > 0
        n_hits = n_hits + started_k.astype(i32)
        hit_integral = hit_integral + _sel(started_k, hacc_sc[k, :, :], 0.0)

    # ---- features combine ----
    positive = sign > 0
    has_h = count_h > 0
    height = _sel(positive, max_h - bl, bl - min_h)
    height = _sel(has_h, height, 0.0)
    amp = _sel(has_h, max_h - min_h, 0.0)
    area = _sel(positive, sum_a - count_a * bl, count_a * bl - sum_a)
    area = _sel(count_a > 0, area, 0.0)

    pos_s = [pos_sc[k, :, :] for k in range(K)]
    val_s = [val_sc[k, :, :] for k in range(K)]
    cand_valid = [(cand_count > k) for k in range(K)]

    def _write_minimal():
        height_ref[:] = height
        amp_ref[:] = amp
        area_ref[:] = area
        mad_ref[:] = mad
        n_hits_ref[:] = n_hits
        hit_integral_ref[:] = hit_integral
        n_peaks_ref[:] = cand_count
        peak_pos_ref[:] = pos_s[0]
        rise_ref[:] = zf
        fall_ref[:] = zf
        width_ref[:] = zf
        label_ref[:] = zi
        ncand_ref[:] = cand_count
        nruns_ref[:] = n_runs

    if _DEBUG_PASSES <= 1:
        _write_minimal()
        return

    # ---- distance pruning (greedy by height priority) ----
    if peak_distance > 1:
        prio = []
        for i in range(K):
            r = zi
            for j in range(K):
                if i == j:
                    continue
                beats = (val_s[j] > val_s[i]) | (
                    (val_s[j] == val_s[i]) & (j > i)
                )
                r = r + beats.astype(i32)
            prio.append(r)
        keep = list(cand_valid)
        for rank in range(K):
            for i in range(K):
                hit_i = (prio[i] == rank) & cand_valid[i] & keep[i]
                for j in range(K):
                    if j == i:
                        continue
                    close = jnp.abs(pos_s[j] - pos_s[i]) < peak_distance
                    keep[j] = keep[j] & ~(hit_i & close)
        cand_valid = [cand_valid[k] & keep[k] for k in range(K)]

    # ======================= pass 2: prominence =============================
    # prm_sc rows: [0,K) lmin | [K,2K) rmin | [2K,3K) lbase | [3K,4K) rbase |
    # [4K,5K) nh_found (all f32; bases cast on read)
    for k in range(K):
        prm_sc[k, :, :] = jnp.full(S, _INF, f32)
        prm_sc[K + k, :, :] = jnp.full(S, _INF, f32)
        prm_sc[2 * K + k, :, :] = zf
        prm_sc[3 * K + k, :, :] = jnp.full(S, float(L), f32)
        prm_sc[4 * K + k, :, :] = zf

    def make_p2(k_eff):
      def p2(t, c):
        x_t = x_at(t)
        in_det_t = (zi + t) < det_len
        for k in range(k_eff):
            def prom_slot(k=k, x_t=x_t, in_det_t=in_det_t):
                p = pos_s[k]
                v = val_s[k]
                before = (zi + t) < p
                resetl = before & (x_t > v)
                lmin_k = _sel(resetl, f32(_INF), prm_sc[k, :, :])
                lbase_k = _sel(resetl, (zi + t + 1).astype(f32),
                               prm_sc[2 * K + k, :, :])
                upd = (before | ((zi + t) == p)) & in_det_t & (x_t <= lmin_k)
                prm_sc[2 * K + k, :, :] = _sel(upd, (zi + t).astype(f32),
                                               lbase_k)
                prm_sc[k, :, :] = _sel(upd, x_t, lmin_k)
                nh_k = prm_sc[4 * K + k, :, :] > 0
                freeze = ((zi + t) > p) & (x_t > v) & ~nh_k
                nh_new = nh_k | freeze
                prm_sc[4 * K + k, :, :] = nh_new.astype(f32)
                updr = ((zi + t) >= p) & ~nh_new & in_det_t & (
                    x_t < prm_sc[K + k, :, :]
                )
                prm_sc[3 * K + k, :, :] = _sel(updr, (zi + t).astype(f32),
                                               prm_sc[3 * K + k, :, :])
                prm_sc[K + k, :, :] = _sel(updr, x_t, prm_sc[K + k, :, :])
            prom_slot()
        return c
      return p2

    def _gated_cand_pass(make_body):
        def runner(k_eff):
            def run():
                _scan_steps(L, make_body(k_eff), 0, unrolled)
            return run

        if k_small and k_small < K:
            pl.when((max_cands_s > 0) & (max_cands_s <= k_small))(
                runner(k_small)
            )
            pl.when(max_cands_s > k_small)(runner(K))
        else:
            pl.when(max_cands_s > 0)(runner(K))

    _gated_cand_pass(make_p2)

    if _DEBUG_PASSES <= 2:
        _write_minimal()
        return

    lbase = [prm_sc[2 * K + k, :, :].astype(i32) for k in range(K)]
    rbase = [prm_sc[3 * K + k, :, :].astype(i32) for k in range(K)]
    prom = [
        _sel(cand_valid[k],
             val_s[k] - jnp.maximum(prm_sc[k, :, :], prm_sc[K + k, :, :]),
             0.0)
        for k in range(K)
    ]

    # ======================= pass 3: rel-height crossings ===================
    h_eval = [val_s[k] - prom[k] * rel_height for k in range(K)]
    # crs_sc rows per k: 0 jl | K xl | 2K xl1 | 3K jr | 4K xr | 5K xr_1 | 6K arm
    for k in range(K):
        crs_sc[k, :, :] = jnp.full(S, -1.0, f32)
        crs_sc[K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[2 * K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[3 * K + k, :, :] = jnp.full(S, float(L), f32)
        crs_sc[4 * K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[5 * K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[6 * K + k, :, :] = zf

    def make_p3(k_eff):
      def p3(t, c):
        x_t = x_at(t)
        x_p = x_at(jnp.maximum(t - 1, 0))
        in_det_t = (zi + t) < det_len
        tf = (zi + t).astype(f32)
        for k in range(k_eff):
            def cross_slot(k=k, x_t=x_t, x_p=x_p, in_det_t=in_det_t, tf=tf):
                p = pos_s[k]
                arm = crs_sc[6 * K + k, :, :] > 0
                fire = arm & (tf == crs_sc[k, :, :] + 1.0)
                crs_sc[2 * K + k, :, :] = _sel(fire, x_t,
                                               crs_sc[2 * K + k, :, :])
                arm = arm & ~fire
                below = x_t <= h_eval[k]
                updl = below & ((zi + t) >= lbase[k]) & ((zi + t) <= p) \
                    & in_det_t
                crs_sc[k, :, :] = _sel(updl, tf, crs_sc[k, :, :])
                crs_sc[K + k, :, :] = _sel(updl, x_t, crs_sc[K + k, :, :])
                crs_sc[6 * K + k, :, :] = (arm | updl).astype(f32)
                updr = below & ((zi + t) >= p) & ((zi + t) <= rbase[k]) & \
                    in_det_t & (crs_sc[3 * K + k, :, :] >= L)
                crs_sc[3 * K + k, :, :] = _sel(updr, tf,
                                               crs_sc[3 * K + k, :, :])
                crs_sc[4 * K + k, :, :] = _sel(updr, x_t,
                                               crs_sc[4 * K + k, :, :])
                crs_sc[5 * K + k, :, :] = _sel(updr, x_p,
                                               crs_sc[5 * K + k, :, :])
            cross_slot()
        return c
      return p3

    _gated_cand_pass(make_p3)

    lips, rips, final_valid = [], [], []
    for k in range(K):
        jl_k = crs_sc[k, :, :]
        xl_k = crs_sc[K + k, :, :]
        xl1_k = crs_sc[2 * K + k, :, :]
        jr_k = crs_sc[3 * K + k, :, :]
        xr_k = crs_sc[4 * K + k, :, :]
        xr1_k = crs_sc[5 * K + k, :, :]
        has_l = jl_k >= 0
        hev = h_eval[k]
        denom_l = _sel(xl1_k != xl_k, xl1_k - xl_k, 1.0)
        lip = _sel(
            has_l,
            _sel(xl_k < hev, jl_k + (hev - xl_k) / denom_l, jl_k),
            lbase[k].astype(f32),
        )
        has_r = jr_k < L
        denom_r = _sel(xr1_k != xr_k, xr1_k - xr_k, 1.0)
        rip = _sel(
            has_r,
            _sel(xr_k < hev, jr_k - (hev - xr_k) / denom_r, jr_k),
            rbase[k].astype(f32),
        )
        wk = rip - lip
        fv = cand_valid[k] & (prom[k] >= peak_prominence) & (wk >= peak_width)
        lips.append(lip)
        rips.append(rip)
        final_valid.append(fv)

    n_peaks = zi
    for k in range(K):
        n_peaks = n_peaks + final_valid[k].astype(i32)

    if _DEBUG_PASSES <= 3:
        _write_minimal()
        return

    # ======================= pass 4: peak heights ===========================
    ws = [jnp.maximum(jnp.clip(jnp.round(lips[k]).astype(i32), 0, L - 1)
                      - height_ext, 0) for k in range(K)]
    we = [jnp.minimum(jnp.clip(jnp.round(rips[k]).astype(i32), 0, L - 1)
                      + height_ext, L) for k in range(K)]
    for k in range(K):
        ph_sc[k, :, :] = jnp.full(S, -_INF, f32)
        ph_sc[K + k, :, :] = jnp.full(S, _INF, f32)

    def make_p4(k_eff):
      def p4(t, c):
        w_t = wv(t)
        for k in range(k_eff):
            def height_slot(k=k, w_t=w_t):
                inw = ((zi + t) >= ws[k]) & ((zi + t) < we[k])
                ph_sc[k, :, :] = _sel(inw, jnp.maximum(ph_sc[k, :, :], w_t),
                                      ph_sc[k, :, :])
                ph_sc[K + k, :, :] = _sel(
                    inw, jnp.minimum(ph_sc[K + k, :, :], w_t),
                    ph_sc[K + k, :, :]
                )
            height_slot()
        return c
      return p4

    _gated_cand_pass(make_p4)
    pheights = [
        _sel(final_valid[k] & (ws[k] < we[k]),
             ph_sc[k, :, :] - ph_sc[K + k, :, :], 0.0)
        for k in range(K)
    ]

    best_v = jnp.full(S, -_INF, f32)
    best_p = pos_s[0]
    for k in range(K):
        cand = _sel(final_valid[k], pheights[k], f32(-_INF))
        take = cand > best_v
        best_v = _sel(take, cand, best_v)
        best_p = _sel(take, pos_s[k], best_p)
    has_peak = zb
    for k in range(K):
        has_peak = has_peak | final_valid[k]

    if _DEBUG_PASSES <= 4:
        _write_minimal()
        return

    # ======================= pass 5: widths at dominant peak ===============
    nb = min(baseline_samples, L)
    bl_w = bl_w_sum / nb
    p_w = _sel(has_peak, best_p, 0)
    p_safe = jnp.clip(p_w, 0, L - 1)

    # wid_sc rows: 0..3 cr_idx | 4..7 cr_y0 | 8..11 cr_y1 | 12..15 pend | 16 pv
    for q in range(4):
        wid_sc[q, :, :] = jnp.full(S, float(L), f32)
        wid_sc[4 + q, :, :] = jnp.full(S, _NEG, f32)
        wid_sc[8 + q, :, :] = jnp.full(S, _NEG, f32)
        wid_sc[12 + q, :, :] = zf
    wid_sc[16, :, :] = jnp.full(S, _NEG, f32)

    # every p5 output is masked by has_peak downstream, so peakless blocks
    # skip all three width walks
    any_peak_s = jnp.max(n_peaks) > 0

    def p5a(t, c):
        corr_t = sig_at(t) - bl_w
        wid_sc[16, :, :] = _sel((zi + t) == p_safe, corr_t, wid_sc[16, :, :])
        return c

    def run_p5a():
        _scan_steps(L, p5a, 0, unrolled)
    pl.when(any_peak_s)(run_p5a)
    pv = wid_sc[16, :, :]
    valid_w = (p_w >= 0) & (p_w < L) & (pv > 0)
    thr_rl = pv * rise_low
    thr_rh = pv * rise_high

    def p5(t, c):
        corr_t = sig_at(t) - bl_w
        corr_p = sig_at(jnp.maximum(t - 1, 0)) - bl_w
        conds = [
            (corr_t >= thr_rl) & ((zi + t) < p_w),
            (corr_t >= thr_rh) & ((zi + t) < p_w),
            (corr_t <= thr_rh) & ((zi + t) >= p_w),
            (corr_t <= thr_rl) & ((zi + t) >= p_w),
        ]
        tf = (zi + t).astype(f32)
        for q in range(4):
            pend = wid_sc[12 + q, :, :] > 0
            fire = pend & ((zi + t) == 1)
            wid_sc[4 + q, :, :] = _sel(fire, corr_p, wid_sc[4 + q, :, :])
            wid_sc[8 + q, :, :] = _sel(fire, corr_t, wid_sc[8 + q, :, :])
            pend = pend & ~fire
            new = conds[q] & (wid_sc[q, :, :] >= L)
            wid_sc[q, :, :] = _sel(new, tf, wid_sc[q, :, :])
            at0 = new & ((zi + t) == 0)
            pend = pend | at0
            ok_now = new & ((zi + t) >= 1)
            wid_sc[4 + q, :, :] = _sel(ok_now, corr_p, wid_sc[4 + q, :, :])
            wid_sc[8 + q, :, :] = _sel(ok_now, corr_t, wid_sc[8 + q, :, :])
            wid_sc[12 + q, :, :] = pend.astype(f32)
        return c

    def run_p5():
        _scan_steps(L, p5, 0, unrolled)
    pl.when(any_peak_s)(run_p5)

    def cross_out(q, thr, rising):
        idx = wid_sc[q, :, :]
        found = idx < L
        y0 = wid_sc[4 + q, :, :]
        y1 = wid_sc[8 + q, :, :]
        denom = y1 - y0
        small = jnp.abs(denom) < 1e-10
        frac = _sel(small, 0.0, (thr - y0) / _sel(small, 1.0, denom))
        i_safe = jnp.clip(idx, 1.0, float(L - 1))
        interp = (i_safe - 1.0) + frac
        if rising:
            out = _sel((idx > 0) & ~small, interp, idx)
        else:
            rel = idx - p_w.astype(f32)
            out = _sel((rel > 0) & ~small, interp, idx)
        return out, found

    r_low, r_low_ok = cross_out(0, thr_rl, True)
    r_high, r_high_ok = cross_out(1, thr_rh, True)
    f_high, f_high_ok = cross_out(2, thr_rh, False)
    f_low, f_low_ok = cross_out(3, thr_rl, False)
    rise_v = _sel(r_low_ok & r_high_ok, r_high - r_low, 0.0)
    fall_v = _sel(f_high_ok & f_low_ok, f_low - f_high, 0.0)
    total_v = _sel(r_low_ok & f_low_ok, f_low - r_low, 0.0)

    width_samples = _sel(has_peak & valid_w, total_v, 0.0)
    rise_out = _sel(has_peak, rise_v, 0.0)
    fall_out = _sel(has_peak, fall_v, 0.0)

    classified = has_peak & (width_samples > 0)
    label = _sel(
        classified & (width_samples <= s1_width_max), 1,
        _sel(classified & (width_samples >= s2_width_min), 2, 0),
    ).astype(i32)

    height_ref[:] = height
    amp_ref[:] = amp
    area_ref[:] = area
    mad_ref[:] = mad
    peak_pos_ref[:] = _sel(has_peak, best_p, -1).astype(i32)
    n_peaks_ref[:] = n_peaks
    n_hits_ref[:] = n_hits
    hit_integral_ref[:] = hit_integral
    rise_ref[:] = rise_out
    fall_ref[:] = fall_out
    width_ref[:] = width_samples
    label_ref[:] = label
    # raw (uncapped) candidate/run counts: the host wrapper derives the
    # overflow counters from these (overflow contract, full_chain.py)
    ncand_ref[:] = cand_count
    nruns_ref[:] = n_runs


def _p1_quad_setting() -> bool:
    """Pass-1 quad read-sharing (A/B probe): read+convert each sample once
    per 4-step quad instead of ~4 dynamic re-reads per step. Env
    WFA_CHAIN_P1_QUAD=0/1 overrides; read at trace time."""
    import os

    raw = os.environ.get("WFA_CHAIN_P1_QUAD")
    if raw is None:
        return False
    return raw not in ("0", "", "false", "off")


def _k_small_setting(interpret: bool) -> int:
    """Occupancy-specialization width (0 disables). Default OFF everywhere:
    the 2026-08-18 interleaved A/B on the real chip measured the K=2
    specialized variant within noise of the plain kernel (median 9.27 vs
    9.80 ms, best 9.02 vs 9.11 ms @ 65536x256; full-bench runs swung the
    other way) — the roofline's ~2x prediction was refuted, so the extra
    per-pass variants only grow the Mosaic executable (BENCHMARKS.md r3).
    Env WFA_CHAIN_K_SMALL overrides for A/B runs and the parity test."""
    import os

    raw = os.environ.get("WFA_CHAIN_K_SMALL")
    if raw is None:
        return 0
    try:
        return int(raw)
    except ValueError:
        return 0


def chain_scan_pallas(
    waves: jax.Array,
    event_length: jax.Array,
    baselines: jax.Array,
    polarity_codes: jax.Array,
    cfg: Any = None,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """Streaming-scan fused chain; contract of full_chain_step."""
    from waveformanalysis_tpu.models.full_chain import ChainConfig

    cfg = cfg or ChainConfig()
    n, L = waves.shape
    pad = (-n) % BLOCK_EVENTS
    if pad:
        waves = jnp.pad(waves, ((0, pad), (0, 0)))
        event_length = jnp.pad(event_length, (0, pad))
        baselines = jnp.pad(baselines, (0, pad))
        polarity_codes = jnp.pad(polarity_codes, (0, pad))
    n_pad = n + pad

    sign = jnp.where(polarity_codes > 0, 1.0, -1.0).astype(jnp.float32)
    w_T = waves.T.reshape(L, n_pad // _LANE, _LANE)
    el2 = event_length.astype(jnp.int32).reshape(n_pad // _LANE, _LANE)
    bl2 = baselines.astype(jnp.float32).reshape(n_pad // _LANE, _LANE)
    sg2 = sign.reshape(n_pad // _LANE, _LANE)

    K = int(cfg.max_peaks)
    K_hits = int(cfg.max_hits)
    hs, he = cfg.height_range
    kernel = functools.partial(
        _chain_scan_kernel,
        L=L,
        height_window=(hs, min(he, L)),
        peak_height=float(cfg.peak_height),
        peak_distance=int(cfg.peak_distance),
        peak_prominence=float(cfg.peak_prominence),
        peak_width=float(cfg.peak_width),
        rel_height=0.5,
        use_derivative=bool(cfg.use_derivative),
        K=K,
        hit_threshold=float(cfg.hit_threshold),
        left_extension=int(cfg.left_extension),
        right_extension=int(cfg.right_extension),
        K_hits=K_hits,
        height_ext=4,
        rise_low=float(cfg.rise_low),
        rise_high=float(cfg.rise_high),
        s1_width_max=float(cfg.s1_width_max),
        s2_width_min=float(cfg.s2_width_min),
        baseline_samples=50,
        unrolled=not interpret,
        k_small=_k_small_setting(interpret),
        p1_quad=_p1_quad_setting(),
    )

    grid = (n_pad // BLOCK_EVENTS,)
    evt_spec = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32, i32 = jnp.float32, jnp.int32
    out_dtypes = [f32, f32, f32, f32, i32, i32, i32, f32, f32, f32, f32,
                  i32, i32, i32]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, _SUB, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            evt_spec, evt_spec, evt_spec,
        ],
        out_specs=[evt_spec] * 14,
        out_shape=[jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), dt)
                   for dt in out_dtypes],
        scratch_shapes=[
            pltpu.VMEM((K, _SUB, _LANE), i32),            # pos_sc
            pltpu.VMEM((K, _SUB, _LANE), f32),            # val_sc
            pltpu.VMEM((K_hits * 4, _SUB, _LANE), i32),   # hseg_sc
            pltpu.VMEM((K_hits, _SUB, _LANE), f32),       # hacc_sc
            pltpu.VMEM((K * 5, _SUB, _LANE), f32),        # prm_sc
            pltpu.VMEM((K * 7, _SUB, _LANE), f32),        # crs_sc
            pltpu.VMEM((K * 2, _SUB, _LANE), f32),        # ph_sc
            pltpu.VMEM((17, _SUB, _LANE), f32),           # wid_sc
        ],
        interpret=interpret,
    )(w_T, el2, bl2, sg2)

    keys = (
        "height", "amp", "area", "max_abs_diff", "peak_position", "n_peaks",
        "n_hits", "hit_integral", "rise_samples", "fall_samples",
        "width_samples", "label", "_n_candidates", "_n_runs",
    )
    result = {k: v.reshape(n_pad)[:n] for k, v in zip(keys, outs)}
    result["label"] = result["label"].astype(jnp.int8)
    # overflow contract (same keys as models.full_chain.full_chain_step)
    result["n_peak_overflow"] = jnp.sum(
        result.pop("_n_candidates") > K
    ).astype(jnp.int32)
    result["n_hit_overflow"] = jnp.sum(
        result.pop("_n_runs") > K_hits
    ).astype(jnp.int32)
    return result


def make_jit_chain_scan(cfg: Any = None, interpret: bool = False):
    from waveformanalysis_tpu.models.full_chain import ChainConfig

    cfg = cfg or ChainConfig()

    @jax.jit
    def step(waves, event_length, baselines, polarity_codes):
        return chain_scan_pallas(waves, event_length, baselines,
                                 polarity_codes, cfg, interpret=interpret)

    return step


def make_sharded_chain_scan(mesh, cfg: Any = None, axis: str = "data",
                            interpret: bool = False):
    """Streaming-scan chain sharded over the event axis (psum stats).

    Same output contract as models.full_chain.make_sharded_chain; pass
    interpret=True on CPU meshes.
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
        out = chain_scan_pallas(waves, event_length, baselines,
                                polarity_codes, cfg, interpret=interpret)
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


def _peaks_scan_kernel(
    x_ref, vlen_ref,
    pos_ref, valid_ref, pval_ref, prom_ref, lips_ref, rips_ref,
    wid_ref, lbase_ref, rbase_ref, ncand_ref,
    pos_sc, val_sc, prm_sc, crs_sc,
    *,
    L: int,
    height: float,
    prominence: float,
    width: float,
    distance: int,
    K: int,
    rel_height: float,
    unrolled: bool = True,
    k_small: int = 0,
):
    """Standalone scipy-parity find_peaks as 3 time-major scan passes.

    Same contract as ops.peaks.find_peaks_batch, but O(L) per event instead
    of K x L-wide masked reductions. Input x_ref is the raw detection signal
    (padding handled via vlen masking, like the XLA kernel's _NEG fill).
    """
    S = (_SUB, _LANE)
    f32 = jnp.float32
    i32 = jnp.int32
    det_len = vlen_ref[:].astype(i32)
    zf = jnp.zeros(S, f32)
    zi = jnp.zeros(S, i32)

    def x_at(t):
        raw = x_ref[t, :, :].astype(f32)
        return _sel((zi + t) < det_len, raw, f32(_NEG))

    for k in range(K):
        pos_sc[k, :, :] = jnp.full(S, -1, i32)
        val_sc[k, :, :] = jnp.full(S, _NEG, f32)

    # ---- pass 1: plateau candidate emission ----
    def p1(t, c):
        prev_rise_i, left_edge, cand_count = c
        prev_rise = prev_rise_i > 0
        cur_x = x_at(t)
        prev_xv = x_at(jnp.maximum(t - 1, 0))
        d2 = cur_x - prev_xv
        have = (zi + t) >= 1
        emit = have & (d2 < 0) & prev_rise & ((zi + t) <= det_len - 1)
        m_pt = (left_edge + (t - 1)) // 2
        emit = emit & (m_pt >= 1) & (m_pt <= det_len - 2) & (prev_xv >= height)
        for k in range(K):
            wr = emit & (cand_count == k)
            pos_sc[k, :, :] = _sel(wr, m_pt, pos_sc[k, :, :])
            val_sc[k, :, :] = _sel(wr, prev_xv, val_sc[k, :, :])
        cand_count = cand_count + emit.astype(i32)
        nz = have & (d2 != 0)
        prev_rise_i = _sel(nz, (d2 > 0).astype(i32), prev_rise_i)
        left_edge = _sel(nz, zi + t, left_edge)
        return (prev_rise_i, left_edge, cand_count)

    _, _, cand_count = _scan_steps(L, p1, (zi, zi, zi), unrolled)

    pos_s = [pos_sc[k, :, :] for k in range(K)]
    val_s = [val_sc[k, :, :] for k in range(K)]
    cand_valid = [(cand_count > k) for k in range(K)]
    # occupancy gate: slots no event in this block reaches skip passes 2-3
    max_cands_s = jnp.max(jnp.minimum(cand_count, K))

    if distance > 1:
        prio = []
        for i in range(K):
            r = zi
            for j in range(K):
                if i == j:
                    continue
                beats = (val_s[j] > val_s[i]) | (
                    (val_s[j] == val_s[i]) & (j > i)
                )
                r = r + beats.astype(i32)
            prio.append(r)
        keep = list(cand_valid)
        for rank in range(K):
            for i in range(K):
                hit_i = (prio[i] == rank) & cand_valid[i] & keep[i]
                for j in range(K):
                    if j == i:
                        continue
                    close = jnp.abs(pos_s[j] - pos_s[i]) < distance
                    keep[j] = keep[j] & ~(hit_i & close)
        cand_valid = [cand_valid[k] & keep[k] for k in range(K)]

    # ---- pass 2: prominence bases ----
    for k in range(K):
        prm_sc[k, :, :] = jnp.full(S, _INF, f32)
        prm_sc[K + k, :, :] = jnp.full(S, _INF, f32)
        prm_sc[2 * K + k, :, :] = zf
        prm_sc[3 * K + k, :, :] = jnp.full(S, float(L), f32)
        prm_sc[4 * K + k, :, :] = zf

    def make_p2(k_eff):
      def p2(t, c):
        x_t = x_at(t)
        in_det_t = (zi + t) < det_len
        for k in range(k_eff):
            def prom_slot(k=k, x_t=x_t, in_det_t=in_det_t):
                p = pos_s[k]
                v = val_s[k]
                before = (zi + t) < p
                resetl = before & (x_t > v)
                lmin_k = _sel(resetl, f32(_INF), prm_sc[k, :, :])
                lbase_k = _sel(resetl, (zi + t + 1).astype(f32),
                               prm_sc[2 * K + k, :, :])
                upd = (before | ((zi + t) == p)) & in_det_t & (x_t <= lmin_k)
                prm_sc[2 * K + k, :, :] = _sel(upd, (zi + t).astype(f32),
                                               lbase_k)
                prm_sc[k, :, :] = _sel(upd, x_t, lmin_k)
                nh_k = prm_sc[4 * K + k, :, :] > 0
                freeze = ((zi + t) > p) & (x_t > v) & ~nh_k
                nh_new = nh_k | freeze
                prm_sc[4 * K + k, :, :] = nh_new.astype(f32)
                updr = ((zi + t) >= p) & ~nh_new & in_det_t & (
                    x_t < prm_sc[K + k, :, :]
                )
                prm_sc[3 * K + k, :, :] = _sel(updr, (zi + t).astype(f32),
                                               prm_sc[3 * K + k, :, :])
                prm_sc[K + k, :, :] = _sel(updr, x_t, prm_sc[K + k, :, :])
            prom_slot()
        return c
      return p2

    def _gated_cand_pass(make_body):
        def runner(k_eff):
            def run():
                _scan_steps(L, make_body(k_eff), 0, unrolled)
            return run

        if k_small and k_small < K:
            pl.when((max_cands_s > 0) & (max_cands_s <= k_small))(
                runner(k_small)
            )
            pl.when(max_cands_s > k_small)(runner(K))
        else:
            pl.when(max_cands_s > 0)(runner(K))

    _gated_cand_pass(make_p2)

    lbase = [prm_sc[2 * K + k, :, :].astype(i32) for k in range(K)]
    rbase = [prm_sc[3 * K + k, :, :].astype(i32) for k in range(K)]
    prom = [
        _sel(cand_valid[k],
             val_s[k] - jnp.maximum(prm_sc[k, :, :], prm_sc[K + k, :, :]),
             0.0)
        for k in range(K)
    ]

    # ---- pass 3: rel-height crossings ----
    h_eval = [val_s[k] - prom[k] * rel_height for k in range(K)]
    for k in range(K):
        crs_sc[k, :, :] = jnp.full(S, -1.0, f32)
        crs_sc[K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[2 * K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[3 * K + k, :, :] = jnp.full(S, float(L), f32)
        crs_sc[4 * K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[5 * K + k, :, :] = jnp.full(S, _NEG, f32)
        crs_sc[6 * K + k, :, :] = zf

    def make_p3(k_eff):
      def p3(t, c):
        x_t = x_at(t)
        x_p = x_at(jnp.maximum(t - 1, 0))
        in_det_t = (zi + t) < det_len
        tf = (zi + t).astype(f32)
        for k in range(k_eff):
            def cross_slot(k=k, x_t=x_t, x_p=x_p, in_det_t=in_det_t, tf=tf):
                p = pos_s[k]
                arm = crs_sc[6 * K + k, :, :] > 0
                fire = arm & (tf == crs_sc[k, :, :] + 1.0)
                crs_sc[2 * K + k, :, :] = _sel(fire, x_t,
                                               crs_sc[2 * K + k, :, :])
                arm = arm & ~fire
                below = x_t <= h_eval[k]
                updl = below & ((zi + t) >= lbase[k]) & ((zi + t) <= p) \
                    & in_det_t
                crs_sc[k, :, :] = _sel(updl, tf, crs_sc[k, :, :])
                crs_sc[K + k, :, :] = _sel(updl, x_t, crs_sc[K + k, :, :])
                crs_sc[6 * K + k, :, :] = (arm | updl).astype(f32)
                updr = below & ((zi + t) >= p) & ((zi + t) <= rbase[k]) & \
                    in_det_t & (crs_sc[3 * K + k, :, :] >= L)
                crs_sc[3 * K + k, :, :] = _sel(updr, tf,
                                               crs_sc[3 * K + k, :, :])
                crs_sc[4 * K + k, :, :] = _sel(updr, x_t,
                                               crs_sc[4 * K + k, :, :])
                crs_sc[5 * K + k, :, :] = _sel(updr, x_p,
                                               crs_sc[5 * K + k, :, :])
            cross_slot()
        return c
      return p3

    _gated_cand_pass(make_p3)

    for k in range(K):
        jl_k = crs_sc[k, :, :]
        xl_k = crs_sc[K + k, :, :]
        xl1_k = crs_sc[2 * K + k, :, :]
        jr_k = crs_sc[3 * K + k, :, :]
        xr_k = crs_sc[4 * K + k, :, :]
        xr1_k = crs_sc[5 * K + k, :, :]
        has_l = jl_k >= 0
        hev = h_eval[k]
        denom_l = _sel(xl1_k != xl_k, xl1_k - xl_k, 1.0)
        lip = _sel(
            has_l,
            _sel(xl_k < hev, jl_k + (hev - xl_k) / denom_l, jl_k),
            lbase[k].astype(f32),
        )
        has_r = jr_k < L
        denom_r = _sel(xr1_k != xr_k, xr1_k - xr_k, 1.0)
        rip = _sel(
            has_r,
            _sel(xr_k < hev, jr_k - (hev - xr_k) / denom_r, jr_k),
            rbase[k].astype(f32),
        )
        ok = cand_valid[k]
        lip = _sel(ok, lip, 0.0)
        rip = _sel(ok, rip, 0.0)
        wk = rip - lip
        fv = ok & (prom[k] >= prominence) & (wk >= width)
        pos_ref[k, :, :] = _sel(fv, pos_s[k], -1)
        valid_ref[k, :, :] = fv.astype(i32)
        pval_ref[k, :, :] = val_s[k]
        prom_ref[k, :, :] = prom[k]
        lips_ref[k, :, :] = lip
        rips_ref[k, :, :] = rip
        wid_ref[k, :, :] = wk
        lbase_ref[k, :, :] = _sel(ok, lbase[k], 0)
        rbase_ref[k, :, :] = _sel(ok, rbase[k], 0)
    ncand_ref[:] = cand_count


@partial(
    jax.jit,
    static_argnames=("height", "prominence", "width", "distance",
                     "max_peaks", "rel_height", "interpret"),
)
def find_peaks_scan(
    signal: jax.Array,
    height: float,
    prominence: float,
    width: float,
    distance: int = 1,
    max_peaks: int = 8,
    rel_height: float = 0.5,
    valid_length: jax.Array = None,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """find_peaks over an (n, L) batch via the streaming scan — drop-in for
    ops.peaks.find_peaks_batch (same outputs, scipy parity, ~5x faster on
    TPU at production batch sizes)."""
    x = signal.astype(jnp.float32)
    n, L = x.shape
    K = int(max_peaks)
    if valid_length is None:
        vlen = jnp.full((n,), L, jnp.int32)
    else:
        vlen = valid_length.astype(jnp.int32)

    pad = (-n) % BLOCK_EVENTS
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        vlen = jnp.pad(vlen, (0, pad))
    n_pad = n + pad

    x_T = x.T.reshape(L, n_pad // _LANE, _LANE)
    vl2 = vlen.reshape(n_pad // _LANE, _LANE)

    kernel = functools.partial(
        _peaks_scan_kernel,
        L=L, height=float(height), prominence=float(prominence),
        width=float(width), distance=int(distance), K=K,
        rel_height=float(rel_height), unrolled=not interpret,
        k_small=_k_small_setting(interpret),
    )
    f32, i32 = jnp.float32, jnp.int32
    evt_spec = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((K, _SUB, _LANE), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    out_dtypes = [i32, i32, f32, f32, f32, f32, f32, i32, i32]
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // BLOCK_EVENTS,),
        in_specs=[
            pl.BlockSpec((L, _SUB, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            evt_spec,
        ],
        out_specs=[k_spec] * 9 + [evt_spec],
        out_shape=[jax.ShapeDtypeStruct((K, n_pad // _LANE, _LANE), dt)
                   for dt in out_dtypes]
        + [jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), i32)],
        scratch_shapes=[
            pltpu.VMEM((K, _SUB, _LANE), i32),      # pos_sc
            pltpu.VMEM((K, _SUB, _LANE), f32),      # val_sc
            pltpu.VMEM((K * 5, _SUB, _LANE), f32),  # prm_sc
            pltpu.VMEM((K * 7, _SUB, _LANE), f32),  # crs_sc
        ],
        interpret=interpret,
    )(x_T, vl2)

    def unk(a):  # (K, n//L, L) -> (n, K)
        return a.reshape(K, n_pad).T[:n]

    keys = ("position", "valid", "peak_value", "prominence", "left_ips",
            "right_ips", "widths", "left_bases", "right_bases")
    result = {k: unk(v) for k, v in zip(keys, outs[:9])}
    result["valid"] = result["valid"] > 0
    result["n_candidates"] = outs[9].reshape(n_pad)[:n]
    return result


def _hits_scan_kernel(
    x_ref, thr_ref, vlen_ref,
    valid_ref, pos_ref, height_ref, integ_ref, segs_ref, sege_ref,
    rstart_ref, rend_ref, nruns_ref,
    hseg_sc, hval_sc,
    *,
    L: int,
    left_extension: int,
    right_extension: int,
    K_hits: int,
    unrolled: bool = True,
):
    """Threshold-run detection as ONE time-major scan pass.

    Same contract as ops.hits.threshold_hits_batch. Per-slot state lives in
    scratch: hseg_sc rows = [seg_s | seg_e | started | ended | run_start |
    run_end | hpos] (i32), hval_sc rows = [acc | hmax] (f32).
    """
    S = (_SUB, _LANE)
    f32 = jnp.float32
    i32 = jnp.int32
    thr = thr_ref[:]
    el = vlen_ref[:].astype(i32)
    zf = jnp.zeros(S, f32)
    zi = jnp.zeros(S, i32)

    def sig_at(t):
        return x_ref[t, :, :].astype(f32)

    for k in range(K_hits):
        hseg_sc[k, :, :] = jnp.full(S, L + 16, i32)            # seg_s
        hseg_sc[K_hits + k, :, :] = jnp.full(S, L + 16, i32)   # seg_e
        hseg_sc[2 * K_hits + k, :, :] = zi                     # started
        hseg_sc[3 * K_hits + k, :, :] = zi                     # ended
        hseg_sc[4 * K_hits + k, :, :] = zi                     # run_start
        hseg_sc[5 * K_hits + k, :, :] = jnp.full(S, L, i32)    # run_end
        hseg_sc[6 * K_hits + k, :, :] = zi                     # hpos
        hval_sc[k, :, :] = zf                                  # acc
        hval_sc[K_hits + k, :, :] = jnp.full(S, -_INF, f32)    # hmax

    # cheap counting pre-pass: total runs per event -> per-block slot gates
    def count(t, c):
        prev_on_i, n_runs = c
        on = (sig_at(t) >= thr) & ((zi + t) < el)
        is_start = on & ~(prev_on_i > 0)
        return (on.astype(i32), n_runs + is_start.astype(i32))

    _, n_runs = _scan_steps(L, count, (zi, zi), unrolled)
    max_runs_s = jnp.max(jnp.minimum(n_runs, K_hits))

    def body(t, c):
        prev_on_i, run_idx = c
        prev_on = prev_on_i > 0
        sig_t = sig_at(t)
        sp_t = jnp.maximum(sig_t, 0.0)
        on = (sig_t >= thr) & ((zi + t) < el)
        is_start = on & ~prev_on
        ended_prev = prev_on & ~on
        for k in range(K_hits):
            def close_slot(k=k):
                started_k = hseg_sc[2 * K_hits + k, :, :] > 0
                ended_k = hseg_sc[3 * K_hits + k, :, :] > 0
                close_k = ended_prev & started_k & ~ended_k & (
                    run_idx == k + 1
                )
                hseg_sc[K_hits + k, :, :] = _sel(
                    close_k, jnp.minimum(zi + t + right_extension, L),
                    hseg_sc[K_hits + k, :, :],
                )
                hseg_sc[5 * K_hits + k, :, :] = _sel(
                    close_k, zi + t, hseg_sc[5 * K_hits + k, :, :]
                )
                hseg_sc[3 * K_hits + k, :, :] = (
                    ended_k | close_k
                ).astype(i32)
            close_slot()
        for k in range(K_hits):
            def open_slot(k=k):
                open_k = is_start & (run_idx == k)
                ss = jnp.maximum(zi + t - left_extension, 0)
                hseg_sc[k, :, :] = _sel(open_k, ss, hseg_sc[k, :, :])
                hseg_sc[4 * K_hits + k, :, :] = _sel(
                    open_k, zi + t, hseg_sc[4 * K_hits + k, :, :]
                )
                started_k = hseg_sc[2 * K_hits + k, :, :] > 0
                hseg_sc[2 * K_hits + k, :, :] = (
                    started_k | open_k
                ).astype(i32)
                # retro-include the left-extension samples (indices t-1,
                # t-2) in both the integral and the max, re-read from the
                # input ref
                for back in range(left_extension, 0, -1):
                    idx_b = zi + t - back
                    x_b = sig_at(jnp.maximum(t - back, 0))
                    in_seg = open_k & (idx_b >= ss) & (idx_b >= 0)
                    hval_sc[k, :, :] = _sel(
                        in_seg, hval_sc[k, :, :] + jnp.maximum(x_b, 0.0),
                        hval_sc[k, :, :],
                    )
                    better = in_seg & (x_b > hval_sc[K_hits + k, :, :])
                    hseg_sc[6 * K_hits + k, :, :] = _sel(
                        better, idx_b, hseg_sc[6 * K_hits + k, :, :]
                    )
                    hval_sc[K_hits + k, :, :] = _sel(
                        better, x_b, hval_sc[K_hits + k, :, :]
                    )
            open_slot()
        run_idx = run_idx + (is_start & (run_idx < K_hits)).astype(i32)
        for k in range(K_hits):
            def accum_slot(k=k):
                started_k = hseg_sc[2 * K_hits + k, :, :] > 0
                ended_k = hseg_sc[3 * K_hits + k, :, :] > 0
                active = started_k & ((zi + t) >= hseg_sc[k, :, :]) & (
                    (~ended_k) | ((zi + t) < hseg_sc[K_hits + k, :, :])
                )
                hval_sc[k, :, :] = _sel(active, hval_sc[k, :, :] + sp_t,
                                        hval_sc[k, :, :])
                better = active & (sig_t > hval_sc[K_hits + k, :, :])
                hseg_sc[6 * K_hits + k, :, :] = _sel(
                    better, zi + t, hseg_sc[6 * K_hits + k, :, :]
                )
                hval_sc[K_hits + k, :, :] = _sel(
                    better, sig_t, hval_sc[K_hits + k, :, :]
                )
            accum_slot()
        return (on.astype(i32), run_idx)

    def run_body():
        _scan_steps(L, body, (zi, zi), unrolled)
    pl.when(max_runs_s > 0)(run_body)

    for k in range(K_hits):
        started_k = hseg_sc[2 * K_hits + k, :, :] > 0
        valid_ref[k, :, :] = started_k.astype(i32)
        pos_ref[k, :, :] = _sel(started_k, hseg_sc[6 * K_hits + k, :, :], 0)
        height_ref[k, :, :] = _sel(started_k, hval_sc[K_hits + k, :, :], 0.0)
        integ_ref[k, :, :] = _sel(started_k, hval_sc[k, :, :], 0.0)
        ended_k = hseg_sc[3 * K_hits + k, :, :] > 0
        # a run still open at the wave end closes at L
        segs_ref[k, :, :] = _sel(started_k, hseg_sc[k, :, :], 0)
        sege_ref[k, :, :] = _sel(
            started_k, _sel(ended_k, hseg_sc[K_hits + k, :, :], zi + L), 0
        )
        rstart_ref[k, :, :] = _sel(started_k, hseg_sc[4 * K_hits + k, :, :], 0)
        rend_ref[k, :, :] = _sel(
            started_k, _sel(ended_k, hseg_sc[5 * K_hits + k, :, :], zi + L), 0
        )
    nruns_ref[:] = n_runs


@partial(
    jax.jit,
    static_argnames=("left_extension", "right_extension", "max_hits",
                     "interpret"),
)
def threshold_hits_scan(
    signal: jax.Array,
    thresholds: jax.Array,
    valid_length: jax.Array,
    left_extension: int = 2,
    right_extension: int = 2,
    max_hits: int = 8,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """Threshold-run detection via the streaming scan — drop-in for
    ops.hits.threshold_hits_batch (same outputs)."""
    x = signal.astype(jnp.float32)
    n, L = x.shape
    K_hits = int(max_hits)
    thr = thresholds.astype(jnp.float32)
    vlen = valid_length.astype(jnp.int32)

    pad = (-n) % BLOCK_EVENTS
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        thr = jnp.pad(thr, (0, pad), constant_values=jnp.float32(_INF))
        vlen = jnp.pad(vlen, (0, pad))
    n_pad = n + pad

    x_T = x.T.reshape(L, n_pad // _LANE, _LANE)
    thr2 = thr.reshape(n_pad // _LANE, _LANE)
    vl2 = vlen.reshape(n_pad // _LANE, _LANE)

    kernel = functools.partial(
        _hits_scan_kernel,
        L=L, left_extension=int(left_extension),
        right_extension=int(right_extension), K_hits=K_hits,
        unrolled=not interpret,
    )
    f32, i32 = jnp.float32, jnp.int32
    evt_spec = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((K_hits, _SUB, _LANE), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    out_dtypes = [i32, i32, f32, f32, i32, i32, i32, i32]
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // BLOCK_EVENTS,),
        in_specs=[
            pl.BlockSpec((L, _SUB, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            evt_spec, evt_spec,
        ],
        out_specs=[k_spec] * 8 + [evt_spec],
        out_shape=[jax.ShapeDtypeStruct((K_hits, n_pad // _LANE, _LANE), dt)
                   for dt in out_dtypes]
        + [jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), i32)],
        scratch_shapes=[
            pltpu.VMEM((K_hits * 7, _SUB, _LANE), i32),
            pltpu.VMEM((K_hits * 2, _SUB, _LANE), f32),
        ],
        interpret=interpret,
    )(x_T, thr2, vl2)

    def unk(a):
        return a.reshape(K_hits, n_pad).T[:n]

    keys = ("valid", "position", "height", "integral", "seg_start",
            "seg_end", "run_start", "run_end")
    result = {k: unk(v) for k, v in zip(keys, outs[:8])}
    result["valid"] = result["valid"] > 0
    result["n_runs"] = outs[8].reshape(n_pad)[:n]
    return result

