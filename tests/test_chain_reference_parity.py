"""End-to-end parity: the fused device chain vs a literal per-event
NumPy/SciPy reference loop.

Per-kernel parity (vs scipy find_peaks, vs numpy reductions, ...) is pinned
in each kernel's own test file; this test composes the WHOLE reference
semantics — features, scipy peak finding, dominant-peak selection via
minmax window heights, threshold runs with edge extensions, 10-90% width
crossings with interpolation, S1/S2 range labels — in one plain Python
loop (the reference implementation style, SURVEY §3.1 hot loops) and
requires the single fused device program to reproduce every output.
"""

import zlib

import numpy as np
import pytest
from scipy.signal import find_peaks

import jax.numpy as jnp

from waveformanalysis_tpu.models.full_chain import ChainConfig, full_chain_step


def reference_chain_loop(waves, event_length, baselines, polarity, cfg):
    n, L = waves.shape
    hs, he = cfg.height_range
    he = min(he, L)
    out = {k: [] for k in (
        "height", "amp", "area", "max_abs_diff", "peak_position", "n_peaks",
        "n_candidates", "n_hits", "hit_integral", "rise_samples",
        "fall_samples", "width_samples", "label")}

    for i in range(n):
        w = waves[i].astype(np.float64)
        el = int(event_length[i])
        b = float(baselines[i])
        sign = 1.0 if polarity[i] > 0 else -1.0
        valid = np.arange(L) < el

        # ---- basic features ----
        wwin = w[hs:he][valid[hs:he]]
        if len(wwin):
            height = (wwin.max() - b) if sign > 0 else (b - wwin.min())
            amp = wwin.max() - wwin.min()
        else:
            height = amp = 0.0
        wv = w[valid]
        area = (wv.sum() - len(wv) * b) * (1.0 if sign > 0 else -1.0) \
            if len(wv) else 0.0
        mad = float(np.max(np.abs(np.diff(wv)))) if len(wv) > 1 else 0.0

        # ---- peak finding (scipy) on the polarity-normalized signal ----
        signal = sign * (w - b)
        det = signal[:el]
        pos, props = find_peaks(
            det, height=cfg.peak_height, distance=cfg.peak_distance,
            prominence=cfg.peak_prominence, width=cfg.peak_width,
        )
        n_peaks = len(pos)
        # candidate count = local maxima passing the height filter only —
        # the quantity the device kernels bound by max_peaks slots (scipy
        # applies height before distance/prominence/width, so candidates
        # are a superset of accepted peaks)
        n_candidates = len(find_peaks(det, height=cfg.peak_height)[0])

        # ---- threshold runs with +-extension (hit plugin semantics) ----
        on = (signal >= cfg.hit_threshold) & valid
        starts = np.flatnonzero(on & ~np.concatenate([[False], on[:-1]]))
        ends = np.flatnonzero(on & ~np.concatenate([on[1:], [False]])) + 1
        n_hits = len(starts)
        integral = 0.0
        sp = np.maximum(signal, 0.0)
        for s, e in zip(starts, ends):
            seg_s = max(s - cfg.left_extension, 0)
            seg_e = min(e + cfg.right_extension, L)
            integral += sp[seg_s:seg_e].sum()

        # ---- dominant peak via minmax window height on the RAW wave ----
        if n_peaks:
            heights_k = []
            for k in range(n_peaks):
                ws = max(int(np.clip(round(props["left_ips"][k]), 0, L - 1))
                         - 4, 0)
                we = min(int(np.clip(round(props["right_ips"][k]), 0, L - 1))
                         + 4, L)
                heights_k.append(w[ws:we].max() - w[ws:we].min()
                                 if we > ws else 0.0)
            best = int(np.argmax(heights_k))
            p = int(pos[best])
        else:
            p = -1

        # ---- 10-90% widths at the dominant peak ----
        rise = fall = width = 0.0
        label = 0
        if n_peaks:
            bl_w = signal[:min(50, L)].mean()
            corr = signal - bl_w
            pv = corr[p]
            if pv > 0:
                def rising(thr):
                    m = np.flatnonzero((corr >= thr)
                                       & (np.arange(L) < p))
                    if not len(m):
                        return None
                    idx = m[0]
                    if idx > 0 and abs(corr[idx] - corr[idx - 1]) >= 1e-10:
                        return (idx - 1) + (thr - corr[idx - 1]) / (
                            corr[idx] - corr[idx - 1])
                    return float(idx)

                def falling(thr):
                    m = np.flatnonzero((corr <= thr)
                                       & (np.arange(L) >= p))
                    if not len(m):
                        return None
                    idx = m[0]
                    if idx > p and abs(corr[idx] - corr[idx - 1]) >= 1e-10:
                        return (idx - 1) + (thr - corr[idx - 1]) / (
                            corr[idx] - corr[idx - 1])
                    return float(idx)

                r_lo, r_hi = rising(cfg.rise_low * pv), rising(cfg.rise_high * pv)
                f_hi, f_lo = falling(cfg.rise_high * pv), falling(cfg.rise_low * pv)
                if r_lo is not None and r_hi is not None:
                    rise = r_hi - r_lo
                if f_hi is not None and f_lo is not None:
                    fall = f_lo - f_hi
                if r_lo is not None and f_lo is not None:
                    width = f_lo - r_lo
            if width > 0:
                if width <= cfg.s1_width_max:
                    label = 1
                elif width >= cfg.s2_width_min:
                    label = 2

        out["height"].append(height)
        out["amp"].append(amp)
        out["area"].append(area)
        out["max_abs_diff"].append(mad)
        out["peak_position"].append(p)
        out["n_peaks"].append(n_peaks)
        out["n_candidates"].append(n_candidates)
        out["n_hits"].append(n_hits)
        out["hit_integral"].append(integral)
        out["rise_samples"].append(rise)
        out["fall_samples"].append(fall)
        out["width_samples"].append(width)
        out["label"].append(label)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("polarity", ["positive", "negative"])
def test_full_chain_matches_reference_loop(polarity):
    rng = np.random.default_rng(21 if polarity == "positive" else 22)
    n, L = 96, 192
    t = np.arange(L)
    waves = np.full((n, L), 1000.0)
    sgn = 1.0 if polarity == "positive" else -1.0
    for i in range(n):
        kind = i % 4
        if kind == 0:
            continue  # noise-only
        c = rng.integers(60, L - 60)
        sigma = {1: 3.0, 2: 25.0, 3: 10.0}[kind]
        amp = {1: 400.0, 2: 250.0, 3: 300.0}[kind]
        waves[i] += sgn * amp * np.exp(-((t - c) ** 2) / (2 * sigma ** 2))
    waves += rng.normal(0, 1.0, waves.shape)
    waves = np.round(waves)

    el = np.full(n, L, np.int32)
    el[5] = 150  # masked tail
    bl = np.full(n, 1000.0, np.float64)
    pol = np.full(n, 1 if polarity == "positive" else 0, np.int8)

    cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                      peak_prominence=50.0, peak_width=2.0)

    dev = {k: np.asarray(v) for k, v in full_chain_step(
        jnp.asarray(waves.astype(np.int16)), jnp.asarray(el),
        jnp.asarray(bl.astype(np.float32)), jnp.asarray(pol), cfg).items()}
    ref = reference_chain_loop(waves, el, bl, pol, cfg)

    np.testing.assert_allclose(dev["height"], ref["height"], atol=1e-3)
    np.testing.assert_allclose(dev["amp"], ref["amp"], atol=1e-3)
    np.testing.assert_allclose(dev["area"], ref["area"], rtol=1e-6, atol=1e-2)
    np.testing.assert_allclose(dev["max_abs_diff"], ref["max_abs_diff"],
                               atol=1e-3)
    np.testing.assert_array_equal(dev["n_peaks"], ref["n_peaks"])
    np.testing.assert_array_equal(dev["peak_position"], ref["peak_position"])
    np.testing.assert_array_equal(dev["n_hits"], ref["n_hits"])
    np.testing.assert_allclose(dev["hit_integral"], ref["hit_integral"],
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(dev["rise_samples"], ref["rise_samples"],
                               atol=2e-3)
    np.testing.assert_allclose(dev["fall_samples"], ref["fall_samples"],
                               atol=2e-3)
    np.testing.assert_allclose(dev["width_samples"], ref["width_samples"],
                               atol=2e-3)
    np.testing.assert_array_equal(dev["label"], ref["label"])


# config-space sweep: the fused chain must track the reference loop across
# detector settings, not just the defaults (VERDICT r1: auto-config matrix
# shape). Each case varies one axis of ChainConfig.
SWEEP_CONFIGS = {
    "tight_height": dict(peak_height=150.0),
    "loose_height": dict(peak_height=30.0),
    "wide_distance": dict(peak_distance=10),
    "high_prominence": dict(peak_prominence=150.0),
    "wide_min_width": dict(peak_width=8.0),
    "low_threshold": dict(hit_threshold=3.0),
    "high_threshold": dict(hit_threshold=120.0),
    "no_extensions": dict(left_extension=0, right_extension=0),
    "big_extensions": dict(left_extension=8, right_extension=8),
    "capacity_16": dict(max_peaks=16, max_hits=16),
    "narrow_s1_band": dict(s1_width_max=10.0, s2_width_min=60.0),
    "quantile_widths": dict(rise_low=0.2, rise_high=0.8),
}


@pytest.mark.parametrize("case", sorted(SWEEP_CONFIGS))
def test_chain_config_sweep(case):
    # crc32, not hash(): str hashing is salted per process, and a varying
    # seed made this test flaky (rare draws hit candidate-overflow events
    # the old `within` filter did not exclude)
    rng = np.random.default_rng(zlib.crc32(case.encode()) % (2**31))
    n, L = 64, 160
    t = np.arange(L)
    waves = np.full((n, L), 1000.0)
    for i in range(n):
        if i % 5 == 0:
            continue
        c = rng.integers(50, L - 50)
        sigma = float(rng.uniform(2.0, 30.0))
        amp = float(rng.uniform(100.0, 450.0))
        waves[i] += amp * np.exp(-((t - c) ** 2) / (2 * sigma ** 2))
    waves += rng.normal(0, 1.0, waves.shape)
    waves = np.round(waves)

    el = np.full(n, L, np.int32)
    el[3] = 120
    bl = np.full(n, 1000.0, np.float64)
    pol = np.ones(n, np.int8)

    base = dict(use_derivative=False, peak_height=80.0,
                peak_prominence=50.0, peak_width=2.0)
    base.update(SWEEP_CONFIGS[case])
    cfg = ChainConfig(**base)
    # capacity cases intentionally overflow: the reference loop is unbounded,
    # so compare only on events within capacity
    dev = {k: np.asarray(v) for k, v in full_chain_step(
        jnp.asarray(waves.astype(np.int16)), jnp.asarray(el),
        jnp.asarray(bl.astype(np.float32)), jnp.asarray(pol), cfg).items()}
    ref = reference_chain_loop(waves, el, bl, pol, cfg)

    # capacity applies to CANDIDATES (height-passing local maxima), per the
    # chain overflow contract (models/full_chain.py n_peak_overflow): an
    # event with more candidates than slots is best-effort even when its
    # accepted-peak count fits, so it must be excluded from exact comparison
    within = (ref["n_candidates"] <= cfg.max_peaks) \
        & (ref["n_hits"] <= cfg.max_hits)
    assert within.sum() >= n // 2  # the sweep still exercises real events

    np.testing.assert_allclose(dev["height"], ref["height"], atol=1e-3)
    np.testing.assert_allclose(dev["area"], ref["area"], rtol=1e-6, atol=1e-2)
    np.testing.assert_array_equal(dev["n_peaks"][within],
                                  ref["n_peaks"][within])
    # dominant-peak selection maximizes a minmax-window height; two peaks
    # with near-equal heights can flip between the device's float32 and the
    # loop's float64 — allow <=2% of events to disagree there, exact
    # equality elsewhere (the default-config test above stays exact)
    pos_mismatch = dev["peak_position"][within] != ref["peak_position"][within]
    assert pos_mismatch.mean() <= 0.02, (
        f"{pos_mismatch.sum()} dominant-peak mismatches"
    )
    agree = within.copy()
    agree[within] &= ~pos_mismatch
    np.testing.assert_array_equal(dev["n_hits"][within], ref["n_hits"][within])
    np.testing.assert_allclose(dev["hit_integral"][within],
                               ref["hit_integral"][within],
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(dev["width_samples"][agree],
                               ref["width_samples"][agree], atol=2e-3)
    np.testing.assert_array_equal(dev["label"][agree], ref["label"][agree])
    # overflow counts events whose CANDIDATES exceed capacity — exactly
    assert int(dev["n_peak_overflow"]) == int(
        np.sum(ref["n_candidates"] > cfg.max_peaks)
    )
