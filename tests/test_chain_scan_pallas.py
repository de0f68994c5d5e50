"""Streaming-scan chain kernel: equality vs the XLA full chain.

Interpret mode on the CPU backend; the Mosaic-compiled kernel was verified
identical to the tile kernel on real TPU at n=65536 (5.85M waveforms/s,
5.1x the tile kernel).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveformanalysis_tpu.models.full_chain import ChainConfig, full_chain_step
from waveformanalysis_tpu.ops.chain_scan_pallas import chain_scan_pallas

RNG = np.random.default_rng(11)


def _compare(cfg, waves, el, bl, pol):
    batch = (jnp.asarray(waves), jnp.asarray(el), jnp.asarray(bl),
             jnp.asarray(pol))
    ref = full_chain_step(*batch, cfg)
    out = chain_scan_pallas(*batch, cfg, interpret=True)
    assert set(out) == set(ref)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            np.testing.assert_allclose(b, a, atol=1e-3, rtol=1e-4, err_msg=k)


def _mixed_waves(n, L, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(L)
    waves = np.full((n, L), 1000.0)
    for i in range(n):
        c = rng.integers(50, L - 50)
        amp = rng.choice([300, -280]) if i % 5 else 0
        waves[i] += amp * np.exp(-((t - c) ** 2) / (2 * rng.uniform(2, 20) ** 2))
    waves += rng.normal(0, 3, waves.shape)
    return np.round(waves).astype(np.int16)


class TestChainScanEquality:
    def setup_method(self):
        self.n, self.L = 50, 192
        self.waves = _mixed_waves(self.n, self.L)
        self.el = RNG.integers(self.L // 2, self.L + 1, self.n).astype(np.int32)
        self.bl = np.full(self.n, 1000.0, np.float32)
        self.pos = np.ones(self.n, np.int8)

    def test_positive_polarity_varlen(self):
        cfg = ChainConfig(use_derivative=False, peak_height=60.0,
                          peak_prominence=30.0, peak_width=1.5)
        _compare(cfg, self.waves, self.el, self.bl, self.pos)

    def test_negative_polarity(self):
        cfg = ChainConfig(use_derivative=False, peak_height=60.0,
                          peak_prominence=30.0, peak_width=1.5)
        _compare(cfg, self.waves, self.el, self.bl, -self.pos)

    def test_derivative_mode(self):
        cfg = ChainConfig(use_derivative=True, peak_height=20.0,
                          peak_prominence=5.0, peak_width=1.0, peak_distance=3)
        _compare(cfg, self.waves, self.el, self.bl, self.pos)

    def test_dense_noise_high_capacity(self):
        cfg = ChainConfig(use_derivative=False, peak_height=10.0,
                          peak_prominence=2.0, peak_width=0.5, peak_distance=1,
                          max_peaks=16, max_hits=16, hit_threshold=5.0)
        noisy = (1000 + RNG.normal(0, 40, (self.n, self.L))).round().astype(np.int16)
        _compare(cfg, noisy, self.el, self.bl, self.pos)

    def test_mixed_polarity(self):
        cfg = ChainConfig(use_derivative=False, peak_height=60.0,
                          peak_prominence=30.0, peak_width=1.5)
        pol = RNG.choice(np.array([-1, 1], np.int8), self.n)
        _compare(cfg, self.waves, self.el, self.bl, pol)

    def test_boundary_plateaus(self):
        w2 = np.full((3, 64), 1000, np.int16)
        w2[0, 10:40] = 1100   # plateau to the el=40 boundary -> no peak
        w2[1, 10:39] = 1100   # falls inside -> midpoint peak
        w2[2, 30] = 1400
        cfg = ChainConfig(use_derivative=False, peak_height=50.0,
                          peak_prominence=0.0, peak_width=0.0)
        _compare(cfg, w2, np.array([40, 40, 64], np.int32),
                 np.full(3, 1000.0, np.float32), np.ones(3, np.int8))

    def test_s1_s2_classification(self):
        from waveformanalysis_tpu.models.full_chain import example_chain_batch

        cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                          peak_prominence=50.0, peak_width=2.0)
        batch = example_chain_batch(32, 128)
        out = chain_scan_pallas(*batch, cfg, interpret=True)
        labels = np.asarray(out["label"])
        assert (labels[0::2] == 1).all()
        assert (labels[1::2] == 2).all()


class TestFindPeaksScan:
    """find_peaks_scan vs the XLA find_peaks_batch (same contract)."""

    def _compare(self, sig, vlen, **kw):
        from waveformanalysis_tpu.ops.chain_scan_pallas import find_peaks_scan
        from waveformanalysis_tpu.ops.peaks import find_peaks_batch

        vl = None if vlen is None else jnp.asarray(vlen)
        a = find_peaks_batch(jnp.asarray(sig), kw["height"], kw["prominence"],
                             kw["width"], distance=kw["distance"],
                             max_peaks=kw["max_peaks"], valid_length=vl)
        b = find_peaks_scan(jnp.asarray(sig), kw["height"], kw["prominence"],
                            kw["width"], distance=kw["distance"],
                            max_peaks=kw["max_peaks"], valid_length=vl,
                            interpret=True)
        v = np.asarray(a["valid"])
        np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["position"]), np.asarray(b["position"]))
        np.testing.assert_array_equal(np.asarray(a["n_candidates"]), np.asarray(b["n_candidates"]))
        for k in ("prominence", "left_ips", "right_ips", "widths"):
            np.testing.assert_allclose(np.asarray(b[k])[v], np.asarray(a[k])[v],
                                       atol=1e-3, rtol=1e-4, err_msg=k)
        for k in ("left_bases", "right_bases"):
            np.testing.assert_array_equal(np.asarray(b[k])[v], np.asarray(a[k])[v])

    def test_noise_pulse_varlen(self):
        rng = np.random.default_rng(7)
        n, L = 40, 128
        sig = rng.normal(0, 30, (n, L)).astype(np.float32)
        sig[:, 50:60] += 200
        vlen = rng.integers(L // 2, L + 1, n).astype(np.int32)
        self._compare(sig, vlen, height=30.0, prominence=10.0, width=1.0,
                      distance=3, max_peaks=8)

    def test_plateaus(self):
        rng = np.random.default_rng(9)
        sig = np.zeros((8, 96), np.float32)
        for i in range(8):
            j = rng.integers(10, 60)
            sig[i, j:j + rng.integers(2, 6)] = 100.0
        self._compare(sig, None, height=10.0, prominence=0.0, width=0.0,
                      distance=1, max_peaks=8)


class TestThresholdHitsScan:
    """threshold_hits_scan vs the XLA threshold_hits_batch."""

    def _compare(self, sig, thr, vlen, **kw):
        from waveformanalysis_tpu.ops.chain_scan_pallas import threshold_hits_scan
        from waveformanalysis_tpu.ops.hits import threshold_hits_batch

        a = threshold_hits_batch(jnp.asarray(sig), jnp.asarray(thr),
                                 jnp.asarray(vlen), **kw)
        b = threshold_hits_scan(jnp.asarray(sig), jnp.asarray(thr),
                                jnp.asarray(vlen), interpret=True, **kw)
        v = np.asarray(a["valid"])
        np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["n_runs"]), np.asarray(b["n_runs"]))
        for k in ("position", "seg_start", "seg_end", "run_start", "run_end"):
            np.testing.assert_array_equal(np.asarray(a[k])[v], np.asarray(b[k])[v],
                                          err_msg=k)
        for k in ("height", "integral"):
            np.testing.assert_allclose(np.asarray(b[k])[v], np.asarray(a[k])[v],
                                       atol=1e-4, err_msg=k)

    def test_pulses_varlen_per_event_thresholds(self):
        rng = np.random.default_rng(5)
        n, L = 40, 128
        sig = rng.normal(0, 15, (n, L)).astype(np.float32)
        sig[:, 30:45] += 80
        sig[:, 70:72] += 60
        vlen = rng.integers(L // 2, L + 1, n).astype(np.int32)
        thr = rng.uniform(20, 60, n).astype(np.float32)
        self._compare(sig, thr, vlen, left_extension=2, right_extension=2,
                      max_hits=8)

    def test_run_to_boundary_and_overflow(self):
        sig = np.zeros((4, 96), np.float32)
        for i in range(10):
            sig[:, 5 + 9 * i: 8 + 9 * i] = 100.0
        sig[:, 90:] = 100.0  # runs into the wave end
        self._compare(sig, np.full(4, 30.0, np.float32),
                      np.full(4, 96, np.int32),
                      left_extension=1, right_extension=1, max_hits=4)


def test_sharded_chain_scan_multidevice():
    """make_sharded_chain_scan over the 8-device CPU mesh (interpret mode):
    per-event outputs match the single-device kernel; psum stats match
    global reductions."""
    import jax

    from waveformanalysis_tpu.models.full_chain import CHAIN_STATS_KEYS
    from waveformanalysis_tpu.ops.chain_scan_pallas import (
        make_sharded_chain_scan,
    )
    from waveformanalysis_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    n_dev = len(jax.devices())
    cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                      peak_prominence=50.0, peak_width=2.0)
    n, L = n_dev * 16, 128
    waves, el, bl, pol = (np.asarray(a) for a in (
        _mixed_waves(n, L), np.full(n, L, np.int32),
        np.full(n, 1000.0, np.float32), np.full(n, 1, np.int8)))

    mesh = make_mesh(n_devices=n_dev, axis_names=("data",))
    step = make_sharded_chain_scan(mesh, cfg, interpret=True)
    out = {k: np.asarray(v) for k, v in
           step(jnp.asarray(waves), jnp.asarray(el), jnp.asarray(bl),
                jnp.asarray(pol)).items()}

    single = {k: np.asarray(v) for k, v in chain_scan_pallas(
        jnp.asarray(waves), jnp.asarray(el), jnp.asarray(bl),
        jnp.asarray(pol), cfg, interpret=True).items()}
    for k, v in single.items():
        np.testing.assert_allclose(out[k], v, atol=1e-3, err_msg=k)
    assert set(CHAIN_STATS_KEYS) <= set(out)
    assert out["n_s1"] == np.sum(single["label"] == 1)
    assert out["n_s2"] == np.sum(single["label"] == 2)
    np.testing.assert_allclose(out["total_area"], single["area"].sum(),
                               rtol=1e-5)


class TestKSpecialization:
    """Per-block occupancy-specialized pass variants (roofline probe,
    BENCHMARKS.md r3): a block whose pass-1 maxima fit K_SMALL slots runs
    slot loops compiled at K_SMALL. Outputs must be bit-identical to the
    unspecialized kernel on both low- and high-occupancy data."""

    def _run(self, monkeypatch, k_small, waves, el, bl, pol, cfg):
        monkeypatch.setenv("WFA_CHAIN_K_SMALL", str(k_small))
        return chain_scan_pallas(
            jnp.asarray(waves), jnp.asarray(el), jnp.asarray(bl),
            jnp.asarray(pol), cfg, interpret=True,
        )

    def test_specialized_matches_unspecialized(self, monkeypatch):
        n, L = 96, 128  # _mixed_waves needs L >= 101 (centers in [50, L-50))
        cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                          peak_prominence=50.0, peak_width=2.0)
        # one clean pulse per event -> low occupancy (K_SMALL branch)
        waves = _mixed_waves(n, L, seed=11)
        el = np.full(n, L, np.int32)
        bl = np.full(n, 1000.0, np.float32)
        pol = np.full(n, 1, np.int8)
        base = self._run(monkeypatch, 0, waves, el, bl, pol, cfg)
        spec = self._run(monkeypatch, 2, waves, el, bl, pol, cfg)
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(spec[k]), err_msg=k
            )

    def test_high_occupancy_takes_full_branch(self, monkeypatch):
        n, L = 64, 64
        cfg = ChainConfig(use_derivative=False, peak_height=10.0,
                          peak_prominence=1.0, peak_width=1.0,
                          hit_threshold=5.0, max_peaks=8, max_hits=8)
        # dense noise: many candidates/runs per event (> K_SMALL)
        rng = np.random.default_rng(5)
        waves = np.round(
            1000 + 60 * rng.standard_normal((n, L))
        ).astype(np.int16)
        el = np.full(n, L, np.int32)
        bl = np.full(n, 1000.0, np.float32)
        pol = np.full(n, 1, np.int8)
        base = self._run(monkeypatch, 0, waves, el, bl, pol, cfg)
        spec = self._run(monkeypatch, 2, waves, el, bl, pol, cfg)
        assert int(np.asarray(spec["n_peaks"]).sum()) > n  # busy data
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(spec[k]), err_msg=k
            )


class TestP1QuadReadSharing:
    """Pass-1 quad read-sharing (roofline probe, BENCHMARKS.md r3): the
    quad runner reads+converts 5 samples per 4 unrolled steps instead of
    ~4 dynamic re-reads per step. Applies only to the non-derivative
    detection grid with L % 4 == 0; outputs must be bit-identical."""

    def _run(self, monkeypatch, quad, waves, el, bl, pol, cfg):
        monkeypatch.setenv("WFA_CHAIN_P1_QUAD", "1" if quad else "0")
        return chain_scan_pallas(
            jnp.asarray(waves), jnp.asarray(el), jnp.asarray(bl),
            jnp.asarray(pol), cfg, interpret=True,
        )

    def test_quad_matches_plain_sparse(self, monkeypatch):
        n, L = 96, 128
        cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                          peak_prominence=50.0, peak_width=2.0)
        waves = _mixed_waves(n, L, seed=13)
        el = np.full(n, L, np.int32)
        el[::7] = L - 21  # ragged lengths exercise the validity masks
        bl = np.full(n, 1000.0, np.float32)
        pol = np.full(n, 1, np.int8)
        base = self._run(monkeypatch, False, waves, el, bl, pol, cfg)
        quad = self._run(monkeypatch, True, waves, el, bl, pol, cfg)
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(quad[k]), err_msg=k
            )

    def test_quad_matches_plain_dense(self, monkeypatch):
        n, L = 64, 64
        cfg = ChainConfig(use_derivative=False, peak_height=10.0,
                          peak_prominence=1.0, peak_width=1.0,
                          hit_threshold=5.0, max_peaks=8, max_hits=8)
        rng = np.random.default_rng(7)
        waves = np.round(
            1000 + 60 * rng.standard_normal((n, L))
        ).astype(np.int16)
        el = np.full(n, L, np.int32)
        bl = np.full(n, 1000.0, np.float32)
        pol = np.full(n, 1, np.int8)
        base = self._run(monkeypatch, False, waves, el, bl, pol, cfg)
        quad = self._run(monkeypatch, True, waves, el, bl, pol, cfg)
        assert int(np.asarray(quad["n_peaks"]).sum()) > n
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(quad[k]), err_msg=k
            )

    def test_quad_noop_on_derivative_grid(self, monkeypatch):
        # use_derivative=True falls back to the plain runner; still exact
        n, L = 32, 128
        cfg = ChainConfig(use_derivative=True)
        waves = _mixed_waves(n, L, seed=3)
        el = np.full(n, L, np.int32)
        bl = np.full(n, 1000.0, np.float32)
        pol = np.full(n, 1, np.int8)
        base = self._run(monkeypatch, False, waves, el, bl, pol, cfg)
        quad = self._run(monkeypatch, True, waves, el, bl, pol, cfg)
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(quad[k]), err_msg=k
            )
