"""Fused Pallas chain kernel: equality vs the XLA full chain.

Runs in interpret mode on the CPU backend — the kernel logic (shift-doubling
scans, one-hot extracts, K-slot loops) is identical to what Mosaic compiles
on real TPU, where equality was verified on-device at n=65536.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveformanalysis_tpu.models.full_chain import ChainConfig, full_chain_step
from waveformanalysis_tpu.ops.chain_pallas import chain_pallas

RNG = np.random.default_rng(11)


def _compare(cfg, waves, el, bl, pol, tile=32):
    batch = (jnp.asarray(waves), jnp.asarray(el), jnp.asarray(bl),
             jnp.asarray(pol))
    ref = full_chain_step(*batch, cfg)
    out = chain_pallas(*batch, cfg, tile_rows=tile, interpret=True)
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


class TestChainPallasEquality:
    def setup_method(self):
        self.n, self.L = 50, 192  # n not a tile multiple -> exercises padding
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

    def test_s1_s2_classification(self):
        from waveformanalysis_tpu.models.full_chain import example_chain_batch

        cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                          peak_prominence=50.0, peak_width=2.0)
        batch = example_chain_batch(32, 128)
        out = chain_pallas(*batch, cfg, tile_rows=32, interpret=True)
        labels = np.asarray(out["label"])
        assert (labels[0::2] == 1).all()  # narrow sigma=3 -> S1
        assert (labels[1::2] == 2).all()  # wide sigma=25 -> S2


@pytest.mark.multidevice
def test_sharded_pallas_chain_matches_xla():
    import jax
    from waveformanalysis_tpu.models.full_chain import (
        example_chain_batch, make_sharded_chain,
    )
    from waveformanalysis_tpu.ops.chain_pallas import make_sharded_chain_pallas
    from waveformanalysis_tpu.parallel.mesh import data_sharding, make_mesh

    mesh = make_mesh(n_devices=8, axis_names=("data",))
    cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                      peak_prominence=50.0, peak_width=2.0)
    batch = example_chain_batch(128, 128)
    sharding = data_sharding(mesh)
    batch = tuple(jax.device_put(x, sharding) for x in batch)
    ref = make_sharded_chain(mesh, cfg)(*batch)
    out = make_sharded_chain_pallas(mesh, cfg, interpret=True, tile_rows=16)(*batch)
    np.testing.assert_array_equal(np.asarray(ref["label"]), np.asarray(out["label"]))
    assert int(out["n_s1"]) == 64 and int(out["n_s2"]) == 64
