"""Bit-parity of the streaming-scan slot-width kernel vs the XLA kernel.

The scan kernel (ops/width_scan_pallas.py) only moves the first-crossing
SEARCH into a Pallas walk; the interpolation arithmetic is shared with the
XLA kernel expression for expression — so on every consumed output
(slots the hit mask emits; the width_valid mask everywhere) the two
backends must agree bit for bit. Runs in interpret mode on the CPU
backend (reference: waveform_analysis/core/plugins/builtin/cpu/
waveform_width.py:153-380 defines the crossing semantics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveformanalysis_tpu.ops.peaks import find_peaks_batch
from waveformanalysis_tpu.ops.widths import (
    width_from_peak_slots,
    width_from_peak_slots_scan,
)


def _synth(n, L, seed, occupancy=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(L)
    centers = rng.integers(8, L - 8, n)
    amps = np.where(rng.random(n) < occupancy,
                    rng.uniform(80, 400, n), 0.0)
    waves = 1000.0 + amps[:, None] * np.exp(
        -((t[None, :] - centers[:, None]) ** 2) / (2 * 9.0)
    )
    waves += rng.normal(0, 2, waves.shape)
    return np.round(waves).astype(np.int16)


def _slots_from_peaks(waves, K):
    """Realistic slot tables: find_peaks over the corrected signal."""
    w32 = jnp.asarray(waves, jnp.float32)
    det = w32 - 1000.0
    n, L = waves.shape
    peaks = find_peaks_batch(
        det, height=40.0, prominence=20.0, width=1.0, distance=2,
        max_peaks=K, valid_length=jnp.full((n,), L, jnp.int32),
    )
    pos = np.asarray(peaks["position"], np.int32)
    valid = np.asarray(peaks["valid"], bool)
    pos = np.where(valid, pos, -1)
    return jnp.asarray(pos), jnp.asarray(valid)


def _assert_backend_parity(waves, positions, slot_valid, **kw):
    xla = {k: np.asarray(v) for k, v in width_from_peak_slots(
        jnp.asarray(waves, jnp.float32), positions, slot_valid, **kw
    ).items()}
    scan = {k: np.asarray(v) for k, v in width_from_peak_slots_scan(
        jnp.asarray(waves), positions, slot_valid, interpret=True, **kw
    ).items()}

    # the validity mask agrees on EVERY slot (it is what every consumer
    # filters on), the passthroughs agree everywhere
    np.testing.assert_array_equal(scan["width_valid"], xla["width_valid"])
    np.testing.assert_array_equal(scan["valid"], xla["valid"])
    np.testing.assert_array_equal(scan["position"], xla["position"])

    # every field agrees bit for bit on occupied slots (position >= 0 —
    # exactly the rows device compaction emits via the hit mask)
    occ = np.asarray(positions) >= 0
    for f in ("rise_samples", "fall_samples", "total_samples",
              "peak_height"):
        a, b = scan[f][occ], xla[f][occ]
        np.testing.assert_array_equal(a, b, err_msg=f)
    return xla, scan


@pytest.mark.parametrize("interpolation", [True, False])
def test_parity_realistic_peaks(interpolation):
    waves = _synth(1200, 64, seed=1)
    pos, valid = _slots_from_peaks(waves, K=8)
    xla, _ = _assert_backend_parity(
        waves, pos, valid, interpolation=interpolation
    )
    # the case is non-trivial: some slots valid, some widths found
    assert (xla["width_valid"] == 1).any()
    assert (np.asarray(xla["total_samples"]) > 0).any()


def test_parity_sparse_blocks_and_padding():
    # n not a multiple of the 1024-event block exercises the pad path;
    # 20% occupancy leaves whole blocks empty for the occupancy gate
    waves = _synth(1500, 64, seed=2, occupancy=0.2)
    pos, valid = _slots_from_peaks(waves, K=4)
    _assert_backend_parity(waves, pos, valid)


def test_parity_adversarial_positions():
    # hand-built positions: peak at 0, at L-1, duplicate slots, flat wave
    # (denominator ~0 at crossings), negative-corrected peak (width_valid
    # must be 0), unoccupied -1 slots
    L = 32
    rng = np.random.default_rng(3)
    waves = np.round(
        1000.0 + rng.normal(0, 3, (1024, L))
    ).astype(np.int16)
    waves[0] = 1000          # perfectly flat
    waves[1, 16] = 1400      # spike
    waves[2, :] = 900        # below-baseline

    pos = np.full((1024, 4), -1, np.int32)
    pos[0] = [0, 16, 31, -1]
    pos[1] = [16, 16, 0, 31]
    pos[2] = [5, -1, -1, -1]
    pos[3:, 0] = rng.integers(0, L, 1021)
    valid = jnp.asarray(pos >= 0)
    _assert_backend_parity(waves, jnp.asarray(pos), valid)


def test_no_peaks_anywhere():
    # all slots unoccupied: the occupancy gate skips both walks and the
    # init values must still produce the XLA not-found outputs
    waves = _synth(1024, 64, seed=4, occupancy=0.0)
    pos = jnp.full((1024, 4), -1, jnp.int32)
    valid = jnp.zeros((1024, 4), bool)
    _, scan = _assert_backend_parity(waves, pos, valid)
    assert not scan["width_valid"].any()


def test_plugin_backend_dispatch_config():
    # auto resolves to xla off-TPU; the key is part of the fused program
    # cache key so flipping it cannot alias compiled programs
    from waveformanalysis_tpu.context.fusion import _DEVICE_CFG_KEYS
    from waveformanalysis_tpu.plugins.builtin.waveform_width import (
        WaveformWidthPlugin,
    )

    assert "backend" in WaveformWidthPlugin.DEVICE_CFG_KEYS
    assert "backend" in _DEVICE_CFG_KEYS["waveform_width"]

    class _Ctx:
        def get_config(self, plugin, name):
            return plugin.options[name].default

    cfg = WaveformWidthPlugin().kernel_config(_Ctx())
    assert cfg["backend"] == "xla"  # CPU backend in tests
