"""Pallas sosfiltfilt kernel: scipy parity in interpret mode.

The same kernel compiled by Mosaic was verified on real TPU at n=65536
(5.99 ms, ~8e-7 relative error vs scipy float64); these tests pin the
interpret-mode path, which shares all logic.
"""

import numpy as np
from scipy.signal import sosfiltfilt

from waveformanalysis_tpu.ops.filter_pallas import (
    bandpass_filter_pallas,
    sosfiltfilt_pallas,
)
from waveformanalysis_tpu.ops.filtering import (
    design_butterworth_sos,
    sosfiltfilt_device,
)


def _rel_err(a, b):
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


class TestSosfiltfiltPallas:
    def setup_method(self):
        rng = np.random.default_rng(5)
        L = 256
        t = np.arange(L)
        self.waves = (
            1000.0
            + rng.normal(0, 30, (48, L))
            + 200 * np.exp(-((t - 100) ** 2) / 50.0)
        ).astype(np.float32)
        self.sos = design_butterworth_sos(2, 0.1, 0.2, 0.5)

    def test_matches_scipy(self):
        ref = sosfiltfilt(self.sos, self.waves.astype(np.float64), axis=-1)
        out = sosfiltfilt_pallas(self.waves, self.sos, interpret=True)
        assert _rel_err(out, ref) < 5e-5

    def test_matches_xla_core(self):
        xla = sosfiltfilt_device(self.waves, self.sos)
        out = sosfiltfilt_pallas(self.waves, self.sos, interpret=True)
        assert _rel_err(out, xla) < 5e-5

    def test_higher_order(self):
        sos = design_butterworth_sos(4, 0.05, 0.22, 0.5)
        ref = sosfiltfilt(sos, self.waves.astype(np.float64), axis=-1)
        out = sosfiltfilt_pallas(self.waves, sos, interpret=True)
        assert _rel_err(out, ref) < 5e-4

    def test_dc_offset_conditioning(self):
        # large baseline offset must not degrade f32 accuracy (DC trick)
        shifted = self.waves + 15000.0
        ref = sosfiltfilt(self.sos, shifted.astype(np.float64), axis=-1)
        out = sosfiltfilt_pallas(shifted, self.sos, interpret=True)
        assert _rel_err(out, ref) < 5e-4

    def test_event_padding(self):
        # n far from the 1024-event block size
        ref = sosfiltfilt(self.sos, self.waves[:7].astype(np.float64), axis=-1)
        out = sosfiltfilt_pallas(self.waves[:7], self.sos, interpret=True)
        assert _rel_err(out, ref) < 5e-5

    def test_bandpass_convenience(self):
        out = bandpass_filter_pallas(self.waves, 0.1, 0.2, 0.5, order=2,
                                     interpret=True)
        assert out.shape == self.waves.shape
        assert np.abs(out.mean()) < np.abs(self.waves.mean())


def test_multigroup_ilp_path_matches_scipy():
    """Batches past one block take the interleaved-groups kernel (ILP
    against the IIR dependency chain); parity must hold there too."""
    rng = np.random.default_rng(5)
    L = 96
    waves = rng.normal(0, 20, (1500, L)).astype(np.float32) + 500.0
    sos = design_butterworth_sos(2, 0.1, 0.2, 0.5)
    ref = sosfiltfilt(sos, waves.astype(np.float64), axis=-1)
    out = sosfiltfilt_pallas(waves, sos, interpret=True)
    assert out.shape == waves.shape
    assert _rel_err(out, ref) < 5e-5
