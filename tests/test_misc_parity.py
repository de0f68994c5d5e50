"""Small parity items mirrored from the reference's standalone test files:
version single-sourcing (reference: tests/test_version_source.py) and the
dual-baseline contract (reference: tests/test_dual_baseline.py).
"""

import re
from pathlib import Path

import numpy as np

import waveformanalysis_tpu


def test_version_single_source():
    """__version__ must match pyproject.toml."""
    pyproject = Path(__file__).parent.parent / "pyproject.toml"
    m = re.search(r'^version\s*=\s*"([^"]+)"', pyproject.read_text(), re.M)
    assert m, "pyproject.toml has no version"
    assert waveformanalysis_tpu.__version__ == m.group(1)


class TestDualBaseline:
    """Computed baseline coexists with an upstream (DAQ-provided) one."""

    def test_builder_preserves_upstream_baseline(self):
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_st_waveforms,
        )
        from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

        st = make_fake_st_waveforms(n_events=16, wave_length=64,
                                    pulse_height=200, polarity="positive")
        st["baseline_upstream"] = np.linspace(990.0, 1005.0, 16)
        bundle = build_records_from_st_waveforms(st, default_dt_ns=2)
        up = np.asarray(bundle.records["baseline_upstream"])
        assert np.isfinite(up).all()
        # sort may permute rows; the value SET must be preserved exactly
        np.testing.assert_allclose(np.sort(up), np.sort(st["baseline_upstream"]))
        # computed baseline is independent of the upstream one
        assert not np.allclose(np.asarray(bundle.records["baseline"]), up)

    def test_missing_upstream_is_nan(self):
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_st_waveforms,
        )
        from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

        st = make_fake_st_waveforms(n_events=4, wave_length=32,
                                    pulse_height=100, polarity="positive")
        arr = st[[n for n in st.dtype.names if n != "baseline_upstream"]] \
            if "baseline_upstream" in (st.dtype.names or ()) else st
        bundle = build_records_from_st_waveforms(arr, default_dt_ns=2)
        up = np.asarray(bundle.records["baseline_upstream"])
        assert np.isnan(up).all()
