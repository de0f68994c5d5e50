#!/usr/bin/env python
"""S1/S2 classification demo: mixed fast/slow pulses through the full chain.

(reference analog: examples/s1_s2_pipeline_demo.ipynb — BASELINE config #4)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.peak_finding import HitFinderPlugin
from waveformanalysis_tpu.plugins.builtin.s1_s2_classifier import S1S2ClassifierPlugin
from waveformanalysis_tpu.plugins.builtin.waveform_width import WaveformWidthPlugin
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


def make_mixed_pulses(n_events: int = 400, wave_length: int = 512, seed: int = 7):
    """Alternating narrow (S1-like, sigma=3) and wide (S2-like, sigma=25)
    positive Gaussians."""
    rng = np.random.default_rng(seed)
    st = make_fake_st_waveforms(n_events=n_events, wave_length=wave_length,
                                pulse_height=0, polarity="positive")
    t = np.arange(wave_length)
    waves = np.full((n_events, wave_length), 1000.0)
    truth = np.empty(n_events, dtype=np.int8)
    for i in range(n_events):
        center = rng.integers(100, 400)
        if i % 2 == 0:
            waves[i] += 400 * np.exp(-((t - center) ** 2) / (2 * 3.0**2))
            truth[i] = 1  # S1
        else:
            waves[i] += 250 * np.exp(-((t - center) ** 2) / (2 * 25.0**2))
            truth[i] = 2  # S2
    waves += rng.normal(0, 2, waves.shape)
    st["wave"] = np.round(waves).astype(np.int16)
    st["baseline"] = 1000.0
    return st, truth


def main() -> None:
    st, truth = make_mixed_pulses()

    ctx = Context(config={"show_progress": True})
    ctx.register(HitFinderPlugin(), WaveformWidthPlugin(),
                 BasicFeaturesPlugin(), S1S2ClassifierPlugin())
    ctx.set_config({
        "hit": {"use_derivative": False, "height": 80.0,
                "prominence": 50.0, "width": 2},
        "basic_features": {"height_range": (0, None)},
        "s1_s2": {
            "width_unit": "samples",
            "s1_width_range": (0, 30),
            "s2_width_range": (40, 400),
        },
    })
    ctx.inject_data("demo", "st_waveforms", st)

    result = ctx.get_data("demo", "s1_s2")
    labels = np.asarray(result["label"])
    rid = np.asarray(result["record_id"])
    accuracy = float(np.mean(labels == truth[rid]))

    n_s1 = int(np.sum(labels == 1))
    n_s2 = int(np.sum(labels == 2))
    print(f"classified peaks: {len(result)}")
    print(f"S1: {n_s1}   S2: {n_s2}   unknown: {len(result) - n_s1 - n_s2}")
    print(f"accuracy vs truth: {accuracy:.3f}")


if __name__ == "__main__":
    main()
