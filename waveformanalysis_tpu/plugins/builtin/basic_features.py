"""basic_features plugin: height / amp / area / max_abs_diff per event.

Behavioral analog of the reference BasicFeaturesPlugin
(reference: waveform_analysis/core/plugins/builtin/cpu/basic_features.py:43),
with identical options (height_range, area_range, use_filtered, wave_source,
fixed_baseline [deprecated], channel_config) and numeric semantics — but the
per-event Python loop is replaced by one jitted device sweep over the padded
wave matrix (see waveformanalysis_tpu/ops/features.py), with per-channel
fixed_baseline overrides resolved vectorized instead of per record.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from waveformanalysis_tpu.dtypes.schema import BASIC_FEATURES_SCHEMA
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.foundation.constants import FeatureDefaults
from waveformanalysis_tpu.hardware import resolve_channel_value_arrays
from waveformanalysis_tpu.ops import features as F
from waveformanalysis_tpu.plugins.base import Option, Plugin
from waveformanalysis_tpu.plugins.builtin._wave_source import (
    WAVE_SOURCE_AUTO,
    load_wave_input,
    resolve_wave_input_spec,
)

BASIC_FEATURES_DTYPE = BASIC_FEATURES_SCHEMA.numpy_dtype()


class BasicFeaturesPlugin(Plugin):
    """Compute basic height/amp/area/max_abs_diff features from waveforms."""

    provides = "basic_features"
    depends_on = []  # dynamic via resolve_depends_on
    description = (
        "Compute basic height, amplitude, area, and max-abs-diff features "
        "from waveform data."
    )
    version = "4.0.0"  # field set matches the reference 4.0.0 output
    kernel_version = F.KERNEL_VERSION
    save_when = "always"
    output_dtype = BASIC_FEATURES_DTYPE
    options = {
        "height_range": Option(
            default=FeatureDefaults.PEAK_RANGE, type=tuple,
            help="Sample window (start, end) for height/amp",
        ),
        "area_range": Option(
            default=(0, None), type=tuple,
            help="Sample window (start, end) for area; end=None -> wave end",
        ),
        "use_filtered": Option(
            default=False, type=bool,
            help="Use filtered_waveforms (requires FilteredWaveformsPlugin)",
        ),
        "wave_source": Option(
            default=WAVE_SOURCE_AUTO, type=str,
            help="Wave source: auto|records|st_waveforms|filtered_waveforms",
        ),
        "fixed_baseline": Option(
            default=None, type=dict,
            help="Deprecated; use channel_config for per-channel fixed baselines.",
        ),
        "channel_config": Option(
            default=None, type=dict,
            help="Per-(board,channel) overrides; may override fixed_baseline.",
        ),
    }

    def resolve_depends_on(self, context: Any, run_id: str | None = None):
        return list(resolve_wave_input_spec(context, self).depends_on)

    def compute(self, context: Any, run_id: str, **kwargs: Any) -> Table:
        channel_config = context.get_config(self, "channel_config")
        height_range = tuple(context.get_config(self, "height_range"))
        area_range = tuple(context.get_config(self, "area_range"))

        wave_input = load_wave_input(context, self, run_id, needs_wave_samples=True)

        if wave_input.spec.is_records:
            return self._compute_from_records(
                context, run_id, wave_input, height_range, area_range, channel_config
            )

        data = wave_input.waveform_data
        if data is None:
            raise ValueError(
                f"basic_features failed to load {wave_input.spec.expected_name}"
            )
        n = len(data)
        if n == 0:
            return Table.zeros(0, BASIC_FEATURES_SCHEMA)

        waves = np.asarray(data["wave"])
        baselines = np.asarray(data["baseline"], dtype=np.float64).copy()
        boards = (
            np.asarray(data["board"]) if "board" in data
            else np.zeros(n, dtype=np.int16)
        )
        channels = (
            np.asarray(data["channel"]) if "channel" in data
            else np.zeros(n, dtype=np.int16)
        )
        if "polarity" in data:
            pol = np.asarray(data["polarity"]).astype(np.int8)
        else:
            pol = np.full(n, -1, dtype=np.int8)
        # unknown polarity falls back to negative (reference behavior)
        pol = np.where(pol == 0, np.int8(-1), pol)

        overrides = resolve_channel_value_arrays(
            context, self, run_id, boards, channels,
            option_names=("fixed_baseline",),
            defaults={"fixed_baseline": None},
            channel_config=channel_config,
        )
        fixed = overrides["fixed_baseline"]
        has_fixed = ~np.isnan(fixed)
        baselines[has_fixed] = fixed[has_fixed]

        event_length = (
            np.asarray(data["event_length"], dtype=np.int32)
            if "event_length" in data
            else np.full(n, waves.shape[1], dtype=np.int32)
        )

        feats = F.basic_features_from_waves(
            waves, event_length, baselines, pol,
            height_range=height_range, area_range=area_range,
        )

        timestamps = (
            np.asarray(data["timestamp"], dtype=np.int64)
            if "timestamp" in data else np.zeros(n, dtype=np.int64)
        )
        return Table(
            {
                "height": feats["height"],
                "amp": feats["amp"],
                "area": feats["area"],
                "max_abs_diff": feats["max_abs_diff"],
                "timestamp": timestamps,
                "board": boards.astype(np.int16),
                "channel": channels.astype(np.int16),
                "event_index": np.arange(n, dtype=np.int64),
            },
            schema=BASIC_FEATURES_SCHEMA,
        )

    def _compute_from_records(
        self, context, run_id, wave_input, height_range, area_range, channel_config
    ) -> Table:
        records = wave_input.records
        rv = wave_input.records_view
        if records is None or rv is None:
            raise ValueError(
                "basic_features failed to load records_view for records source"
            )
        n = len(records)
        if n == 0:
            return Table.zeros(0, BASIC_FEATURES_SCHEMA)

        boards = np.asarray(records["board"]) if "board" in records else np.zeros(n, np.int16)
        channels = np.asarray(records["channel"]) if "channel" in records else np.zeros(n, np.int16)
        baselines = np.asarray(records["baseline"], dtype=np.float64).copy()
        pol = (
            np.asarray(records["polarity"]).astype(np.int8)
            if "polarity" in records else np.full(n, -1, np.int8)
        )
        pol = np.where(pol == 0, np.int8(-1), pol)

        overrides = resolve_channel_value_arrays(
            context, self, run_id, boards, channels,
            option_names=("fixed_baseline",),
            defaults={"fixed_baseline": None},
            channel_config=channel_config,
        )
        fixed = overrides["fixed_baseline"]
        has_fixed = ~np.isnan(fixed)
        baselines[has_fixed] = fixed[has_fixed]

        waves, event_length = rv.padded_wave_matrix()
        feats = F.basic_features_from_waves(
            waves, event_length, baselines, pol,
            height_range=height_range, area_range=area_range,
        )
        timestamps = np.asarray(records["timestamp"], dtype=np.int64)
        return Table(
            {
                "height": feats["height"],
                "amp": feats["amp"],
                "area": feats["area"],
                "max_abs_diff": feats["max_abs_diff"],
                "timestamp": timestamps,
                "board": boards.astype(np.int16),
                "channel": channels.astype(np.int16),
                "event_index": np.arange(n, dtype=np.int64),
            },
            schema=BASIC_FEATURES_SCHEMA,
        )
