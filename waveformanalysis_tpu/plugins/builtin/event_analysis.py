"""df_events / hit_grouped / df_paired plugins.

Behavioral analog of the reference event-analysis plugins
(reference: waveform_analysis/core/plugins/builtin/cpu/event_analysis.py:
23,69,109): time-window clustering of the df table into multi-channel
events, absolute-window coincidence grouping of merged hits, and cross
channel pairing.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.foundation.constants import FeatureDefaults
from waveformanalysis_tpu.ops import grouping as G
from waveformanalysis_tpu.plugins.base import Option, Plugin
from waveformanalysis_tpu.processing.analyzer import EventAnalyzer


class GroupedEventsPlugin(Plugin):
    """Cluster df rows into multi-channel events by time window."""

    provides = "df_events"
    depends_on = ["df"]
    description = "Group single-channel events into multi-channel events."
    version = "1.2.0"
    kernel_version = G.KERNEL_VERSION
    save_when = "always"
    output_dtype = "DataFrame"
    options = {
        "time_window_ns": Option(
            default=float(FeatureDefaults.TIME_WINDOW_NS), type=float,
            help="Clustering time window (ns)",
        ),
        "n_processes": Option(default=None, type=int, track=False,
                              help="Accepted for API parity (vectorized path)"),
        "grouping_backend": Option(
            default="auto", type=str, track=False,
            choices=("auto", "host", "device"),
            help="auto|host|device: device uses the jitted binary-lifting "
                 "clustering kernel (ops/grouping_device.py)",
        ),
    }

    def compute(self, context: Any, run_id: str, **kwargs: Any):
        df = context.get_data(run_id, "df")
        tw = float(context.get_config(self, "time_window_ns"))
        backend = context.get_config(self, "grouping_backend")
        analyzer = EventAnalyzer(
            n_channels=context.config.get("n_channels", 2),
            start_channel_slice=context.config.get("start_channel", 0),
        )
        return analyzer.group_events(df, time_window_ns=tw, backend=backend)


class HitGroupedPlugin(Plugin):
    """Absolute-window coincidence grouping of merged hits."""

    provides = "hit_grouped"
    depends_on = ["hit_merged", "hit_merged_components", "hit_threshold"]
    description = "Group merged hits into coincidence events by absolute windows."
    version = "0.3.0"
    kernel_version = G.KERNEL_VERSION
    save_when = "always"
    output_dtype = "DataFrame"
    options = {
        "time_window_ns": Option(
            default=float(FeatureDefaults.TIME_WINDOW_NS), type=float,
            help="Coincidence window (ns) between hit windows",
        ),
        "grouping_backend": Option(
            default="auto", type=str, track=False,
            choices=("auto", "host", "device"),
            help="auto|host|device: device uses the jitted chained-gap "
                 "cummax kernel (ops/grouping_device.py)",
        ),
    }

    def compute(self, context: Any, run_id: str, **kwargs: Any):
        merged = _as_columns(context.get_data(run_id, "hit_merged"))
        components = _as_columns(context.get_data(run_id, "hit_merged_components"))
        threshold_hits = _as_columns(context.get_data(run_id, "hit_threshold"))
        tw = float(context.get_config(self, "time_window_ns"))
        backend = context.get_config(self, "grouping_backend")
        return G.group_hit_windows(
            merged, tw,
            component_rows=components,
            component_hits=threshold_hits,
            backend=backend,
        )


class PairedEventsPlugin(Plugin):
    """Cross-channel pairing of grouped events."""

    provides = "df_paired"
    depends_on = ["df_events"]
    description = "Filter grouped events into cross-channel pairs."
    version = "1.1.0"
    kernel_version = G.KERNEL_VERSION
    save_when = "always"
    output_dtype = "DataFrame"
    options = {
        "time_window_ns": Option(
            default=float(FeatureDefaults.TIME_WINDOW_NS), type=float,
            help="Maximum event span (ns) for pairing",
        ),
        "grouping_backend": Option(
            default="auto", type=str, track=False,
            choices=("auto", "host", "device"),
            help="auto|host|device: device runs the per-event gathers "
                 "(delta_t, area_ch*/height_ch*) as one jitted kernel "
                 "(ops/grouping_device.pair_events_device)",
        ),
    }

    def compute(self, context: Any, run_id: str, **kwargs: Any):
        df_events = context.get_data(run_id, "df_events")
        tw = float(context.get_config(self, "time_window_ns"))
        backend = context.get_config(self, "grouping_backend")
        analyzer = EventAnalyzer(
            n_channels=context.config.get("n_channels", 2),
            start_channel_slice=context.config.get("start_channel", 0),
        )
        return analyzer.pair_events(df_events, time_window_ns=tw,
                                    backend=backend)


def _as_columns(data: Any) -> Dict[str, np.ndarray]:
    if isinstance(data, Table):
        return {k: np.asarray(v) for k, v in data.columns.items()}
    if isinstance(data, np.ndarray) and data.dtype.names:
        return {name: np.asarray(data[name]) for name in data.dtype.names}
    raise ValueError(f"Expected Table or structured array, got {type(data)}")
