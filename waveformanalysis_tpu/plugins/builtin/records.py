"""records / wave_pool plugins with a shared in-memory bundle.

Behavioral analog of the reference records plugins
(reference: waveform_analysis/core/plugins/builtin/cpu/records.py:27-334):
``records`` and ``wave_pool`` are two views of one RecordsBundle built from
the raw files; the bundle is cached in Context memory keyed by lineage so
requesting both data names builds it only once. Per-channel polarity metadata
is applied to the bundle before exposure.
"""

from __future__ import annotations

import hashlib
import json
import logging
from typing import Any

import numpy as np

from waveformanalysis_tpu.dtypes.schema import RECORDS_SCHEMA
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Option, Plugin
from waveformanalysis_tpu.processing.records_builder import (
    RecordsBundle,
    apply_records_polarity,
    build_records_from_raw_files,
)

logger = logging.getLogger(__name__)

_BUNDLE_PREFIX = "_records_bundle-"


def _bundle_options() -> dict:
    return {
        "daq_adapter": Option(default="vx2730", type=str, help="DAQ adapter name"),
        "dt": Option(default=None, type=int, help="Sample interval (ns)"),
        "baseline_samples": Option(
            default=None,
            help="Baseline window: int (first N samples) or (start, end)",
        ),
        "part_size": Option(
            default=250_000, type=int, track=False,
            help="Events per build part (perf knob, untracked)",
        ),
        "channel_workers": Option(
            default=None, type=int, track=False,
            help="Channel-level parse workers (default serial; pyarrow is "
                 "internally parallel and not thread-entry safe here)",
        ),
    }


def get_records_bundle(context: Any, run_id: str, plugin: Plugin) -> RecordsBundle:
    """Build (or fetch the memoized) RecordsBundle for a run.

    The memo key folds in the records lineage so config changes rebuild.
    """
    lineage = context.get_lineage("records") or context.get_lineage("wave_pool")
    h = hashlib.sha1(
        json.dumps(lineage, sort_keys=True, default=str).encode()
    ).hexdigest()[:8]
    memo_key = (run_id, f"{_BUNDLE_PREFIX}{h}")
    cached = context._results.get(memo_key)
    if cached is not None:
        return cached

    raw_files = context.get_data(run_id, "raw_files")
    adapter_name = (context.get_config(plugin, "daq_adapter") or "vx2730").lower()
    dt_ns = context.get_config(plugin, "dt")
    if dt_ns is None:
        from waveformanalysis_tpu.formats.adapter import get_adapter

        rate = get_adapter(adapter_name).format_spec.sampling_rate_hz or 500e6
        dt_ns = max(1, int(round(1e9 / rate)))
    baseline_samples = context.get_config(plugin, "baseline_samples")
    part_size = context.get_config(plugin, "part_size")
    channel_workers = context.get_config(plugin, "channel_workers")

    epoch_ns = None
    if raw_files and raw_files[0]:
        from pathlib import Path

        from waveformanalysis_tpu.formats.adapter import get_adapter

        try:
            epoch_ns = get_adapter(adapter_name).get_file_epoch(Path(raw_files[0][0]))
        except (FileNotFoundError, OSError):
            epoch_ns = None

    bundle = build_records_from_raw_files(
        raw_files,
        adapter_name=adapter_name,
        default_dt_ns=int(dt_ns),
        part_size=part_size,
        baseline_samples=baseline_samples,
        epoch_ns=epoch_ns,
        channel_workers=channel_workers,
    )
    bundle = apply_records_polarity(bundle, context, run_id)
    context._results[memo_key] = bundle
    return bundle


class RecordsPlugin(Plugin):
    """Time-sorted flat records (metadata view of the bundle)."""

    provides = "records"
    # outputs depend on run_config channel_metadata (hardware overrides)
    uses_run_config = True
    depends_on = ["raw_files"]
    description = "Globally time-sorted records with wave_pool addressing."
    version = "2.0.1"
    save_when = "always"
    output_dtype = RECORDS_SCHEMA
    options = _bundle_options()

    def compute(self, context: Any, run_id: str, **kwargs: Any) -> Table:
        return get_records_bundle(context, run_id, self).records


class WavePoolPlugin(Plugin):
    """Contiguous uint16 sample pool addressed by records.wave_offset."""

    provides = "wave_pool"
    # outputs depend on run_config channel_metadata (hardware overrides)
    uses_run_config = True
    depends_on = ["raw_files"]
    description = "Contiguous uint16 waveform sample pool."
    version = "2.0.1"
    save_when = "always"
    options = _bundle_options()

    def compute(self, context: Any, run_id: str, **kwargs: Any) -> np.ndarray:
        return get_records_bundle(context, run_id, self).wave_pool


class WavePoolFilteredPlugin(Plugin):
    """Filtered wave_pool: per-channel filters applied to pool slices
    (reference: records.py:334 + filtering.py:339-408)."""

    provides = "wave_pool_filtered"
    depends_on = ["records", "wave_pool"]
    description = "Wave pool with per-channel digital filters applied."
    version = "1.0.0"
    save_when = "always"
    options = {
        "filter_type": Option(
            default="butterworth", type=str,
            choices=["butterworth", "savgol", "none"],
            help="Filter family applied to pool waveforms",
        ),
        "filter_config": Option(
            default=None, type=dict,
            help="Filter parameters (and per-channel overrides)",
        ),
        "channel_config": Option(
            default=None, type=dict,
            help="Per-(board,channel) filter overrides",
        ),
    }

    def compute(self, context: Any, run_id: str, **kwargs: Any) -> np.ndarray:
        from waveformanalysis_tpu.data.records_view import RecordsView
        from waveformanalysis_tpu.ops.filtering import filter_pool

        records = context.get_data(run_id, "records")
        pool = context.get_data(run_id, "wave_pool")
        if len(records) == 0:
            return np.asarray(pool)
        filter_type = context.get_config(self, "filter_type")
        filter_config = context.get_config(self, "filter_config") or {}
        if filter_type == "none":
            return np.asarray(pool)
        view = RecordsView(records, np.asarray(pool))
        return filter_pool(
            view,
            filter_type=filter_type,
            filter_config=filter_config,
            sampling_rate_hz=self._sampling_rate(context),
        )

    def _sampling_rate(self, context: Any) -> float:
        dt_candidates = ("sampling_rate_hz",)
        rate = context.config.get("sampling_rate_hz")
        if rate:
            return float(rate)
        adapter_name = context.config.get("daq_adapter")
        if adapter_name:
            from waveformanalysis_tpu.config.adapter_info import get_adapter_info

            info = get_adapter_info(adapter_name)
            if info:
                return float(info.sampling_rate_hz)
        return 500e6
