"""DAQ run inspection: per-channel file stats and acquisition windows.

Behavioral analog of the reference DAQ utilities
(reference: waveform_analysis/utils/daq/daq_run.py:49 and
daq_analyzer.py:43): scan a run directory, summarize per-channel file
counts/sizes, estimate acquisition windows from first/last timetags, render
overview tables, and export JSON.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class ChannelStats:
    channel: int
    n_files: int = 0
    total_bytes: int = 0
    first_timetag_ps: Optional[int] = None
    last_timetag_ps: Optional[int] = None
    n_events_sampled: int = 0

    @property
    def acquisition_window_s(self) -> Optional[float]:
        if self.first_timetag_ps is None or self.last_timetag_ps is None:
            return None
        return (self.last_timetag_ps - self.first_timetag_ps) / 1e12

    def to_dict(self) -> Dict[str, Any]:
        return {
            "channel": self.channel,
            "n_files": self.n_files,
            "total_bytes": self.total_bytes,
            "first_timetag_ps": self.first_timetag_ps,
            "last_timetag_ps": self.last_timetag_ps,
            "acquisition_window_s": self.acquisition_window_s,
            "n_events_sampled": self.n_events_sampled,
        }


class DAQRun:
    """A scanned DAQ run directory with per-channel stats."""

    def __init__(
        self,
        data_root: str,
        run_name: str,
        adapter: Any = None,
        adapter_name: str = "vx2730",
    ) -> None:
        if adapter is None:
            from waveformanalysis_tpu.formats.adapter import get_adapter

            adapter = get_adapter(adapter_name)
        self.adapter = adapter
        self.data_root = str(data_root)
        self.run_name = run_name
        self._groups: Optional[Dict[int, List[Dict[str, Any]]]] = None
        self._stats: Optional[Dict[int, ChannelStats]] = None

    # -- scanning -------------------------------------------------------------

    def scan(self, force: bool = False) -> Dict[int, List[Dict[str, Any]]]:
        if self._groups is None or force:
            try:
                self._groups = self.adapter.scan_run_detailed(
                    self.data_root, self.run_name
                )
            except FileNotFoundError:
                self._groups = {}
        return self._groups

    @property
    def channels(self) -> List[int]:
        return sorted(self.scan())

    def get_channel_files(self) -> Dict[int, List[str]]:
        return {ch: [str(f["path"]) for f in files]
                for ch, files in self.scan().items()}

    @property
    def run_path(self) -> Path:
        return self.adapter.get_run_path(self.data_root, self.run_name)

    # -- stats ----------------------------------------------------------------

    def channel_stats(self, sample_events: int = 64, force: bool = False
                      ) -> Dict[int, ChannelStats]:
        """Per-channel stats; first/last timetags come from parsing the first
        and last file of each channel (bounded work)."""
        if self._stats is not None and not force:
            return self._stats
        stats: Dict[int, ChannelStats] = {}
        for ch, files in self.scan().items():
            st = ChannelStats(
                channel=ch,
                n_files=len(files),
                total_bytes=sum(f.get("size", 0) for f in files),
            )
            paths = [f["path"] for f in files]
            if paths:
                try:
                    first = self.adapter.format_reader.read_file(
                        paths[0], is_first_file=True
                    )
                    last = first if len(paths) == 1 else (
                        self.adapter.format_reader.read_file(
                            paths[-1], is_first_file=False
                        )
                    )
                    ts_first = self._timetags(first)
                    ts_last = self._timetags(last)
                    if len(ts_first):
                        st.first_timetag_ps = int(ts_first.min())
                        st.n_events_sampled += len(ts_first)
                    if len(ts_last):
                        st.last_timetag_ps = int(ts_last.max())
                except Exception:
                    pass
            stats[ch] = st
        self._stats = stats
        return stats

    def _timetags(self, raw: np.ndarray) -> np.ndarray:
        if raw.size == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self.adapter.extract_columns(raw)
        return self.adapter.normalize_timestamp_to_ps(cols["timestamp"])

    # -- reporting ------------------------------------------------------------

    def overview(self) -> str:
        stats = self.channel_stats()
        lines = [
            f"DAQ run: {self.run_name}",
            f"  path: {self.run_path}",
            f"  adapter: {self.adapter.name}",
            f"  channels: {len(stats)}",
            "",
            f"  {'ch':>4} {'files':>6} {'size(MB)':>10} {'window(s)':>10}",
        ]
        for ch in sorted(stats):
            st = stats[ch]
            window = st.acquisition_window_s
            lines.append(
                f"  {ch:>4} {st.n_files:>6} {st.total_bytes / 1e6:>10.2f} "
                f"{window if window is not None else float('nan'):>10.3f}"
            )
        return "\n".join(lines)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "run_name": self.run_name,
            "data_root": self.data_root,
            "adapter": self.adapter.name,
            "run_path": str(self.run_path),
            "channels": {
                str(ch): st.to_dict() for ch, st in self.channel_stats().items()
            },
        }

    def export_json(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.to_dict(), fh, indent=2)


class DAQAnalyzer:
    """Multi-run comparisons over a data root
    (reference analog: utils/daq/daq_analyzer.py:43)."""

    def __init__(self, data_root: str, adapter_name: str = "vx2730") -> None:
        self.data_root = str(data_root)
        self.adapter_name = adapter_name

    def list_runs(self) -> List[str]:
        root = Path(self.data_root)
        if not root.exists():
            return []
        from waveformanalysis_tpu.formats.adapter import get_adapter

        adapter = get_adapter(self.adapter_name)
        runs = []
        for child in sorted(root.iterdir()):
            if not child.is_dir() or child.name.startswith("_"):
                continue
            raw = adapter.get_raw_path(self.data_root, child.name)
            if raw.exists():
                runs.append(child.name)
        return runs

    def get_run(self, run_name: str) -> DAQRun:
        return DAQRun(self.data_root, run_name, adapter_name=self.adapter_name)

    def summary(self) -> str:
        runs = self.list_runs()
        lines = [f"Data root: {self.data_root} ({len(runs)} runs)"]
        for run_name in runs:
            run = self.get_run(run_name)
            stats = run.channel_stats()
            total_mb = sum(s.total_bytes for s in stats.values()) / 1e6
            lines.append(
                f"  {run_name}: {len(stats)} channels, {total_mb:.2f} MB"
            )
        return "\n".join(lines)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "data_root": self.data_root,
            "runs": {name: self.get_run(name).to_dict()
                     for name in self.list_runs()},
        }
