"""Progress tracking with ETA/throughput.

Behavioral analog of the reference ProgressTracker
(reference: waveform_analysis/core/foundation/progress.py:37). Uses tqdm when
available and enabled, otherwise a silent counter, so library code can always
call it unconditionally.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional


class ProgressTracker:
    """Multi-bar progress tracker.

    ``track(name, total)`` opens a named bar; ``update(name, n)`` advances it;
    ``close(name)`` finishes it. Throughput and ETA come from wall-clock deltas.
    """

    def __init__(self, enabled: bool = True, use_tqdm: bool = True) -> None:
        self.enabled = enabled
        self._bars: Dict[str, Any] = {}
        self._state: Dict[str, Dict[str, Any]] = {}
        self._tqdm = None
        if use_tqdm:
            try:
                from tqdm.auto import tqdm  # type: ignore

                self._tqdm = tqdm
            except Exception:
                self._tqdm = None

    def track(self, name: str, total: Optional[int] = None, desc: str = "") -> None:
        if not self.enabled:
            return
        self._state[name] = {"total": total, "done": 0, "t0": time.perf_counter()}
        if self._tqdm is not None:
            self._bars[name] = self._tqdm(total=total, desc=desc or name, leave=False)

    def update(self, name: str, n: int = 1) -> None:
        st = self._state.get(name)
        if st is None:
            return
        st["done"] += n
        bar = self._bars.get(name)
        if bar is not None:
            bar.update(n)

    def close(self, name: str) -> None:
        bar = self._bars.pop(name, None)
        if bar is not None:
            bar.close()
        self._state.pop(name, None)

    def close_all(self) -> None:
        for name in list(self._state):
            self.close(name)

    def stats(self, name: str) -> Optional[Dict[str, Any]]:
        st = self._state.get(name)
        if st is None:
            return None
        elapsed = time.perf_counter() - st["t0"]
        done = st["done"]
        total = st["total"]
        rate = done / elapsed if elapsed > 0 else 0.0
        eta = (total - done) / rate if (total and rate > 0) else None
        return {"done": done, "total": total, "elapsed_s": elapsed, "rate": rate, "eta_s": eta}
