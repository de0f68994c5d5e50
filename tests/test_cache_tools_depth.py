"""Cache maintenance tools (reference analog: utils/cache_tools.py over the
analyzer/cleaner suite): info/report/health, age- and size-budget cleanup,
per-run clears — against a real populated storage.
"""

import os
import time

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context
from waveformanalysis_tpu.utils.cache_tools import (
    cache_health,
    cache_info,
    cache_report,
    clear_old_entries,
    clear_run,
    enforce_size_budget,
)


class BulkPlugin(Plugin):
    provides = "bulk"
    depends_on = []
    save_when = "always"

    def compute(self, context, run_id, **kwargs):
        return Table({"x": np.zeros(50_000, dtype=np.int64)})


@pytest.fixture()
def populated(tmp_path):
    ctx = make_tiny_context(tmp_path)
    ctx.register(BulkPlugin())
    for rid in ("r1", "r2", "r3"):
        ctx.get_data(rid, "bulk")
    ctx.flush_saves()
    return ctx


class TestInfoAndHealth:
    def test_cache_info_counts(self, populated):
        info = cache_info(populated)
        assert info["n_entries"] >= 3
        assert info["total_mb"] > 0

    def test_cache_info_run_scoped(self, populated):
        info = cache_info(populated, run_id="r1")
        assert info["n_entries"] == 1

    def test_report_renders(self, populated):
        text = cache_report(populated)
        assert "r1" in text or "bulk" in text or "entries" in text.lower()

    def test_health_is_healthy(self, populated):
        health = cache_health(populated)
        assert health.get("is_healthy", True)


class TestCleanup:
    def test_clear_run(self, populated):
        removed = clear_run(populated, "r2")
        assert removed >= 1
        assert cache_info(populated, run_id="r2")["n_entries"] == 0
        assert cache_info(populated, run_id="r1")["n_entries"] == 1

    def test_clear_old_entries(self, populated, tmp_path):
        # age one run's entries via their created_at metadata (the cleaner
        # reads metadata, not file mtimes)
        import json
        from datetime import datetime, timedelta, timezone

        aged = 0
        old_iso = (datetime.now(timezone.utc)
                   - timedelta(hours=48)).isoformat()
        for p in tmp_path.rglob("*.json"):
            if "r1" in str(p):
                meta = json.loads(p.read_text())
                meta["created_at"] = old_iso
                p.write_text(json.dumps(meta))
                aged += 1
        assert aged >= 1
        removed = clear_old_entries(populated, max_age_hours=24.0)
        assert removed >= 1
        assert cache_info(populated, run_id="r1")["n_entries"] == 0
        assert cache_info(populated, run_id="r3")["n_entries"] == 1

    def test_enforce_size_budget(self, populated):
        info = cache_info(populated)
        total = info["total_mb"]
        removed = enforce_size_budget(populated, max_total_mb=total / 3)
        assert removed >= 1
        assert cache_info(populated)["total_mb"] <= total

    def test_budget_no_op_when_under(self, populated):
        removed = enforce_size_budget(populated, max_total_mb=10_000.0)
        assert removed == 0
