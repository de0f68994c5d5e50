"""Cache cleaner + diagnostics depth suite.

Behavioral analogs of the reference suites
(reference: tests/test_cache_cleaner.py over core/storage/cache_cleaner.py
strategies/plan/preview/dry-run/execute; tests/test_cache_diagnostics.py
over core/storage/cache_diagnostics.py orphans/integrity/version/report).
"""

import json
from datetime import datetime, timedelta, timezone
from pathlib import Path

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.storage.cache_ops import (
    CacheAnalyzer,
    CacheCleaner,
    CacheDiagnostics,
    CleanPlan,
)


def _age(storage, key, run_id, seconds):
    meta = storage.get_metadata(key, run_id)
    meta["created_at"] = (
        datetime.now(timezone.utc) - timedelta(seconds=seconds)
    ).isoformat()
    storage.save_metadata(key, meta, run_id=run_id)


@pytest.fixture
def populated(tmp_path):
    """(ctx, storage): three runs x data types with controlled ages/sizes."""
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    storage = ctx.storage
    layout = [
        # (run, data_name, rows, age_s)
        ("run_a", "peaks", 100, 10 * 3600),
        ("run_a", "waveforms", 4000, 30 * 3600),
        ("run_b", "peaks", 200, 50 * 3600),
        ("run_b", "waveforms", 1000, 70 * 3600),
        ("run_c", "hits", 300, 90 * 3600),
    ]
    for run_id, data_name, rows, age_s in layout:
        key = f"{run_id}-{data_name}-abc123"
        data = np.zeros(rows, dtype=[("time", "<f8"), ("value", "<f4")])
        storage.save_memmap(key, data, run_id=run_id)
        _age(storage, key, run_id, age_s)
    return ctx, storage


class TestCleanPlan:
    def test_empty_plan(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        plan = CacheCleaner(ctx.storage).plan()
        assert plan.to_delete == [] and plan.total_bytes == 0
        assert "0 entries" in plan.preview()

    def test_preview_lists_entries_and_reasons(self, populated):
        _, storage = populated
        plan = CacheCleaner(storage).plan(max_age_s=40 * 3600)
        text = plan.preview()
        assert f"{len(plan.to_delete)} entries" in text
        for e in plan.to_delete:
            assert e.key in text
        assert "age" in text


class TestCleanerStrategies:
    def test_plan_by_age(self, populated):
        _, storage = populated
        plan = CacheCleaner(storage).plan(max_age_s=60 * 3600)
        names = {e.key for e in plan.to_delete}
        assert names == {"run_b-waveforms-abc123", "run_c-hits-abc123"}

    def test_plan_oldest_first_size_budget(self, populated):
        _, storage = populated
        cleaner = CacheCleaner(storage)
        entries = cleaner.analyzer.scan()
        total = sum(e.size_bytes for e in entries)
        biggest = max(entries, key=lambda e: e.size_bytes)
        # leave room for everything but ~one entry: oldest goes first
        plan = cleaner.plan(max_total_bytes=total - 1, strategy="oldest")
        assert plan.to_delete
        oldest = max(entries, key=lambda e: e.age_s or 0)
        assert plan.to_delete[0].key in {e.key for e in plan.to_delete}
        assert oldest.key in {e.key for e in plan.to_delete}

    def test_plan_largest_first_size_budget(self, populated):
        _, storage = populated
        cleaner = CacheCleaner(storage)
        entries = cleaner.analyzer.scan()
        total = sum(e.size_bytes for e in entries)
        biggest = max(entries, key=lambda e: e.size_bytes)
        plan = cleaner.plan(max_total_bytes=total - 1, strategy="largest")
        assert {e.key for e in plan.to_delete} == {biggest.key}

    def test_unknown_strategy_rejected(self, populated):
        _, storage = populated
        with pytest.raises(ValueError, match="strategy"):
            CacheCleaner(storage).plan(strategy="newest")

    def test_plan_by_run(self, populated):
        _, storage = populated
        plan = CacheCleaner(storage).plan(run_id="run_b",
                                          max_age_s=0)
        assert {e.run_id for e in plan.to_delete} == {"run_b"}
        assert len(plan.to_delete) == 2

    def test_plan_by_data_type(self, populated):
        _, storage = populated
        plan = CacheCleaner(storage).plan(data_name="peaks")
        assert len(plan.to_delete) == 2
        assert all("peaks" in e.key for e in plan.to_delete)
        assert all("data type" in r for r in plan.reasons.values())

    def test_data_type_filter_composes_with_age(self, populated):
        _, storage = populated
        plan = CacheCleaner(storage).plan(data_name="peaks",
                                          max_age_s=20 * 3600)
        assert {e.key for e in plan.to_delete} == {"run_b-peaks-abc123"}

    def test_keep_recent_protects(self, populated):
        _, storage = populated
        # age selects everything; keep_recent protects the two youngest
        plan = CacheCleaner(storage).plan(max_age_s=0,
                                          keep_recent_s=40 * 3600)
        kept = {"run_a-peaks-abc123", "run_a-waveforms-abc123"}
        assert kept.isdisjoint({e.key for e in plan.to_delete})
        assert len(plan.to_delete) == 3

    def test_storage_version_mismatch_selected(self, populated):
        _, storage = populated
        key = "run_a-peaks-abc123"
        meta = storage.get_metadata(key, "run_a")
        meta["storage_version"] = "0.0-old"
        storage.save_metadata(key, meta, run_id="run_a")
        plan = CacheCleaner(storage).plan(
            storage_version=storage.get_metadata(
                "run_b-peaks-abc123", "run_b")["storage_version"])
        assert key in {e.key for e in plan.to_delete}


class TestCleanerExecution:
    def test_execute_dry_run_deletes_nothing(self, populated):
        _, storage = populated
        cleaner = CacheCleaner(storage)
        plan = cleaner.plan(max_age_s=0)
        n = cleaner.execute(plan, dry_run=True)
        assert n == 5
        assert len(cleaner.analyzer.scan()) == 5

    def test_execute_actual_deletes(self, populated):
        _, storage = populated
        cleaner = CacheCleaner(storage)
        plan = cleaner.plan(max_age_s=60 * 3600)
        n = cleaner.execute(plan)
        assert n == 2
        remaining = {e.key for e in cleaner.analyzer.scan()}
        assert "run_c-hits-abc123" not in remaining
        assert len(remaining) == 3

    def test_clean_convenience(self, populated):
        _, storage = populated
        n = CacheCleaner(storage).clean(run_id="run_a", max_age_s=0)
        assert n == 2
        assert CacheAnalyzer(storage).scan("run_a") == []


class TestDiagnostics:
    def test_diagnose_empty_cache(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        report = CacheDiagnostics(ctx.storage).diagnose()
        assert report["is_healthy"]

    def test_diagnose_healthy_cache(self, populated):
        _, storage = populated
        report = CacheDiagnostics(storage).diagnose()
        assert report["is_healthy"]
        assert report["healthy"] >= 5
        assert report["corrupt"] == []

    def test_orphan_payload_detected(self, populated):
        _, storage = populated
        d = Path(storage.work_dir) / "run_a" / storage.data_subdir
        (d / "run_a-stray-ffff.bin").write_bytes(b"\x00" * 16)
        report = CacheDiagnostics(storage).diagnose("run_a")
        assert "run_a-stray-ffff" in report["orphan_payloads"]
        assert not report["is_healthy"]

    def test_orphan_metadata_detected(self, populated):
        _, storage = populated
        d = Path(storage.work_dir) / "run_b" / storage.data_subdir
        (d / "run_b-ghost-eeee.json").write_text(json.dumps({"fields": {}}))
        report = CacheDiagnostics(storage).diagnose("run_b")
        assert "run_b-ghost-eeee" in report["orphan_metadata"]
        assert not report["is_healthy"]

    def test_corruption_detected(self, populated):
        _, storage = populated
        d = Path(storage.work_dir) / "run_c" / storage.data_subdir
        target = next(iter(d.glob("*.bin")))
        blob = bytearray(target.read_bytes())
        if len(blob) > 8:
            blob[8] ^= 0xFF
        target.write_bytes(bytes(blob))
        report = CacheDiagnostics(storage).diagnose("run_c")
        assert report["corrupt"]
        assert not report["is_healthy"]

    def test_version_mismatch_detected(self, populated):
        _, storage = populated
        key = "run_a-waveforms-abc123"
        meta = storage.get_metadata(key, "run_a")
        meta["storage_version"] = "ancient"
        storage.save_metadata(key, meta, run_id="run_a")
        report = CacheDiagnostics(storage).diagnose("run_a")
        assert key in report["version_mismatch"]
        assert not report["is_healthy"]

    def test_run_filter_scopes_diagnosis(self, populated):
        _, storage = populated
        d = Path(storage.work_dir) / "run_a" / storage.data_subdir
        (d / "run_a-stray-ffff.bin").write_bytes(b"\x00" * 16)
        # run_b is untouched, so a run_b-scoped diagnosis stays healthy
        report_b = CacheDiagnostics(storage).diagnose("run_b")
        assert report_b["is_healthy"]

    def test_cleaner_removes_diagnosed_corruption(self, populated):
        """diagnose -> plan(failed_integrity) -> execute heals the cache."""
        _, storage = populated
        d = Path(storage.work_dir) / "run_c" / storage.data_subdir
        target = next(iter(d.glob("*.bin")))
        blob = bytearray(target.read_bytes())
        if len(blob) > 8:
            blob[8] ^= 0xFF
        target.write_bytes(bytes(blob))
        cleaner = CacheCleaner(storage)
        plan = cleaner.plan(run_id="run_c", failed_integrity=True)
        assert plan.to_delete
        cleaner.execute(plan)
        report = CacheDiagnostics(storage).diagnose("run_c")
        assert report["corrupt"] == []
