"""BatchProcessor tests: thread/process fan-out, error strategies, retries,
cancellation, config grid (reference analog: tests/test_batch_processor_*)."""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.data.batch_processor import BatchProcessor
from waveformanalysis_tpu.execution.cancellation import CancellationToken
from waveformanalysis_tpu.plugins.base import Option, Plugin


class SyntheticPlugin(Plugin):
    """Deterministic data derived from run_id; fails on demand."""

    provides = "synthetic"
    version = "1.0"
    save_when = "always"
    options = {
        "scale": Option(default=1.0, type=float),
        "fail_runs": Option(default=None, type=list),
    }

    def compute(self, context, run_id, **kwargs):
        fail_runs = context.get_config(self, "fail_runs") or []
        if run_id in fail_runs:
            raise RuntimeError(f"synthetic failure for {run_id}")
        scale = context.get_config(self, "scale")
        seed = abs(hash(run_id)) % 1000
        arr = np.zeros(4, dtype=[("time", "i8"), ("v", "f8")])
        arr["time"] = np.arange(4)
        arr["v"] = seed * scale
        return arr


@pytest.fixture
def ctx(tmp_path):
    c = Context(storage_dir=str(tmp_path / "store"),
                config={"show_progress": False})
    c.register(SyntheticPlugin())
    return c


class TestThreadBatch:
    def test_process_runs(self, ctx):
        bp = BatchProcessor(ctx, executor_type="thread", max_workers=4)
        result = bp.process_runs(["r1", "r2", "r3"], "synthetic")
        assert sorted(result.succeeded) == ["r1", "r2", "r3"]
        assert result.get("r1").data is not None
        assert not result.cancelled

    def test_on_error_continue(self, ctx):
        ctx.set_config({"synthetic": {"fail_runs": ["r2"]}})
        bp = BatchProcessor(ctx, on_error="continue")
        result = bp.process_runs(["r1", "r2", "r3"], "synthetic")
        assert sorted(result.succeeded) == ["r1", "r3"]
        assert result.failed == ["r2"]
        assert "synthetic failure" in result.get("r2").error
        assert "Traceback" in result.get("r2").traceback_str

    def test_on_error_raise(self, ctx):
        ctx.set_config({"synthetic": {"fail_runs": ["r1"]}})
        bp = BatchProcessor(ctx, on_error="raise", max_workers=1)
        with pytest.raises(RuntimeError, match="r1 failed"):
            bp.process_runs(["r1", "r2"], "synthetic")

    def test_retries(self, ctx, tmp_path):
        attempts = {"n": 0}

        class Flaky(Plugin):
            provides = "flaky"

            def compute(self, context, run_id, **kwargs):
                attempts["n"] += 1
                if attempts["n"] < 3:
                    raise RuntimeError("transient")
                return np.zeros(1)

        c = Context(storage_dir=str(tmp_path / "s2"), config={"show_progress": False})
        c.register(Flaky())
        bp = BatchProcessor(c, retries=3, max_workers=1)
        result = bp.process_runs(["r"], "flaky")
        assert result.succeeded == ["r"]
        assert result.get("r").attempts == 3

    def test_cancellation(self, ctx):
        token = CancellationToken()
        token.cancel()
        bp = BatchProcessor(ctx)
        result = bp.process_runs(["r1", "r2"], "synthetic",
                                 cancellation_token=token)
        assert result.cancelled
        assert len(result.succeeded) == 0

    def test_polling_mode_reports_progress(self, ctx):
        # the reference's Jupyter polling mode: wake every interval, call
        # on_progress(done, total), stay cancellable while workers run
        seen = []
        bp = BatchProcessor(ctx, max_workers=2)
        result = bp.process_runs(
            ["r1", "r2", "r3"], "synthetic",
            poll_interval_s=0.01,
            on_progress=lambda done, total: seen.append((done, total)),
        )
        assert sorted(result.succeeded) == ["r1", "r2", "r3"]
        assert seen and all(t == 3 for _, t in seen)
        assert seen[-1][0] == 3

    def test_polling_mode_cancellation_mid_batch(self, ctx):
        token = CancellationToken()
        bp = BatchProcessor(ctx, max_workers=1)

        def cancel_after_first(done, total):
            if done >= 1:
                token.cancel()

        result = bp.process_runs(
            ["r1", "r2", "r3", "r4"], "synthetic",
            cancellation_token=token,
            poll_interval_s=0.01,
            on_progress=cancel_after_first,
        )
        assert result.cancelled
        assert len(result.succeeded) < 4

    def test_config_grid(self, ctx):
        bp = BatchProcessor(ctx, max_workers=2)
        result = bp.process_runs_with_config_grid(
            ["rA"], "synthetic",
            config_grid=[{"synthetic": {"scale": 1.0}},
                         {"synthetic": {"scale": 2.0}}],
        )
        assert sorted(result.results) == ["rA#0", "rA#1"]
        v0 = result.get("rA#0").data["v"][0]
        v1 = result.get("rA#1").data["v"][0]
        assert v1 == 2 * v0

    def test_process_func(self, ctx):
        bp = BatchProcessor(ctx)
        result = bp.process_func(["x", "y"], lambda c, r: r.upper())
        assert result.get("x").data == "X"
        assert result.get("y").data == "Y"

    def test_summary(self, ctx):
        ctx.set_config({"synthetic": {"fail_runs": ["bad"]}})
        bp = BatchProcessor(ctx)
        result = bp.process_runs(["ok", "bad"], "synthetic")
        text = result.summary()
        assert "1 succeeded, 1 failed" in text
        assert "FAILED bad" in text


class TestProcessBatch:
    def test_process_pool_with_factory(self, tmp_path):
        # plugin must be importable by workers -> use a module-level plugin
        c = Context(storage_dir=str(tmp_path / "store"),
                    config={"show_progress": False})
        c.register(SyntheticPlugin())
        bp = BatchProcessor(c, executor_type="process", max_workers=2)
        result = bp.process_runs(["p1", "p2"], "synthetic")
        assert sorted(result.succeeded) == ["p1", "p2"]
        # workers persisted into shared storage
        key = c.key_for("p1", "synthetic")
        assert c.storage.exists(key, "p1")

    def test_validation_errors(self, ctx):
        with pytest.raises(ValueError):
            BatchProcessor(ctx, on_error="explode")
        with pytest.raises(ValueError):
            BatchProcessor(ctx, executor_type="fiber")
