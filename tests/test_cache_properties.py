"""Randomized property tests for the lineage-cache contract.

The single most important invariant (SURVEY §7): data names, config
precedence, and the lineage-hash cache contract ARE the API. This walks a
small plugin DAG through random operation sequences and asserts, at every
step, that what comes out of the cache equals what a fresh recompute
produces — i.e. the cache can never serve stale data after config changes,
clears, clones, or cross-context reloads.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.base import Option, Plugin


class Source(Plugin):
    provides = "src"
    version = "1.0.0"
    save_when = "always"
    options = {
        "n": Option(default=8, type=int),
        "scale": Option(default=1.0, type=float),
    }

    def compute(self, context, run_id, **kwargs):
        n = context.get_config(self, "n")
        s = context.get_config(self, "scale")
        return np.arange(n, dtype=np.float64) * s


class Double(Plugin):
    provides = "dbl"
    depends_on = ["src"]
    version = "1.0.0"
    save_when = "always"
    options = {"offset": Option(default=0.0, type=float)}

    def compute(self, context, run_id, **kwargs):
        off = context.get_config(self, "offset")
        return context.get_data(run_id, "src") * 2.0 + off


class Sum(Plugin):
    provides = "total"
    depends_on = ["dbl"]
    version = "1.0.0"
    save_when = "always"

    def compute(self, context, run_id, **kwargs):
        return np.asarray([context.get_data(run_id, "dbl").sum()])


def expected(cfg):
    """Ground truth from the current config dict."""
    src = np.arange(cfg["n"], dtype=np.float64) * cfg["scale"]
    dbl = src * 2.0 + cfg["offset"]
    return {"src": src, "dbl": dbl, "total": np.asarray([dbl.sum()])}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_operation_walk_never_serves_stale_data(tmp_path, seed):
    rng = np.random.default_rng(seed)
    ctx = Context(storage_dir=str(tmp_path / "store"),
                  config={"show_progress": False})
    ctx.register(Source(), Double(), Sum())
    cfg = {"n": 8, "scale": 1.0, "offset": 0.0}
    run = "r"

    for step in range(40):
        op = rng.choice(["get", "set_config", "clear", "clone", "reload"])
        if op == "get":
            name = rng.choice(["src", "dbl", "total"])
            got = np.asarray(ctx.get_data(run, name))
            np.testing.assert_allclose(got, expected(cfg)[name],
                                       err_msg=f"step {step} get {name}")
        elif op == "set_config":
            key = rng.choice(["n", "scale", "offset"])
            if key == "n":
                cfg["n"] = int(rng.integers(2, 12))
                ctx.set_config({"src.n": cfg["n"]})
            elif key == "scale":
                cfg["scale"] = float(rng.integers(1, 5))
                ctx.set_config({"src.scale": cfg["scale"]})
            else:
                cfg["offset"] = float(rng.integers(0, 9))
                ctx.set_config({"dbl.offset": cfg["offset"]})
        elif op == "clear":
            name = rng.choice(["src", "dbl", "total"])
            ctx.clear_cache_for(run, name, downstream=bool(rng.integers(2)))
        elif op == "clone":
            # clone keeps storage and explicit config; results must carry
            ctx = ctx.clone()
            for k, v in (("src.n", cfg["n"]), ("src.scale", cfg["scale"]),
                         ("dbl.offset", cfg["offset"])):
                ctx.set_config({k: v})
        else:  # reload: brand-new context over the same storage dir
            ctx = Context(storage_dir=str(tmp_path / "store"),
                          config={"show_progress": False})
            ctx.register(Source(), Double(), Sum())
            for k, v in (("src.n", cfg["n"]), ("src.scale", cfg["scale"]),
                         ("dbl.offset", cfg["offset"])):
                ctx.set_config({k: v})

    # final sweep: every data name correct
    for name, want in expected(cfg).items():
        np.testing.assert_allclose(np.asarray(ctx.get_data(run, name)), want)


def test_same_lineage_same_key_different_config_different_key(tmp_path):
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx.register(Source(), Double(), Sum())
    k1 = ctx.key_for("r", "total")
    assert ctx.key_for("r", "total") == k1  # deterministic
    ctx.set_config({"src.scale": 3.0})
    k2 = ctx.key_for("r", "total")
    assert k2 != k1  # upstream config folds into downstream lineage
    ctx.set_config({"src.scale": 1.0})
    assert ctx.key_for("r", "total") == k1  # restoring config restores key
