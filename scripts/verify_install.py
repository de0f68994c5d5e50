#!/usr/bin/env python
"""Install smoke check: imports, façade, device backend, tiny pipeline.

Reference analog: scripts/verify_install.py (import + environment sanity).
Run after installing (or from a checkout) to confirm the framework is
usable end-to-end on this machine:

1. package + façade imports resolve (every lazy ``__all__`` name);
2. jax initializes a backend and can execute a jitted reduction;
3. a tiny injected-waveform pipeline produces basic_features through a
   real Context (storage round-trip + cache hit included).

Exit 0 on success, 1 with a per-step report otherwise.
"""

from __future__ import annotations

import sys
import tempfile
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def step(name):
    def deco(fn):
        fn._step_name = name
        return fn
    return deco


@step("package import + version")
def check_import():
    import waveformanalysis_tpu as wfa

    return f"waveformanalysis_tpu {getattr(wfa, '__version__', '(dev)')}"


@step("façade: every lazy __all__ name resolves")
def check_facade():
    import waveformanalysis_tpu as wfa

    missing = []
    for name in wfa.__all__:
        try:
            getattr(wfa, name)
        except Exception:
            missing.append(name)
    if missing:
        raise RuntimeError(f"unresolvable façade names: {missing}")
    return f"{len(wfa.__all__)} names"


@step("jax backend executes")
def check_jax():
    import jax
    import jax.numpy as jnp
    import numpy as np

    total = float(np.asarray(jax.jit(jnp.sum)(jnp.arange(16.0))))
    if total != 120.0:
        raise RuntimeError(f"jit sum returned {total}, expected 120.0")
    dev = jax.devices()[0]
    return f"{dev.platform}:{dev.device_kind}"


@step("tiny pipeline: st_waveforms -> basic_features (+cache hit)")
def check_pipeline():
    import numpy as np

    from waveformanalysis_tpu.testing.fixtures import make_tiny_context

    from waveformanalysis_tpu.plugins.builtin.basic_features import (
        BasicFeaturesPlugin,
    )

    with tempfile.TemporaryDirectory(prefix="wfa_verify_") as tmp:
        ctx = make_tiny_context(tmp, n_events=8, wave_length=64)
        ctx.register(BasicFeaturesPlugin())
        feats = ctx.get_data("test_run", "basic_features")
        arr = feats.to_numpy() if hasattr(feats, "to_numpy") else feats
        if len(arr) != 8:
            raise RuntimeError(f"expected 8 feature rows, got {len(arr)}")
        if not np.all(np.isfinite(arr["area"])):
            raise RuntimeError("non-finite areas in basic_features")
        again = ctx.get_data("test_run", "basic_features")
        again = again.to_numpy() if hasattr(again, "to_numpy") else again
        for f in arr.dtype.names:
            if not np.array_equal(arr[f], again[f]):
                raise RuntimeError(f"cache round-trip changed field {f}")
    return "8 events, cache round-trip bit-identical"


def main() -> int:
    checks = [check_import, check_facade, check_jax, check_pipeline]
    failed = False
    for fn in checks:
        name = fn._step_name
        try:
            detail = fn()
            print(f"  ok: {name}" + (f" — {detail}" if detail else ""))
        except Exception:
            failed = True
            print(f"FAIL: {name}")
            traceback.print_exc()
    print("install check:", "FAILED" if failed else "OK")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
