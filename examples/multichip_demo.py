"""Multi-chip scaling: the fused chain sharded over a device mesh.

Shards the event axis over a ("data",) mesh; per-event outputs stay
sharded on their devices while run statistics (S1/S2 counts, total area)
psum-reduce across the mesh. On real hardware the collectives ride ICI;
here the same program runs on a virtual 8-device CPU mesh so the demo
works anywhere:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_demo.py
"""

import os
import sys
from pathlib import Path

# must precede any jax import to get the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from waveformanalysis_tpu.models.full_chain import (  # noqa: E402
    ChainConfig,
    example_chain_batch,
    make_sharded_chain,
)
from waveformanalysis_tpu.parallel.mesh import make_mesh  # noqa: E402


def main() -> None:
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} ({jax.devices()[0].platform})")
    mesh = make_mesh(n_devices=n_dev, axis_names=("data",))

    # amplitude-mode peak finding with thresholds matched to the synthetic
    # pulses so the demo shows both S1 (narrow) and S2 (wide) populations
    cfg = ChainConfig(use_derivative=False, peak_height=80.0,
                      peak_prominence=50.0, peak_width=2.0)
    step = make_sharded_chain(mesh, cfg)

    waves, el, bl, pol = example_chain_batch(n_events=n_dev * 64,
                                             wave_length=256)
    out = step(waves, el, bl, pol)

    # per-event outputs are sharded across the mesh
    lab_sharding = out["label"].sharding
    print(f"label sharding: {lab_sharding}")
    # statistics were psum-reduced over the mesh axis and are replicated
    print(f"S1={int(out['n_s1'])}  S2={int(out['n_s2'])}  "
          f"total_area={float(out['total_area']):.1f}")

    labels = np.asarray(out["label"])
    assert int(out["n_s1"]) == int(np.sum(labels == 1))
    assert int(out["n_s2"]) == int(np.sum(labels == 2))
    print("sharded statistics match the gathered per-event labels")


if __name__ == "__main__":
    main()
