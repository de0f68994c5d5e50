"""Randomized cross-option config fuzz: the reference as an oracle on COMBOS.

`test_reference_differential_configs.py` sweeps reference options one at a
time (33 single-option sets). What that matrix cannot see is option
INTERACTION bugs: a pair of options that are each plumbed correctly alone
but compose differently here than in the reference (e.g. `use_filtered`
hits feeding a non-default merge gap, or a features window evaluated on a
re-baselined wave). This module draws seeded random COMBINATIONS of 2-4
known-good axes (one per config scope, so no intra-plugin overwrites),
drives BOTH Contexts (ours and `/root/reference`'s — reference option
surfaces: core/plugins/builtin/cpu/{peak_finding,hit_finder,hit_merge,
basic_features,waveform_width,waveform_width_integral,s1_s2_classifier,
waveforms,dataframe}.py) over the same multi-pulse VX2730 run, and compares
the union of the affected outputs plus the downstream S1/S2 cone
field-by-field.

Draws are seeded (`numpy.random.default_rng(_SEED)`), so the matrix is
deterministic and reproducible; bump `_SEED` deliberately to rotate the
sampled combos. Each combo must also be DISCRIMINATING: at least one
compared output must differ from the default-config outputs, else the combo
is testing nothing.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import test_reference_differential as base  # noqa: E402
import test_reference_differential_configs as cfgmod  # noqa: E402

pytestmark = pytest.mark.slow

_SEED = 20260820
_N_COMBOS = 8


@pytest.fixture(scope="module", autouse=True)
def _fresh_jax_caches():
    """Same executable-shedding guard as the configs module (full-suite
    SIGSEGV note there)."""
    import jax

    jax.clear_caches()
    yield
    jax.clear_caches()


# ---------------------------------------------------------------------------
# axis pool: (axis_id, config fragment, affected data names). Every axis is
# individually covered (and therefore calibrated against the fixture) by the
# single-option sweep matrix; the fuzz layer only composes them. One axis
# per top-level scope key is drawn, so fragments merge without overwrites.
# Filtering axes are limited to the SG family — the BW cascade carries its
# own documented tolerance class (docs/PARITY.md) and is pinned separately.
# ---------------------------------------------------------------------------
AXES = [
    ("hit_low", {"hit": {"height": 8.0, "prominence": 0.5}}, ["hit"]),
    ("hit_dist", {"hit": {"distance": 16}}, ["hit"]),
    ("hit_raw", {"hit": {"use_filtered": False, "width": 1}}, ["hit"]),
    ("hit_absw", {"hit": {"use_derivative": False, "height": 50.0}},
     ["hit"]),
    ("thr", {"hit_threshold": {"threshold": 70.0, "left_extension": 4,
                               "right_extension": 6}}, ["hit_threshold"]),
    ("thr_filt", {"hit_threshold": {"use_filtered": True}},
     ["hit_threshold"]),
    ("merge", {"hit_merge_clusters": {"merge_gap_ns": 40.0}},
     ["hit_merged"]),
    ("merge_cap", {"hit_merge_clusters": {"merge_gap_ns": 180.0,
                                          "max_total_width_ns": 70.0}},
     ["hit_merged"]),
    ("feat_filt", {"basic_features": {"use_filtered": True}},
     ["basic_features"]),
    ("feat_win", {"basic_features": {"height_range": (40, 130),
                                     "area_range": (36, 150)}},
     ["basic_features"]),
    ("width_lv", {"waveform_width": {"rise_low": 0.15, "rise_high": 0.85,
                                     "fall_high": 0.7, "fall_low": 0.3}},
     ["waveform_width"]),
    ("wwi_q", {"waveform_width_integral": {"q_low": 0.2, "q_high": 0.8}},
     ["waveform_width_integral"]),
    ("s1s2", {"s1_s2": {"s1_width_range": (0.0, 25.0),
                        "s2_width_range": (25.0, 8000.0)}}, ["s1_s2"]),
    ("window", {"time_window_ns": 250.0}, ["df_events"]),
    ("baseline", {"st_waveforms": {"baseline_samples": 24}},
     ["st_waveforms"]),
]

# downstream cone always compared on top of the drawn axes' own outputs:
# interactions surface where the composed inputs meet, which is exactly the
# hit/merge/classification chain.
ALWAYS_COMPARE = ["hit", "hit_merged", "s1_s2"]

# hit_merged rows are aggregates of hit_threshold rows, so when a combo puts
# the threshold finder on the f4 FILTERED wave (thr_filt) the merged
# heights/edges inherit hit_threshold's filtered-wave tolerance class
# (docs/PARITY.md; observed max rel 1.2e-5 on height under
# hit_dist+thr_filt+s1s2). The single-option sweeps never compose these two
# axes, which is exactly why the class only shows up here.
FUZZ_ATOL_OVERRIDES = dict(cfgmod.DEFAULT_ATOL_OVERRIDES)
FUZZ_ATOL_OVERRIDES.update({
    ("hit_merged", "height"): (3e-5, 1e-6),
    ("hit_merged", "integral"): (3e-5, 1e-6),
    ("hit_merged", "edge_start"): (1e-5, 1e-4),
    ("hit_merged", "edge_end"): (1e-5, 1e-4),
    ("hit_merged", "width"): (1e-5, 1e-4),
    ("hit_merged", "rise_time"): (1e-5, 1e-4),
    ("hit_merged", "fall_time"): (1e-5, 1e-4),
})


def _draw_combos():
    rng = np.random.default_rng(_SEED)
    combos = []
    seen = set()
    while len(combos) < _N_COMBOS:
        k = int(rng.integers(2, 5))  # 2-4 axes per combo
        picks = rng.choice(len(AXES), size=k, replace=False)
        # one axis per scope: keep the first axis drawn for each scope key
        by_scope = {}
        for i in sorted(int(p) for p in picks):
            scope = next(iter(AXES[i][1]))
            by_scope.setdefault(scope, i)
        chosen = tuple(sorted(by_scope.values()))
        if len(chosen) < 2 or chosen in seen:
            continue
        seen.add(chosen)
        cfg = {}
        names = set(ALWAYS_COMPARE)
        ids = []
        for i in chosen:
            axis_id, frag, affected = AXES[i]
            ids.append(axis_id)
            cfg.update({k: (dict(v) if isinstance(v, dict) else v)
                        for k, v in frag.items()})
            names.update(affected)
        combos.append(("+".join(ids), cfg, sorted(names)))
    return combos


COMBOS = _draw_combos()


@pytest.fixture(scope="module")
def fuzz_run(tmp_path_factory):
    """Same multi-pulse geometry as the configs module's rich run (the axis
    values above are calibrated against it)."""
    tmp = tmp_path_factory.mktemp("diff_fuzz")
    from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run

    run_dir = make_synthetic_vx2730_run(
        str(tmp / "DAQ"), "run_fuzz", n_channels=2, n_rows=48,
        n_samples=160, noise=4, seed=11,
        channel_offset_ps=120_000,
        pulses=[
            (48, 320, 4),
            (60, 90, 3),
            (84, 26, 3),
            (110, 180, 14),
        ],
    )
    return tmp, (tmp / "DAQ", run_dir)


@pytest.fixture(scope="module")
def fuzz_defaults(fuzz_run):
    union = sorted({n for _, _, names in COMBOS for n in names})
    return cfgmod._drive(fuzz_run, "defaults", None, union, "ours")


@pytest.mark.parametrize("combo_id,cfg,names", COMBOS,
                         ids=[c[0] for c in COMBOS])
def test_fuzz_combo_parity(fuzz_run, fuzz_defaults, combo_id, cfg, names):
    ours = cfgmod._drive(fuzz_run, combo_id, cfg, names, "ours")

    # the combo must be discriminating somewhere
    assert any(
        cfgmod._rows_differ(n, fuzz_defaults[n], ours[n]) for n in names
    ), (
        f"combo '{combo_id}' changed nothing vs defaults — "
        "axes may be silently ignored in composition"
    )

    ref = cfgmod._drive(fuzz_run, combo_id, cfg, names, "ref")
    for name in names:
        cfgmod._compare_any(name, ref[name], ours[name],
                            FUZZ_ATOL_OVERRIDES)


# ---------------------------------------------------------------------------
# V1725 (binary adapter) combos: the acquisition options flow through the
# device-unpack decode path, so compose them there too. Axes are the
# calibrated values from the configs module's V1725_SWEEPS; scopes are
# pairwise distinct, so every 2-4 subset is a valid combo.
# ---------------------------------------------------------------------------
V_AXES = [
    ("v_dt", {"st_waveforms": {"dt": 7}}, ["st_waveforms"]),
    ("v_thr", {"hit_threshold": {"threshold": 200.0, "left_extension": 2,
                                 "right_extension": 2}}, ["hit_threshold"]),
    ("v_raw", {"hit": {"height": 40.0, "use_filtered": False, "width": 1}},
     ["hit"]),
    ("v_merge", {"hit_merge_clusters": {"merge_gap_ns": 2500.0}},
     ["hit_merged"]),
]

V_COMBOS = []
for _i in range(len(V_AXES)):
    for _j in range(_i + 1, len(V_AXES)):
        _axes = [V_AXES[_i], V_AXES[_j]]
        _cfg = {}
        _names = {"hit_threshold", "hit_merged"}
        for _, _frag, _affected in _axes:
            _cfg.update({k: dict(v) for k, v in _frag.items()})
            _names.update(_affected)
        V_COMBOS.append(("+".join(a[0] for a in _axes), _cfg,
                         sorted(_names)))
V_COMBOS.append(("v_all_four",
                 {k: dict(v) for _, f, _n in V_AXES for k, v in f.items()},
                 sorted({n for _, _, ns in V_AXES for n in ns}
                        | {"hit_threshold", "hit_merged"})))


@pytest.fixture(scope="module")
def v_fuzz_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("diff_fuzz_v1725")
    from utils import write_v1725_run

    run_dir = write_v1725_run(tmp / "DAQB", "run_fuzzb", n_events=24,
                              n_samples=64)
    return tmp, (tmp / "DAQB", run_dir)


@pytest.fixture(scope="module")
def v_fuzz_defaults(v_fuzz_run):
    union = sorted({n for _, _, names in V_COMBOS for n in names})
    return cfgmod._drive_v1725(v_fuzz_run, "defaults", None, union, "ours")


@pytest.mark.parametrize("combo_id,cfg,names", V_COMBOS,
                         ids=[c[0] for c in V_COMBOS])
def test_v1725_fuzz_combo_parity(v_fuzz_run, v_fuzz_defaults, combo_id,
                                 cfg, names):
    ours = cfgmod._drive_v1725(v_fuzz_run, combo_id, cfg, names, "ours")
    assert any(
        cfgmod._rows_differ(n, v_fuzz_defaults[n], ours[n]) for n in names
    ), (
        f"combo '{combo_id}' changed nothing vs defaults — "
        "axes may be silently ignored in composition"
    )
    ref = cfgmod._drive_v1725(v_fuzz_run, combo_id, cfg, names, "ref")
    for name in names:
        cfgmod._compare_any(name, ref[name], ours[name],
                            FUZZ_ATOL_OVERRIDES, pair_tag="v1725")
