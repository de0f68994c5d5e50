"""Fused subgraph execution: identical results, one device program.

Covers context/fusion.py + the execution-domain integration: the
basic_features / hit / hit_threshold bundle must produce bit-identical
outputs to the per-plugin path, honor save_when + lineage, skip plugins
with overridden compute, and be disabled by config.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.context.fusion import WaveChainFusion
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.hit_finder import ThresholdHitPlugin
from waveformanalysis_tpu.plugins.builtin.peak_finding import HitFinderPlugin
from waveformanalysis_tpu.plugins.builtin.s1_s2_classifier import S1S2ClassifierPlugin
from waveformanalysis_tpu.plugins.builtin.waveform_width import WaveformWidthPlugin
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


def _st(n=512, L=128, seed=0):
    st = make_fake_st_waveforms(
        n_events=n, wave_length=L, pulse_height=300, polarity="positive",
        seed=seed,
    )
    st["channel"] = (np.arange(n) % 2).astype(np.int16)
    return st


def _make_ctx(tmp_path, sub, fused):
    ctx = Context(storage_dir=str(tmp_path / sub),
                  config={"show_progress": False, "fused_execution": fused})
    ctx.register(BasicFeaturesPlugin(), HitFinderPlugin(), ThresholdHitPlugin(),
                 WaveformWidthPlugin(), S1S2ClassifierPlugin())
    # square-pulse fixture: detect on the inverted signal (the derivative is
    # a single-sample spike that the width criterion rejects)
    ctx.set_config({"hit": {"use_filtered": False, "use_derivative": False,
                            "height": 100.0, "prominence": 50.0, "width": 2},
                    "s1_s2": {"s1_width_range": (0.0, 30.0),
                              "s2_width_range": (40.0, 10000.0)}})
    return ctx


def _tables_equal(a, b):
    if not isinstance(a, Table):
        a = Table.from_numpy(a)
    if not isinstance(b, Table):
        b = Table.from_numpy(b)
    assert a.field_names == b.field_names
    for k in a.field_names:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=f"field {k}"
        )


@pytest.mark.parametrize("target", ["s1_s2"])
def test_fused_equals_unfused_full_chain(tmp_path, target):
    st = _st()
    ctx_f = _make_ctx(tmp_path, "fused", True)
    ctx_u = _make_ctx(tmp_path, "unfused", False)
    for ctx in (ctx_f, ctx_u):
        ctx.inject_data("r", "st_waveforms", st)

    out_f = ctx_f.get_data("r", target)
    out_u = ctx_u.get_data("r", target)
    assert len(out_u) > 0  # the chain actually detected peaks
    _tables_equal(out_f, out_u)
    # every bundle member's output identical too
    for name in ("basic_features", "hit", "hit_threshold", "waveform_width"):
        f = ctx_f.get_data("r", name)
        u = ctx_u.get_data("r", name)
        assert len(u) > 0, name
        _tables_equal(f, u)


def test_fusion_actually_fuses(tmp_path):
    st = _st(n=256)
    ctx = _make_ctx(tmp_path, "fused", True)
    ctx.inject_data("r", "st_waveforms", st)
    ctx.get_data("r", "s1_s2")
    prof = ctx.profiler.timers if hasattr(ctx.profiler, "timers") else None
    summary = ctx.profiler.summary() if hasattr(ctx.profiler, "summary") else ""
    assert "fusion.wave_chain.compute" in str(summary)
    # the fused members did not run their standalone compute
    assert "plugin.hit.compute" not in str(summary)
    assert "plugin.basic_features.compute" not in str(summary)


def test_fusion_respects_save_when_and_cache(tmp_path):
    st = _st(n=256)
    ctx = _make_ctx(tmp_path, "fused", True)
    ctx.inject_data("r", "st_waveforms", st)
    ctx.get_data("r", "s1_s2")
    # hit_threshold is outside the s1_s2 dep tree; request it explicitly
    ctx.get_data("r", "hit_threshold")
    ctx.flush_saves()  # direct storage inspection below
    # all bundle members were saved (save_when=always) under their own keys
    for name in ("basic_features", "hit", "hit_threshold"):
        key = ctx.key_for("r", name)
        assert ctx.storage.exists(key, run_id="r"), name
    # a cloned context re-reads everything from cache (no recompute)
    ctx2 = ctx.clone()
    ctx2.inject_data("r", "st_waveforms", st)
    out2 = ctx2.get_data("r", "s1_s2")
    summary2 = ctx2.profiler.summary() if hasattr(ctx2.profiler, "summary") else ""
    assert "fusion.wave_chain.compute" not in str(summary2)
    _tables_equal(out2, ctx.get_data("r", "s1_s2"))


def test_fusion_skips_overridden_compute(tmp_path):
    class CustomHit(HitFinderPlugin):
        def compute(self, context, run_id, **kwargs):
            out = super().compute(context, run_id, **kwargs)
            return out

    st = _st(n=256)
    ctx = Context(storage_dir=str(tmp_path / "c"),
                  config={"show_progress": False})
    ctx.register(BasicFeaturesPlugin(), CustomHit(), ThresholdHitPlugin())
    ctx.inject_data("r", "st_waveforms", st)
    rule = WaveChainFusion()
    members = rule.plan(ctx, "r", {"basic_features", "hit", "hit_threshold"})
    assert members is not None
    assert "hit" not in members  # overridden compute is not fusable
    assert set(members) == {"basic_features", "hit_threshold"}


def test_fusion_single_member_not_fused(tmp_path):
    st = _st(n=128)
    ctx = Context(storage_dir=str(tmp_path / "s"),
                  config={"show_progress": False})
    ctx.register(BasicFeaturesPlugin())
    ctx.inject_data("r", "st_waveforms", st)
    rule = WaveChainFusion()
    assert rule.plan(ctx, "r", {"basic_features"}) is None
    out = ctx.get_data("r", "basic_features")
    assert len(out) == 128


def test_fusion_disabled_by_config(tmp_path):
    st = _st(n=128)
    ctx = _make_ctx(tmp_path, "off", False)
    ctx.inject_data("r", "st_waveforms", st)
    ctx.get_data("r", "hit_threshold")
    summary = ctx.profiler.summary() if hasattr(ctx.profiler, "summary") else ""
    assert "fusion" not in str(summary)
    assert "plugin.hit_threshold.compute" in str(summary)


@pytest.mark.multidevice
def test_mesh_attached_context_matches_single_device(tmp_path):
    import jax

    from waveformanalysis_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # n NOT a multiple of 8: exercises the pad/unpad path
    st = _st(n=300)
    ctx_single = _make_ctx(tmp_path, "single", True)
    ctx_mesh = _make_ctx(tmp_path, "mesh", True).attach_mesh(make_mesh(8))
    for ctx in (ctx_single, ctx_mesh):
        ctx.inject_data("r", "st_waveforms", st)
    out_s = ctx_single.get_data("r", "s1_s2")
    out_m = ctx_mesh.get_data("r", "s1_s2")
    assert len(out_s) > 0
    _tables_equal(out_s, out_m)
    for name in ("basic_features", "hit"):
        _tables_equal(
            ctx_single.get_data("r", name), ctx_mesh.get_data("r", name)
        )
    # lineage keys identical: the mesh is an execution strategy, not config
    assert ctx_single.key_for("r", "s1_s2") == ctx_mesh.key_for("r", "s1_s2")
    # clone keeps the mesh attachment
    assert ctx_mesh.clone().mesh is not None


def test_width_integral_joins_bundle(tmp_path):
    from waveformanalysis_tpu.plugins.builtin.waveform_width_integral import (
        WaveformWidthIntegralPlugin,
    )

    st = _st(n=256)
    ctx_f = Context(storage_dir=str(tmp_path / "wf"),
                    config={"show_progress": False, "fused_execution": True})
    ctx_u = Context(storage_dir=str(tmp_path / "wu"),
                    config={"show_progress": False, "fused_execution": False})
    for ctx in (ctx_f, ctx_u):
        ctx.register(BasicFeaturesPlugin(), ThresholdHitPlugin(),
                     WaveformWidthIntegralPlugin())
        ctx.inject_data("r", "st_waveforms", st)
    out_f = ctx_f.get_data(
        "r", ["basic_features", "hit_threshold", "waveform_width_integral"]
    )
    assert "fusion.wave_chain.compute" in str(ctx_f.profiler.summary())
    for name in out_f:
        u = ctx_u.get_data("r", name)
        assert len(u) > 0
        _tables_equal(out_f[name], u)


def test_multi_target_get_data_fuses(tmp_path):
    st = _st(n=256)
    ctx = _make_ctx(tmp_path, "multi", True)
    ctx.inject_data("r", "st_waveforms", st)
    out = ctx.get_data("r", ["hit", "basic_features", "hit_threshold"])
    assert set(out) == {"hit", "basic_features", "hit_threshold"}
    summary = str(ctx.profiler.summary())
    assert "fusion.wave_chain.compute" in summary
    assert "plugin.hit.compute" not in summary
    # results identical to single-target reads on a fresh context
    ctx2 = _make_ctx(tmp_path, "single2", False)
    ctx2.inject_data("r", "st_waveforms", st)
    for name in out:
        _tables_equal(out[name], ctx2.get_data("r", name))
    # second multi read: everything from memory, dict in request order
    again = ctx.get_data("r", ["basic_features", "hit"])
    assert list(again.keys()) == ["basic_features", "hit"]


def test_fusion_program_cache_reuse(tmp_path):
    rule = WaveChainFusion()
    st = _st(n=128)
    ctx = Context(storage_dir=str(tmp_path / "p"),
                  config={"show_progress": False,
                          "capacity_hints": False})
    ctx.register(BasicFeaturesPlugin(), ThresholdHitPlugin())
    ctx.inject_data("r", "st_waveforms", st)
    members = rule.plan(ctx, "r", {"basic_features", "hit_threshold"})
    r1 = rule.compute(ctx, "r", members)
    assert len(rule._programs) == 1
    r2 = rule.compute(ctx, "r", members)
    assert len(rule._programs) == 1  # same device program reused
    _tables_equal(r1["hit_threshold"], r2["hit_threshold"])


def test_fusion_capacity_hint_program_reuse(tmp_path):
    """With capacity hints ON (the default), call 1 compiles the configured-
    capacity program and records the observed per-event max; call 2 compiles
    a right-sized program; call 3 reuses call 2's program. All outputs
    bit-identical."""
    rule = WaveChainFusion()
    st = _st(n=128)
    ctx = Context(storage_dir=str(tmp_path / "p"),
                  config={"show_progress": False})
    ctx.register(BasicFeaturesPlugin(), ThresholdHitPlugin())
    ctx.inject_data("r", "st_waveforms", st)
    members = rule.plan(ctx, "r", {"basic_features", "hit_threshold"})
    r1 = rule.compute(ctx, "r", members)
    assert len(rule._programs) == 1
    r2 = rule.compute(ctx, "r", members)
    n_after_hint = len(rule._programs)
    assert n_after_hint in (1, 2)  # 2 iff the hint shrank the capacity
    r3 = rule.compute(ctx, "r", members)
    assert len(rule._programs) == n_after_hint  # hinted program reused
    _tables_equal(r1["hit_threshold"], r2["hit_threshold"])
    _tables_equal(r1["hit_threshold"], r3["hit_threshold"])


def test_fusion_capacity_hint_persists_across_contexts(tmp_path):
    """Hints live in cache metadata: a FRESH Context over the same storage
    (a new process, the serve server) sees the recorded max counts without
    recomputing at the configured capacity first."""
    rule = WaveChainFusion()
    st = _st(n=128)
    store = str(tmp_path / "p")

    ctx1 = Context(storage_dir=store, config={"show_progress": False})
    ctx1.register(BasicFeaturesPlugin(), ThresholdHitPlugin())
    ctx1.inject_data("r", "st_waveforms", st)
    members = rule.plan(ctx1, "r", {"basic_features", "hit_threshold"})
    r1 = rule.compute(ctx1, "r", members)
    ctx1.flush_saves()

    ctx2 = Context(storage_dir=store, config={"show_progress": False})
    ctx2.register(BasicFeaturesPlugin(), ThresholdHitPlugin())
    ctx2.inject_data("r", "st_waveforms", st)
    hint = rule._get_hint(ctx2, "r", "hit_threshold", len(st))
    assert hint is not None and hint >= 1  # loaded from disk metadata
    r2 = rule.compute(ctx2, "r", members)
    _tables_equal(r1["hit_threshold"], r2["hit_threshold"])
    _tables_equal(r1["basic_features"], r2["basic_features"])


def test_empty_input_through_fusion(tmp_path):
    st = _st(n=512)[0:0]  # zero-row structured array
    ctx = _make_ctx(tmp_path, "empty", True)
    ctx.inject_data("r", "st_waveforms", st)
    out = ctx.get_data("r", ["basic_features", "hit", "hit_threshold"])
    assert all(len(v) == 0 for v in out.values())


def test_empty_target_list(tmp_path):
    ctx = _make_ctx(tmp_path, "nil", True)
    assert ctx.get_data("r", []) == {}


def test_fusion_over_filtered_wave_source(tmp_path):
    """The bundle fuses over filtered_waveforms too (all members share the
    source): fused vs per-plugin outputs stay bit-identical on the f32
    filtered matrix."""
    from waveformanalysis_tpu.plugins.builtin.filtering import (
        FilteredWaveformsPlugin,
    )

    def mk(sub, fused):
        ctx = Context(storage_dir=str(tmp_path / sub),
                      config={"show_progress": False,
                              "fused_execution": fused})
        ctx.register(FilteredWaveformsPlugin(), BasicFeaturesPlugin(),
                     HitFinderPlugin(), ThresholdHitPlugin())
        ctx.set_config({
            "basic_features": {"wave_source": "filtered_waveforms"},
            "hit": {"wave_source": "filtered_waveforms",
                    "use_derivative": False, "height": 50.0,
                    "prominence": 20.0, "width": 2},
            "hit_threshold": {"wave_source": "filtered_waveforms"},
        })
        st = _st(n=128, seed=3)
        ctx.inject_data("r", "st_waveforms", st)
        return ctx

    targets = ["basic_features", "hit", "hit_threshold"]
    fused = mk("fused", True).get_data("r", targets)
    unfused = mk("unfused", False).get_data("r", targets)
    for name in targets:
        assert len(fused[name]) == len(unfused[name]), name
        _tables_equal(unfused[name], fused[name])


# --- round-3: full S1/S2 cone fusion -----------------------------------------

def _make_full_ctx(tmp_path, sub, fused):
    from waveformanalysis_tpu.plugins.builtin.hit_merge import (
        HitMergeClustersPlugin,
        HitMergedComponentsPlugin,
        HitMergePlugin,
    )
    from waveformanalysis_tpu.plugins.builtin.waveform_width_integral import (
        WaveformWidthIntegralPlugin,
    )

    ctx = _make_ctx(tmp_path, sub, fused)
    ctx.register(HitMergePlugin(), HitMergeClustersPlugin(),
                 HitMergedComponentsPlugin(), WaveformWidthIntegralPlugin())
    return ctx


FULL_CONE = (
    "basic_features", "hit", "hit_threshold", "waveform_width_integral",
    "waveform_width", "hit_merged", "hit_merge_clusters",
    "hit_merged_components", "s1_s2",
)


def test_full_cone_fused_equals_unfused(tmp_path):
    """Every member of the full records->features->S1/S2 cone is produced by
    ONE fused device program + in-bundle host finalizes, bit-identical to the
    per-plugin path (reference cone: s1_s2_classifier.py:73,
    waveform_width.py:40, hit_merge.py:325-445)."""
    st = _st(n=512)
    ctx_f = _make_full_ctx(tmp_path, "fused", True)
    ctx_u = _make_full_ctx(tmp_path, "unfused", False)
    for ctx in (ctx_f, ctx_u):
        ctx.inject_data("r", "st_waveforms", st)

    out_f = ctx_f.get_data("r", list(FULL_CONE))
    summary = str(ctx_f.profiler.summary())
    assert "fusion.wave_chain.compute" in summary
    # NO standalone compute ran for any cone member
    for name in FULL_CONE:
        assert f"plugin.{name}.compute" not in summary, name
    for name in FULL_CONE:
        u = ctx_u.get_data("r", name)
        assert len(u) > 0, name
        _tables_equal(out_f[name], u)


def test_s1_s2_single_target_fuses_whole_cone(tmp_path):
    """The driver metric path: ctx.get_data(run, "s1_s2") alone compiles the
    cone into one device program (waveform_width no longer round-trips)."""
    st = _st(n=256)
    ctx = _make_ctx(tmp_path, "one", True)
    ctx.inject_data("r", "st_waveforms", st)
    out = ctx.get_data("r", "s1_s2")
    assert len(out) > 0
    summary = str(ctx.profiler.summary())
    assert "fusion.wave_chain.compute" in summary
    for name in ("waveform_width", "s1_s2", "hit", "basic_features"):
        assert f"plugin.{name}.compute" not in summary, name


def test_width_fuses_with_cached_hit_support_stage(tmp_path):
    """hit cached from an earlier request: waveform_width still fuses by
    recomputing the hit stage on device (unemitted support stage) — outputs
    identical to the standalone join against the cached hit table."""
    st = _st(n=256)
    ctx = _make_ctx(tmp_path, "sup", True)
    ctx.inject_data("r", "st_waveforms", st)
    hit_first = ctx.get_data("r", "hit")
    assert len(hit_first) > 0
    ctx.flush_saves()

    ctx2 = ctx.clone()
    ctx2.inject_data("r", "st_waveforms", st)
    out = ctx2.get_data("r", "s1_s2")
    summary = str(ctx2.profiler.summary())
    assert "fusion.wave_chain.compute" in summary
    assert "plugin.waveform_width.compute" not in summary

    ctx_u = _make_ctx(tmp_path, "sup_u", False)
    ctx_u.inject_data("r", "st_waveforms", st)
    _tables_equal(out, ctx_u.get_data("r", "s1_s2"))
    _tables_equal(ctx2.get_data("r", "waveform_width"),
                  ctx_u.get_data("r", "waveform_width"))


def test_merge_family_fused_with_cached_threshold(tmp_path):
    """hit_threshold cached: the merge family still rides the bundle (one
    merge serves all three members) and matches standalone outputs."""
    st = _st(n=256)
    ctx = _make_full_ctx(tmp_path, "mf", True)
    ctx.inject_data("r", "st_waveforms", st)
    ctx.get_data("r", "hit_threshold")
    ctx.flush_saves()

    ctx2 = ctx.clone()
    ctx2.inject_data("r", "st_waveforms", st)
    out = ctx2.get_data(
        "r", ["hit_merged", "hit_merge_clusters", "hit_merged_components",
              "basic_features"]
    )
    ctx_u = _make_full_ctx(tmp_path, "mf_u", False)
    ctx_u.inject_data("r", "st_waveforms", st)
    for name in ("hit_merged", "hit_merge_clusters", "hit_merged_components"):
        u = ctx_u.get_data("r", name)
        assert len(u) > 0, name
        _tables_equal(out[name], u)


def test_full_cone_batched_dispatch_matches_loop(tmp_path):
    """get_data_batched over the full cone: batched-concatenated device
    program + per-run host finalizes == per-run loop results."""
    sts = {f"r{i}": _st(n=128 + 32 * i, seed=i) for i in range(3)}
    ctx_b = _make_full_ctx(tmp_path, "batched", True)
    ctx_l = _make_full_ctx(tmp_path, "loop", True)
    for rid, st in sts.items():
        ctx_b.inject_data(rid, "st_waveforms", st)
        ctx_l.inject_data(rid, "st_waveforms", st)

    out_b = ctx_b.get_data_batched(list(sts), ["s1_s2", "hit_merged"])
    for rid in sts:
        for name in ("s1_s2", "hit_merged"):
            _tables_equal(out_b[rid][name], ctx_l.get_data(rid, name))


@pytest.mark.multidevice
def test_full_cone_on_mesh_matches_single_device(tmp_path):
    import jax

    from waveformanalysis_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    st = _st(n=300)  # not a shard multiple: exercises pad/unpad
    ctx_s = _make_full_ctx(tmp_path, "m_single", True)
    ctx_m = _make_full_ctx(tmp_path, "m_mesh", True).attach_mesh(make_mesh(8))
    for ctx in (ctx_s, ctx_m):
        ctx.inject_data("r", "st_waveforms", st)
    for name in ("s1_s2", "waveform_width", "hit_merged"):
        _tables_equal(ctx_s.get_data("r", name), ctx_m.get_data("r", name))
