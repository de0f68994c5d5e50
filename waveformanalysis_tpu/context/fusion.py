"""Fused subgraph execution: lower several plugins into ONE device program.

The reference executes its plugin DAG strictly one plugin at a time, each
materializing its output before the next starts
(reference: waveform_analysis/core/context_execution.py:293-475). On TPU
that wastes the expensive resources: the padded wave matrix would be
re-uploaded and re-swept once per plugin, and every plugin pays its own
dispatch through the host->device link.

Here the Context behaves like a graph compiler: when the needed set of an
execution plan contains several wave-derived plugins that share the same
wave source, their ``device_stage`` programs are composed into a single
``jax.jit`` program. XLA then sees all of them at once — the f32 conversion
and polarity-normalized signal are computed once, every kernel reads the
wave matrix from the same HBM residency, and the host pays ONE upload + ONE
dispatch + ONE device_get for the whole bundle.

Correctness contract: fusion is a pure execution strategy. Each member
plugin's ``kernel_config`` / ``host_prep`` / ``device_stage`` / ``finalize``
phases are exactly the ones its standalone ``compute`` runs, so outputs are
bit-identical, lineage/cache keys are untouched, and save_when semantics
apply per plugin as usual (tests/test_fusion.py asserts equality).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

FUSED_CHAIN_MEMBERS = ("basic_features", "hit", "hit_threshold",
                       "waveform_width_integral")

# members whose device stage emits fixed-capacity (n, K) slot tables; the
# fused program compacts valid slots ON DEVICE so the tunnel fetch carries
# only real hits, not the K-slot padding (at 65536x8 slots the full tables
# are ~37 MB; the tunnel moves ~13 MB/s, so the padded fetch dominated the
# whole bundle wall time). Fields are packed in this order, rows first.
_SLOT_FIELDS = {
    "hit": ("position", "peak_heights", "left_ips", "right_ips"),
    "hit_threshold": (
        "position", "height", "integral", "seg_start", "seg_end",
        "run_start", "run_end",
    ),
}
# (count key, capacity cfg key) used for the device-side overflow counter
_SLOT_OVERFLOW = {
    "hit": ("n_candidates", "max_peaks"),
    "hit_threshold": ("n_runs", "max_hits"),
}

# device_stage-relevant config keys per member: the jit program is cached on
# these (host-only keys like channel_config affect inputs, not the program)
_DEVICE_CFG_KEYS = {
    "basic_features": ("height_range", "area_range"),
    "hit": (
        "use_derivative", "height", "distance", "prominence", "width",
        "height_method", "height_window_extension", "max_peaks", "backend",
    ),
    "hit_threshold": (
        "left_extension", "right_extension", "max_hits", "backend",
    ),
    "waveform_width_integral": ("q_low", "q_high"),
}


def _wave_input_array(waves):
    """Host waves -> C-contiguous ndarray; device waves pass through so the
    fused program consumes the HBM-resident matrix without a host round
    trip (device_unpack pipelines)."""
    from waveformanalysis_tpu.plugins.builtin._wave_source import (
        wave_matrix_view,
    )

    out = wave_matrix_view(waves)
    if isinstance(out, np.ndarray):
        out = np.ascontiguousarray(out)
    return out


class WaveChainFusion:
    """Fuses basic_features / hit / hit_threshold over a shared wave source."""

    name = "wave_chain"

    def __init__(self) -> None:
        self._programs: Dict[Tuple, Any] = {}

    # -- applicability -------------------------------------------------------

    def plan(
        self, ctx: Any, run_id: str, needed: set, min_members: int = 2
    ) -> Optional[List[str]]:
        """Member names this rule can produce in one dispatch, or None."""
        from waveformanalysis_tpu.plugins.builtin._wave_source import (
            resolve_wave_input_spec,
        )
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BasicFeaturesPlugin,
        )
        from waveformanalysis_tpu.plugins.builtin.hit_finder import (
            ThresholdHitPlugin,
        )
        from waveformanalysis_tpu.plugins.builtin.peak_finding import (
            HitFinderPlugin,
        )
        from waveformanalysis_tpu.plugins.builtin.waveform_width_integral import (
            WaveformWidthIntegralPlugin,
        )

        expected = {
            "basic_features": BasicFeaturesPlugin,
            "hit": HitFinderPlugin,
            "hit_threshold": ThresholdHitPlugin,
            "waveform_width_integral": WaveformWidthIntegralPlugin,
        }
        members = [m for m in FUSED_CHAIN_MEMBERS if m in needed]
        if len(members) < min_members:
            return None
        usable = []
        sources = set()
        for m in members:
            plugin = ctx._plugins.get(m)
            # only the builtin implementations are fusable: a subclass with
            # its own compute must run through the normal path
            if plugin is None or type(plugin).compute is not expected[m].compute:
                continue
            try:
                spec = resolve_wave_input_spec(ctx, plugin)
            except Exception:
                continue
            usable.append(m)
            sources.add(spec.expected_name)
        if len(usable) < min_members or len(sources) != 1:
            return None
        return usable

    def plan_batched(
        self, ctx: Any, run_id: str, needed: set
    ) -> Optional[List[str]]:
        """Batched-dispatch planning: a SINGLE member qualifies — batching
        runs on the event axis amortizes upload/dispatch/fetch latency even
        when only one wave-chain plugin is in the needed set."""
        return self.plan(ctx, run_id, needed, min_members=1)

    # -- execution -----------------------------------------------------------

    def compute(self, ctx: Any, run_id: str, members: List[str]) -> Dict[str, Any]:
        """Run the fused program; returns {data_name: finalized result}."""
        import jax
        import jax.numpy as jnp

        from waveformanalysis_tpu.dtypes.table import Table
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BASIC_FEATURES_SCHEMA,
        )
        from waveformanalysis_tpu.plugins.builtin.hit_finder import (
            THRESHOLD_HIT_SCHEMA,
        )
        from waveformanalysis_tpu.plugins.builtin.peak_finding import (
            HIT_SCHEMA,
            _load_wave_matrix,
        )

        plugins = {m: ctx._plugins[m] for m in members}
        cfgs = {m: plugins[m].kernel_config(ctx) for m in members}

        # one wave-input load for the whole bundle (keeps the native integer
        # dtype; every device stage casts on device)
        waves, lengths, meta = _load_wave_matrix(
            ctx, plugins[members[0]], run_id, keep_integer_waves=True
        )
        n = len(lengths)
        if n == 0:
            from waveformanalysis_tpu.plugins.builtin.waveform_width_integral import (
                WAVEFORM_WIDTH_INTEGRAL_SCHEMA,
            )

            empty = {
                "basic_features": lambda: Table.zeros(0, BASIC_FEATURES_SCHEMA),
                "hit": lambda: Table.zeros(0, HIT_SCHEMA),
                "hit_threshold": lambda: Table.zeros(0, THRESHOLD_HIT_SCHEMA),
                "waveform_width_integral": lambda: Table.zeros(
                    0, WAVEFORM_WIDTH_INTEGRAL_SCHEMA
                ),
            }
            return {m: empty[m]() for m in members}

        # host preps (config machinery producing device inputs)
        sign = np.where(meta["polarity"] > 0, 1.0, -1.0).astype(np.float32)
        thresholds = None
        if "hit_threshold" in members:
            thresholds = plugins["hit_threshold"].host_prep(
                cfgs["hit_threshold"], ctx, run_id, meta
            ).astype(np.float32)
        bf_baselines = None
        if "basic_features" in members:
            bf_baselines = plugins["basic_features"].host_prep(
                cfgs["basic_features"], ctx, run_id,
                np.asarray(meta["baseline"], dtype=np.float64),
                meta["board"], meta["channel"],
            )

        mesh_info = getattr(ctx, "mesh", None)
        program, spec_cache = self._get_program(
            tuple(members), cfgs, plugins, mesh_info
        )

        thresholds_np = (
            np.zeros((n,), np.float32) if thresholds is None else thresholds
        )
        inputs = (
            _wave_input_array(waves),
            lengths.astype(np.int32),
            sign,
            meta["baseline"].astype(np.float32),
            thresholds_np,
        )
        slot_out = None
        if mesh_info is not None:
            host_out = self._run_sharded(program, inputs, n, mesh_info)
        else:
            dev_in = tuple(jnp.asarray(x) for x in inputs)
            shapes_key = tuple(
                (tuple(x.shape), str(x.dtype)) for x in dev_in
            )
            flat_d, slot_mats_d, counts_d = program(*dev_in)
            host_out, slot_out = _fetch_packed_outputs(
                flat_d, slot_mats_d, counts_d, spec_cache[shapes_key]
            )

        results: Dict[str, Any] = {}
        for m in members:
            if m == "basic_features":
                pol = np.where(
                    meta["polarity"] == 0, np.int8(-1), meta["polarity"]
                ).astype(np.int8)
                results[m] = plugins[m].finalize(
                    cfgs[m], host_out[m], bf_baselines, pol,
                    meta["timestamp"], meta["board"], meta["channel"],
                )
            elif m == "hit":
                if slot_out is not None:
                    rows, slots = slot_out[m]
                    results[m] = plugins[m].finalize_compact(
                        cfgs[m], rows, slots,
                        int(host_out[m + "__overflow"]), meta, n,
                    )
                else:
                    results[m] = plugins[m].finalize(
                        cfgs[m], host_out[m], meta, n
                    )
            elif m == "hit_threshold":
                if slot_out is not None:
                    rows, slots = slot_out[m]
                    results[m] = plugins[m].finalize_compact(
                        cfgs[m], rows, slots,
                        int(host_out[m + "__overflow"]), meta, lengths, n,
                    )
                else:
                    results[m] = plugins[m].finalize(
                        cfgs[m], host_out[m], meta, lengths, n
                    )
            elif m == "waveform_width_integral":
                results[m] = plugins[m].finalize(
                    cfgs[m], host_out[m], meta, n
                )
        logger.debug(
            "fused %s over %d waveforms in one device program", members, n
        )
        return results

    # -- multi-run batched execution ----------------------------------------

    def compute_many(
        self, ctx: Any, run_members: List[Tuple[str, List[str]]]
    ) -> Dict[str, Dict[str, Any]]:
        """Run the fused bundle for SEVERAL runs in as few device programs
        as possible.

        The reference fans multiple runs out over host processes
        (reference: waveform_analysis/core/data/batch_processor.py:197); on
        TPU the idiomatic axis is the batch dimension: runs whose device
        configuration matches are CONCATENATED along the event axis and
        dispatched as ONE program, so R runs pay one dispatch + one packed
        fetch instead of R of each. Outputs are split at the run boundaries
        on host and finalized/saved per run — bit-identical to per-run
        execution (tests/test_batched_dispatch.py).

        The concatenated event count is padded up to a multiple of
        ``config["fused_batch_bucket"]`` (default 4096) with zero-length
        events so repeated batched calls reuse a small set of compiled
        programs. Zero-length padding is the same contract _run_sharded
        relies on: no samples -> no features, no peaks, no hits.
        """
        import jax
        import jax.numpy as jnp

        out: Dict[str, Dict[str, Any]] = {}

        # per-run prep under that run's prepared request (run_config may
        # differ per run, so group keys include the device-relevant cfg)
        groups: Dict[Tuple, List[dict]] = {}
        for run_id, members in run_members:
            ctx.config_domain.prepare_request(run_id)
            prep = self._prep_run(ctx, run_id, members)
            if prep is None:  # empty run: finalize immediately
                out[run_id] = self._empty_results(members)
                continue
            groups.setdefault(prep.pop("group_key"), []).append(prep)

        for key, preps in groups.items():
            # singleton groups also dispatch through the bucket-padded
            # program: the prep work is reused, and the padded shapes are
            # the SAME ones other batched calls compile, so a lone
            # odd-config run shares compiled programs instead of forcing
            # the standard-shape variant
            out.update(self._dispatch_group(ctx, preps))
        return out

    def _prep_run(self, ctx: Any, run_id: str, members: List[str]):
        """Load + host-prep one run's bundle inputs; None for empty runs."""
        from waveformanalysis_tpu.plugins.builtin.peak_finding import (
            _load_wave_matrix,
        )

        plugins = {m: ctx._plugins[m] for m in members}
        cfgs = {m: plugins[m].kernel_config(ctx) for m in members}
        waves, lengths, meta = _load_wave_matrix(
            ctx, plugins[members[0]], run_id, keep_integer_waves=True
        )
        n = len(lengths)
        if n == 0:
            return None

        sign = np.where(meta["polarity"] > 0, 1.0, -1.0).astype(np.float32)
        thresholds = np.zeros((n,), np.float32)
        if "hit_threshold" in members:
            thresholds = plugins["hit_threshold"].host_prep(
                cfgs["hit_threshold"], ctx, run_id, meta
            ).astype(np.float32)
        bf_baselines = None
        if "basic_features" in members:
            bf_baselines = plugins["basic_features"].host_prep(
                cfgs["basic_features"], ctx, run_id,
                np.asarray(meta["baseline"], dtype=np.float64),
                meta["board"], meta["channel"],
            )

        cfg_key = tuple(
            (m, tuple((k, cfgs[m][k]) for k in _DEVICE_CFG_KEYS[m]))
            for m in members
        )
        return {
            "run_id": run_id,
            "members": list(members),
            "plugins": plugins,
            "cfgs": cfgs,
            "waves": _wave_input_array(waves),
            "lengths": lengths.astype(np.int32),
            "sign": sign,
            "baseline_f32": meta["baseline"].astype(np.float32),
            "thresholds": thresholds,
            "bf_baselines": bf_baselines,
            "meta": meta,
            "n": n,
            "group_key": (tuple(members), cfg_key, str(waves.dtype)),
        }

    def _dispatch_group(
        self, ctx: Any, preps: List[dict]
    ) -> Dict[str, Dict[str, Any]]:
        """One concatenated device program for runs with matching config."""
        import jax
        import jax.numpy as jnp

        members = preps[0]["members"]
        cfgs = preps[0]["cfgs"]
        plugins = preps[0]["plugins"]

        L = max(p["waves"].shape[1] for p in preps)
        total = sum(p["n"] for p in preps)
        bucket = int(ctx.config.get("fused_batch_bucket", 4096))
        padded = ((total + bucket - 1) // bucket) * bucket if bucket > 1 \
            else total
        mesh_info = getattr(ctx, "mesh", None)
        if mesh_info is not None:
            # batched runs compose with event-axis sharding: align the
            # padded batch to the shard count so shard_map splits evenly
            n_shards = mesh_info[0].shape[mesh_info[1]]
            padded = ((padded + n_shards - 1) // n_shards) * n_shards

        wv0 = preps[0]["waves"]
        all_device = all(
            isinstance(p["waves"], jax.Array) for p in preps
        )
        lengths = np.zeros((padded,), np.int32)
        sign = np.ones((padded,), np.float32)
        baselines = np.zeros((padded,), np.float32)
        thresholds = np.zeros((padded,), np.float32)
        offsets = []
        off = 0
        for p in preps:
            n = p["n"]
            lengths[off:off + n] = p["lengths"]
            sign[off:off + n] = p["sign"]
            baselines[off:off + n] = p["baseline_f32"]
            thresholds[off:off + n] = p["thresholds"]
            offsets.append(off)
            off += n
        if all_device:
            # device-resident wave matrices (device_unpack pipelines)
            # concatenate IN HBM — fetching them back to build a host
            # buffer would pay the round trip the residency exists to
            # avoid
            parts = [
                jnp.pad(p["waves"],
                        ((0, 0), (0, L - p["waves"].shape[1])))
                if p["waves"].shape[1] < L else p["waves"]
                for p in preps
            ]
            if padded > total:
                parts.append(jnp.zeros((padded - total, L), wv0.dtype))
            waves = jnp.concatenate(parts, axis=0)
        else:
            waves = np.zeros((padded, L), dtype=np.asarray(wv0).dtype)
            for p, off_p in zip(preps, offsets):
                w = np.asarray(p["waves"])
                waves[off_p:off_p + p["n"], : w.shape[1]] = w

        inputs = (waves, lengths, sign, baselines, thresholds)
        if mesh_info is not None:
            # sharded batched program: raw (unpacked) outputs over the mesh,
            # same path the single-run mesh branch of compute() uses
            program, _spec = self._get_program(
                tuple(members), cfgs, plugins, mesh_info
            )
            host_out = self._run_sharded(program, inputs, padded, mesh_info)
            slot_out = None
        else:
            program, spec_cache = self._get_program(
                tuple(members), cfgs, plugins, None, per_event_overflow=True
            )
            dev_in = tuple(jnp.asarray(x) for x in inputs)
            shapes_key = tuple(
                (tuple(x.shape), str(x.dtype)) for x in dev_in
            )
            flat_d, slot_mats_d, counts_d = program(*dev_in)
            host_out, slot_out = _fetch_packed_outputs(
                flat_d, slot_mats_d, counts_d, spec_cache[shapes_key]
            )

        out: Dict[str, Dict[str, Any]] = {}
        for p, off in zip(preps, offsets):
            run_id, n, meta = p["run_id"], p["n"], p["meta"]
            cfgs_r, plugins_r = p["cfgs"], p["plugins"]
            results: Dict[str, Any] = {}
            for m in members:
                if m == "basic_features":
                    import jax as _jax

                    sub = _jax.tree_util.tree_map(
                        lambda a: a[off:off + n], host_out[m]
                    )
                    pol = np.where(
                        meta["polarity"] == 0, np.int8(-1), meta["polarity"]
                    ).astype(np.int8)
                    results[m] = plugins_r[m].finalize(
                        cfgs_r[m], sub, p["bf_baselines"], pol,
                        meta["timestamp"], meta["board"], meta["channel"],
                    )
                elif m in ("hit", "hit_threshold"):
                    if slot_out is None:
                        import jax as _jax

                        sub = _jax.tree_util.tree_map(
                            lambda a: a[off:off + n], host_out[m]
                        )
                        if m == "hit":
                            results[m] = plugins_r[m].finalize(
                                cfgs_r[m], sub, meta, n
                            )
                        else:
                            results[m] = plugins_r[m].finalize(
                                cfgs_r[m], sub, meta,
                                p["lengths"].astype(np.int64), n,
                            )
                        continue
                    rows, slots = slot_out[m]
                    lo = int(np.searchsorted(rows, off))
                    hi = int(np.searchsorted(rows, off + n))
                    rows_r = rows[lo:hi] - off
                    slots_r = {f: c[lo:hi] for f, c in slots.items()}
                    overflow_r = int(
                        host_out[m + "__overflow"][off:off + n].sum()
                    )
                    if m == "hit":
                        results[m] = plugins_r[m].finalize_compact(
                            cfgs_r[m], rows_r, slots_r, overflow_r, meta, n
                        )
                    else:
                        results[m] = plugins_r[m].finalize_compact(
                            cfgs_r[m], rows_r, slots_r, overflow_r, meta,
                            p["lengths"].astype(np.int64), n,
                        )
                elif m == "waveform_width_integral":
                    import jax as _jax

                    sub = _jax.tree_util.tree_map(
                        lambda a: a[off:off + n], host_out[m]
                    )
                    results[m] = plugins_r[m].finalize(
                        cfgs_r[m], sub, meta, n
                    )
            out[run_id] = results
        logger.debug(
            "batched fused %s over %d runs / %d waveforms (padded %d) in one "
            "device program", members, len(preps), total, padded,
        )
        return out

    @staticmethod
    def _empty_results(members: List[str]) -> Dict[str, Any]:
        from waveformanalysis_tpu.dtypes.table import Table
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BASIC_FEATURES_SCHEMA,
        )
        from waveformanalysis_tpu.plugins.builtin.hit_finder import (
            THRESHOLD_HIT_SCHEMA,
        )
        from waveformanalysis_tpu.plugins.builtin.peak_finding import HIT_SCHEMA
        from waveformanalysis_tpu.plugins.builtin.waveform_width_integral import (
            WAVEFORM_WIDTH_INTEGRAL_SCHEMA,
        )

        schemas = {
            "basic_features": BASIC_FEATURES_SCHEMA,
            "hit": HIT_SCHEMA,
            "hit_threshold": THRESHOLD_HIT_SCHEMA,
            "waveform_width_integral": WAVEFORM_WIDTH_INTEGRAL_SCHEMA,
        }
        return {m: Table.zeros(0, schemas[m]) for m in members}

    @staticmethod
    def _run_sharded(program, inputs, n: int, mesh_info) -> Dict[str, Any]:
        """Pad the event axis to the shard multiple, run, unpad outputs.

        Pad rows carry event_length 0 (no samples -> no features, no peaks,
        no hits) and are sliced off before finalize.
        """
        import jax
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, axis = mesh_info
        n_shards = mesh.shape[axis]
        padded_n = ((n + n_shards - 1) // n_shards) * n_shards
        pad = padded_n - n
        if pad:
            inputs = tuple(
                np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
                for x in inputs
            )
        put = [
            jax.device_put(
                x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
            )
            for x in inputs
        ]
        out = jax.device_get(program(*put))
        if pad:
            out = jax.tree_util.tree_map(lambda a: a[:n], out)
        return out

    def _get_program(
        self, members: Tuple[str, ...], cfgs: Dict, plugins: Dict,
        mesh_info=None, per_event_overflow: bool = False,
    ):
        """jit program cached on (members, device-relevant config values).

        ``per_event_overflow`` emits each slot member's overflow indicator as
        a per-event (n,) vector instead of a scalar sum — the batched
        multi-run dispatcher needs per-run overflow counts, which the host
        recovers by summing run slices.
        """
        import jax

        key_parts: List[Any] = [members]
        for m in members:
            key_parts.append(
                tuple((k, cfgs[m][k]) for k in _DEVICE_CFG_KEYS[m])
            )
        if mesh_info is not None:
            mesh, axis = mesh_info
            key_parts.append(("mesh", id(mesh), axis))
        if per_event_overflow:
            key_parts.append("per_event_overflow")
        key = tuple(key_parts)
        prog = self._programs.get(key)
        if prog is not None:
            return prog

        stages = {m: type(plugins[m]).device_stage for m in members}
        member_cfgs = {m: dict(cfgs[m]) for m in members}

        def program(waves_d, lengths_d, sign_d, baselines_d, thresholds_d):
            out = {}
            for m in members:
                if m == "basic_features":
                    out[m] = stages[m](member_cfgs[m], waves_d, lengths_d)
                elif m == "hit":
                    out[m] = stages[m](
                        member_cfgs[m], waves_d, lengths_d, sign_d, baselines_d
                    )
                elif m == "hit_threshold":
                    out[m] = stages[m](
                        member_cfgs[m], waves_d, lengths_d, sign_d,
                        baselines_d, thresholds_d,
                    )
                elif m == "waveform_width_integral":
                    out[m] = stages[m](
                        member_cfgs[m], waves_d, lengths_d, sign_d,
                        baselines_d,
                    )
            return out

        if mesh_info is not None:
            # event-axis data parallelism: one shard_map over the whole
            # bundle, every stage's outputs sharded on their leading dim.
            # (No transfer-packing here: the flat concat would break the
            # even per-leaf sharding.)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            mesh, axis = mesh_info
            program = shard_map(
                program,
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )
            entry = (jax.jit(program), None)
            self._programs[key] = entry
            return entry

        # minimal-transfer packing: the jitted program returns
        #   (dense_flat_i32, per-member compacted slot matrices, counts)
        # Dense (always-(n,)-shaped) leaves concatenate into ONE flat int32
        # array; slot-table members are compacted on device (valid slots
        # front-packed in row-major order) so the host can fetch only the
        # first ``count`` rows of each matrix. The per-shape unpack spec is
        # recorded at trace time.
        spec_cache: Dict[Tuple, Any] = {}

        def packed_program(*args):
            import jax.numpy as jnp

            shapes_key = tuple((tuple(a.shape), str(a.dtype)) for a in args)
            out = program(*args)
            dense_out = {}
            slot_mats = []
            counts = []
            slot_specs = []
            for m in members:
                if m not in _SLOT_FIELDS:
                    dense_out[m] = out[m]
                    continue
                stage = out[m]
                fields = _SLOT_FIELDS[m]
                count_key, cap_key = _SLOT_OVERFLOW[m]
                mat, count = _compact_slots(stage, fields)
                slot_mats.append(mat)
                counts.append(count)
                slot_specs.append(
                    (m, fields,
                     tuple(str(stage[f].dtype) for f in fields))
                )
                over = (
                    stage[count_key] > member_cfgs[m][cap_key]
                ).astype(jnp.int32)
                dense_out[m + "__overflow"] = (
                    over if per_event_overflow else jnp.sum(over)
                )
            flat, spec = _pack_leaves(dense_out)
            spec_cache[shapes_key] = (spec, slot_specs)
            return flat, tuple(slot_mats), jnp.stack(counts) if counts \
                else jnp.zeros((0,), jnp.int32)

        entry = (jax.jit(packed_program), spec_cache)
        self._programs[key] = entry
        return entry


# ---------------------------------------------------------------------------
# single-transfer packing: over the TPU tunnel every device->host fetch
# costs ~32 ms of latency regardless of size, and a fused bundle has a
# dozen-plus output leaves. Bitcast/cast every leaf to int32, flatten and
# concatenate ON DEVICE, fetch once, split + cast back on host.
# ---------------------------------------------------------------------------

from waveformanalysis_tpu.ops.compact import (  # noqa: E402
    compact_slots as _compact_slots,
    decode_slot_matrix as _decode_slot_matrix,
)


def _fetch_packed_outputs(flat_d, slot_mats_d, counts_d, spec_entry):
    """Two-phase host fetch of a packed fused-bundle result.

    Phase 1 fetches the tiny per-member valid counts (blocks until the
    device program finishes); phase 2 slices each compacted slot matrix to
    its count ON DEVICE, concatenates with the dense flat array, and fetches
    everything in one transfer — the tunnel then moves only real data.

    Returns (dense_tree, {member: (rows, slots_dict)}).
    """
    import jax
    import jax.numpy as jnp

    dense_spec, slot_specs = spec_entry
    counts = np.asarray(counts_d).astype(np.int64)
    parts = [flat_d.reshape(-1)]
    for mat, c in zip(slot_mats_d, counts):
        parts.append(jax.lax.slice_in_dim(mat, 0, int(c), axis=0).reshape(-1))
    all_flat = np.asarray(jnp.concatenate(parts)) if len(parts) > 1 \
        else np.asarray(parts[0])

    dense_len = sum(
        (int(np.prod(shape)) if shape else 1) for shape, _ in dense_spec[1]
    )
    dense_tree = _unpack_host(all_flat[:dense_len], dense_spec)

    slot_out = {}
    off = dense_len
    for (m, fields, dtypes), c in zip(slot_specs, counts):
        c = int(c)
        width = len(fields) + 1
        chunk = all_flat[off:off + c * width].reshape(c, width)
        off += c * width
        slot_out[m] = _decode_slot_matrix(chunk, fields, dtypes)
    return dense_tree, slot_out


def _pack_leaves(tree):
    """Device-side: one flat int32 array from every leaf (inside jit)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    metas = []
    parts = []
    for leaf in leaves:
        dt = leaf.dtype
        if dt.itemsize > 4:
            raise TypeError(
                f"packed transfer cannot carry 64-bit leaf dtype {dt}; "
                "widen the packing or keep this stage output off-bundle"
            )
        metas.append((tuple(leaf.shape), str(dt)))
        if dt == jnp.float32:
            p = jax.lax.bitcast_convert_type(leaf, jnp.int32)
        else:
            p = leaf.astype(jnp.int32)
        parts.append(p.reshape(-1))
    flat = jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.int32)
    return flat, (treedef, metas)


def _unpack_host(flat_host: np.ndarray, spec):
    treedef, metas = spec
    out = []
    off = 0
    for shape, dtype_str in metas:
        size = int(np.prod(shape)) if shape else 1
        chunk = flat_host[off:off + size]
        off += size
        if dtype_str == "float32":
            arr = chunk.view(np.float32)
        else:
            arr = chunk.astype(np.dtype(dtype_str))
        out.append(arr.reshape(shape))
    import jax

    return jax.tree_util.tree_unflatten(treedef, out)


def _packable(tree) -> bool:
    import jax
    import jax.numpy as jnp

    ok = (jnp.float32, jnp.int32, jnp.int16, jnp.int8, jnp.uint8, jnp.bool_)
    return all(
        leaf.dtype in ok for leaf in jax.tree_util.tree_leaves(tree)
    )


_DEFAULT_RULES: Optional[List[Any]] = None


def get_fusion_rules() -> List[Any]:
    global _DEFAULT_RULES
    if _DEFAULT_RULES is None:
        _DEFAULT_RULES = [WaveChainFusion()]
    return _DEFAULT_RULES
