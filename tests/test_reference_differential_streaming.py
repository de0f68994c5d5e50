"""Chunk-level streaming differential: our chunk engine vs the reference's.

The base streaming differential (test_reference_differential.py
TestStreamingDifferential) compares only the MERGED hit-row sets. This file
compares the streams CHUNK-FOR-CHUNK against the live reference engine
(reference: waveform_analysis/core/plugins/core/streaming.py:592-738 chunk
production, :913-1229 StreamingContext static wrapping + time_range clip):

- chunk counts, per-chunk boundaries and per-chunk output rows for the
  native streaming plugin (signal_peaks_stream);
- break segmentation (break_threshold_ps below the row spacing must split
  every gap identically);
- the static-plugin get_stream wrapping (basic_features on both sides);
- a time_range-restricted stream;
- halo extension on the static wrap.

Boundary conventions measured on the live reference and ledgered in
docs/PARITY.md (divergences 10-12):

(a) HALF-OPEN ENDS: our Chunk.end = max(endtime)+1 (half-open, so a row
    AT the boundary belongs to exactly one chunk); the reference's end =
    max(endtime) (closed). Mapping: ours == ref + 1 whenever the chunk has
    rows (empty clipped chunks keep the window edge on both sides).
(b) STATIC-WRAP BOUNDARY ROW LOSS (reference artifact): the reference's
    TempWrapper re-selects each 16-row slice by OVERLAP with the closed
    window [min ts, max endtime], which drops zero-duration rows whose
    time == end or endtime == start (streaming.py:620-646 + chunk.py
    select_time_range). Rows vanish from the stream entirely (42 of 48
    survive in the probe run). Our wrap slices rows positionally and
    loses nothing.
(c) HALO UNITS AND CLIP: the reference applies required_halo_ns RAW in
    time-field units (ps) (streaming.py:318-324 feeding :633 without unit
    conversion) and emits halo rows duplicated into neighboring chunks;
    ours converts ns->ps honestly and clips emitted chunks back to the
    main window (halo rows are compute context, never duplicated output).
    And setting any required_halo_ns on the reference's native stream
    plugin empties the stream entirely (its clip assumes extended bounds
    its own chunker never produced) - pinned here as an artifact.
"""

import sys

import numpy as np
import pytest

import test_reference_differential as base  # noqa: E402

pytestmark = pytest.mark.slow

CHUNK = 16
N_ROWS = 48  # single channel, rows spaced 10 us (10_000_000 ps)
PEAK_CFG = {"height": 50.0, "prominence": 10.0, "width": 1}
HIT_SORT = ("timestamp", "channel", "position")


@pytest.fixture(scope="module", autouse=True)
def _fresh_jax_caches():
    import jax

    jax.clear_caches()
    yield
    jax.clear_caches()


@pytest.fixture(scope="module")
def stream_pair(tmp_path_factory):
    """(make_ref, our_ctx) over the same single-channel VX2730 run, both
    with the streaming peaks plugin registered. Single-channel so the
    reference's per-channel chunker and our time-ordered chunker enumerate
    the same row order.

    ``make_ref`` builds a FRESH reference Context per call: the reference
    memoizes stream results in-process, so a second stream get_data on the
    same Context returns the exhausted generator (PARITY.md #13)."""
    base._import_reference()
    tmp = tmp_path_factory.mktemp("diff_chunks")
    from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run

    make_synthetic_vx2730_run(
        str(tmp / "DAQ"), "run_c", n_channels=1, n_rows=N_ROWS,
        n_samples=96, noise=5, seed=13,
    )
    cfg = {"signal_peaks_stream": dict(PEAK_CFG)}

    from waveform_analysis.core.plugins.builtin.streaming.cpu.signal_peaks \
        import SignalPeaksStreamPlugin as RefStream

    import itertools

    counter = itertools.count()

    def make_ref():
        rctx = base._build_ref_context(
            tmp / f"sr{next(counter)}", tmp / "DAQ", "vx2730", cfg
        )
        rctx.register(RefStream())
        return rctx

    from waveformanalysis_tpu.plugins.builtin.signal_peaks import (
        SignalPeaksStreamPlugin as OurStream,
    )

    octx = base._build_our_context(tmp / "so", tmp / "DAQ", "vx2730", cfg)
    octx.register(OurStream())
    return make_ref, octx


def _ref_stream(rctx, run_id, name, sconf, time_range=None):
    from waveform_analysis.core.plugins.core.streaming import (
        StreamingContext as RefSC,
    )

    sc = RefSC(rctx, run_id, streaming_config=dict(sconf))
    return list(sc.get_stream(name, time_range=time_range))


def _our_stream(octx, run_id, name, time_range=None, **overrides):
    from waveformanalysis_tpu.plugins.streaming import (
        StreamingContext as OurSC,
    )

    return list(OurSC(octx).get_stream(run_id, name, time_range=time_range,
                                       **overrides))


def _rows(chunk):
    data = chunk.data
    if hasattr(data, "to_numpy") and not isinstance(data, np.ndarray):
        data = data.to_numpy()
    return np.asarray(data)


def _assert_hit_rows_equal(rc, oc, tag):
    r, o = _rows(rc), _rows(oc)
    assert len(r) == len(o), f"{tag}: {len(r)} vs {len(o)} rows"
    if len(r) == 0:
        return
    ri = np.lexsort(tuple(r[k] for k in reversed(HIT_SORT)))
    oi = np.lexsort(tuple(o[k] for k in reversed(HIT_SORT)))
    r, o = r[ri], o[oi]
    for f in r.dtype.names:
        if f in base.ID_FIELDS or f not in o.dtype.names:
            continue
        base._assert_field_equal("hit", f, r[f], o[f])


def _assert_boundaries(rc, oc, tag):
    """Divergence (a): same start; our end = ref end + 1 on non-empty
    chunks."""
    assert rc.start == oc.start, f"{tag}: start {rc.start} vs {oc.start}"
    if len(_rows(rc)) and len(_rows(oc)):
        assert oc.end == rc.end + 1, f"{tag}: end {rc.end} vs {oc.end}"


class TestStreamPluginChunks:
    def test_chunk_for_chunk(self, stream_pair):
        """signal_peaks_stream: same chunk count, boundaries (mod the
        half-open +1), main_start, and per-chunk output hit rows."""
        make_ref, octx = stream_pair
        ref = list(make_ref().get_data(
            "run_c", "signal_peaks_stream",
            streaming_config={"chunk_size": CHUNK, "parallel": False},
        ))
        ours = _our_stream(octx, "run_c", "signal_peaks_stream",
                           chunk_size=CHUNK)
        assert len(ref) == len(ours) == -(-N_ROWS // CHUNK)
        for i, (rc, oc) in enumerate(zip(ref, ours)):
            _assert_boundaries(rc, oc, f"chunk[{i}]")
            rm, om = rc.metadata or {}, oc.metadata or {}
            assert rm.get("main_start") == om.get("main_start"), i
            _assert_hit_rows_equal(rc, oc, f"chunk[{i}]")

    def test_break_segmentation_parity(self, stream_pair):
        """break_threshold_ps=5us under 10us row spacing: every gap is a
        break on BOTH sides - one single-row segment per input row, same
        segment ids, same starts."""
        make_ref, octx = stream_pair
        brk = 5_000_000  # ps
        ref = list(make_ref().get_data(
            "run_c", "signal_peaks_stream",
            streaming_config={"chunk_size": CHUNK, "parallel": False,
                              "break_threshold_ps": brk},
        ))
        ours = _our_stream(octx, "run_c", "signal_peaks_stream",
                           chunk_size=CHUNK, break_threshold_ps=brk)
        assert len(ref) == len(ours) == N_ROWS
        for i, (rc, oc) in enumerate(zip(ref, ours)):
            _assert_boundaries(rc, oc, f"brk[{i}]")
            assert (rc.metadata or {}).get("segment_id") == \
                (oc.metadata or {}).get("segment_id") == i
            _assert_hit_rows_equal(rc, oc, f"brk[{i}]")


class TestStaticWrapChunks:
    """The reference's StreamingContext static-plugin wrapping
    (streaming.py:977-1067 TempWrapper) vs our _StaticWrapper path."""

    def test_basic_features_chunks(self, stream_pair):
        make_ref, octx = stream_pair
        rctx = make_ref()
        ref = _ref_stream(rctx, "run_c", "basic_features",
                          {"chunk_size": CHUNK, "parallel": False})
        ours = _our_stream(octx, "run_c", "basic_features", chunk_size=CHUNK)
        assert len(ref) == len(ours) == -(-N_ROWS // CHUNK)

        # our wrap is lossless: every source row appears exactly once
        our_total = sum(len(_rows(c)) for c in ours)
        assert our_total == N_ROWS
        our_ts = np.concatenate([_rows(c)["timestamp"] for c in ours])
        assert len(np.unique(our_ts)) == N_ROWS

        # divergence (b): the reference drops zero-duration boundary rows
        # (time == closed end, or endtime == start) from each slice; the
        # surviving reference rows must be a subset of ours, per chunk,
        # and the dropped rows must be exactly the boundary rows.
        for i, (rc, oc) in enumerate(zip(ref, ours)):
            r, o = _rows(rc), _rows(oc)
            assert rc.start >= oc.start, i
            r_ts = set(r["timestamp"].tolist())
            o_ts = set(o["timestamp"].tolist())
            assert r_ts <= o_ts, f"wrap[{i}]: ref rows not a subset"
            dropped = o_ts - r_ts
            for ts in dropped:
                assert ts in (rc.start, rc.end, oc.start, oc.end - 1), (
                    f"wrap[{i}]: non-boundary row {ts} dropped by the "
                    f"reference wrap"
                )
            # shared rows carry identical feature values
            keep = np.isin(o["timestamp"], r["timestamp"])
            o_shared = o[keep]
            ri = np.argsort(r["timestamp"], kind="stable")
            oi = np.argsort(o_shared["timestamp"], kind="stable")
            r, o_shared = r[ri], o_shared[oi]
            for f in r.dtype.names:
                if f in base.ID_FIELDS or f not in o_shared.dtype.names:
                    continue
                base._assert_field_equal("basic_features", f, r[f],
                                         o_shared[f])

    def test_time_range_restricted(self, stream_pair):
        """time_range clips both streams to the same row set (modulo the
        reference's boundary-row drops); our chunks hold exactly the main
        rows inside [lo, hi)."""
        make_ref, octx = stream_pair
        rctx = make_ref()
        st = octx.get_data("run_c", "st_waveforms")
        ts = np.sort(np.asarray(st["timestamp"]))
        lo, hi = int(ts[9]) - 1_000_000, int(ts[33]) + 1_000_000

        ref = _ref_stream(rctx, "run_c", "basic_features",
                          {"chunk_size": CHUNK, "parallel": False},
                          time_range=(lo, hi))
        ours = _our_stream(octx, "run_c", "basic_features",
                           chunk_size=CHUNK, time_range=(lo, hi))
        assert len(ref) == len(ours) > 0

        want = set(t for t in ts.tolist() if lo <= t < hi)
        our_ts = [t for c in ours for t in _rows(c)["timestamp"].tolist()]
        assert set(our_ts) == want and len(our_ts) == len(want)
        ref_ts = set(t for c in ref for t in _rows(c)["timestamp"].tolist())
        assert ref_ts <= want, "reference kept rows outside the window"
        # both sides clip chunk windows into [lo, hi]
        for c in ref + ours:
            assert c.start >= lo and c.end <= hi + 1

    def test_halo_static_wrap(self, stream_pair):
        """Divergence (c): same effective halo (ref 15_000_000 raw ps ==
        ours 15_000 ns). The reference duplicates halo rows into
        neighboring chunks; ours keeps chunks disjoint (halo is compute
        context only). The reference's MAIN slices equal our chunk rows."""
        make_ref, octx = stream_pair
        rctx = make_ref()
        ref = _ref_stream(
            rctx, "run_c", "basic_features",
            {"chunk_size": CHUNK, "parallel": False,
             "required_halo_ns": 15_000_000},
        )
        ours = _our_stream(octx, "run_c", "basic_features",
                           chunk_size=CHUNK,
                           required_halo_left_ns=15_000,
                           required_halo_right_ns=15_000)
        assert len(ref) == len(ours) == -(-N_ROWS // CHUNK)
        # ours: disjoint and lossless under halo
        our_ts = np.concatenate([_rows(c)["timestamp"] for c in ours])
        assert len(our_ts) == N_ROWS == len(np.unique(our_ts))
        # ref: interior chunks carry duplicated halo rows; each chunk's
        # MAIN window [main_start, main_end] selects exactly our rows
        total_ref = sum(len(_rows(c)) for c in ref)
        assert total_ref > N_ROWS - 2 * len(ref), \
            "reference halo chunks unexpectedly small"
        for i, (rc, oc) in enumerate(zip(ref, ours)):
            r, o = _rows(rc), _rows(oc)
            ms = (rc.metadata or {}).get("main_start")
            me = (rc.metadata or {}).get("main_end")
            main = r[(r["timestamp"] >= ms) & (r["timestamp"] <= me)]
            r_ts = np.sort(main["timestamp"])
            o_ts = np.sort(o["timestamp"])
            # the reference's overlap re-selection may still drop the
            # zero-duration closed-end row from its MAIN span (divergence b)
            missing = np.setdiff1d(o_ts, r_ts)
            assert np.isin(missing, [ms, me]).all(), (
                f"halo[{i}]: reference main rows diverge beyond the "
                f"boundary-drop artifact: {missing}"
            )

    def test_halo_inert_on_reference_stream_plugin(self, stream_pair):
        """Pinned reference quirk (PARITY.md #12.iii): required_halo_ns on
        its native stream plugin is INERT — its custom chunker never reads
        the halo knobs, so the chunks equal the no-halo stream. Our halo'd
        stream extends the compute window but clips output to main, so its
        emitted rows ALSO equal the no-halo stream. If the reference side
        starts failing, it gained real stream halo — revisit PARITY.md."""
        make_ref, octx = stream_pair
        ref_halo = list(make_ref().get_data(
            "run_c", "signal_peaks_stream",
            streaming_config={"chunk_size": CHUNK, "parallel": False,
                              "required_halo_ns": 15_000_000},
        ))
        ref_plain = list(make_ref().get_data(
            "run_c", "signal_peaks_stream",
            streaming_config={"chunk_size": CHUNK, "parallel": False},
        ))
        assert [(c.start, c.end, len(c.data)) for c in ref_halo] == \
            [(c.start, c.end, len(c.data)) for c in ref_plain], \
            "reference stream halo is no longer inert"

        ours_halo = _our_stream(octx, "run_c", "signal_peaks_stream",
                                chunk_size=CHUNK,
                                required_halo_left_ns=15_000,
                                required_halo_right_ns=15_000)
        ours_plain = _our_stream(octx, "run_c", "signal_peaks_stream",
                                 chunk_size=CHUNK)
        assert len(ours_halo) == len(ours_plain) == -(-N_ROWS // CHUNK)
        for i, (hc, pc) in enumerate(zip(ours_halo, ours_plain)):
            _assert_hit_rows_equal(hc, pc, f"our_halo[{i}]")

    def test_reference_stream_requery_artifact(self, stream_pair):
        """Pinned reference artifact (PARITY.md #13): a SECOND stream
        get_data on the same reference Context returns the exhausted
        generator (zero chunks) even with a different streaming_config.
        Our Context re-streams fresh chunks on every call."""
        make_ref, octx = stream_pair
        rctx = make_ref()
        sconf = {"chunk_size": CHUNK, "parallel": False}
        first = list(rctx.get_data("run_c", "signal_peaks_stream",
                                   streaming_config=dict(sconf)))
        second = list(rctx.get_data("run_c", "signal_peaks_stream",
                                    streaming_config={"chunk_size": 8,
                                                      "parallel": False}))
        assert len(first) == -(-N_ROWS // CHUNK)
        assert len(second) == 0, \
            "reference now re-streams on repeat get_data — revisit #13"
        a = _our_stream(octx, "run_c", "signal_peaks_stream",
                        chunk_size=CHUNK)
        b = _our_stream(octx, "run_c", "signal_peaks_stream", chunk_size=8)
        assert len(a) == -(-N_ROWS // CHUNK)
        assert len(b) == -(-N_ROWS // 8)
        assert sum(len(_rows(c)) for c in a) == \
            sum(len(_rows(c)) for c in b) > 0
