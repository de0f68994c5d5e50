"""On-device V1725 bit-unpacking: parity with the host walker.

The device path (ops/v1725_device.py) does a header-only host walk and a
jitted uint32 gather/bit-slice for the samples; every column — including
the unpacked waves — must be bit-identical to the host walker's Table
(formats/v1725.py), across sign extension, truncation flags, multi-file
concatenation, and wave_length clipping.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.ops.v1725_device import (
    read_files_device,
    scan_headers,
    unpack_samples_device,
)
from waveformanalysis_tpu.plugins.builtin.waveforms import (
    RawFileNamesPlugin,
    WaveformsPlugin,
)
from tests.utils import make_v1725_event, write_v1725_run


def _mk_ctx(tmp_path, device: bool):
    ctx = Context(
        storage_dir=str(tmp_path / ("dev" if device else "host")),
        config={"show_progress": False, "data_root": str(tmp_path / "daq"),
                "daq_adapter": "v1725"},
    )
    ctx.register(RawFileNamesPlugin(), WaveformsPlugin())
    ctx.set_config({"raw_files": {"daq_adapter": "v1725"},
                    "st_waveforms": {"daq_adapter": "v1725",
                                     "device_unpack": device}})
    return ctx


def test_unpack_matches_frombuffer():
    rng = np.random.default_rng(3)
    waves = [rng.integers(-32768, 32767, size=2 * rng.integers(4, 20),
                          dtype=np.int16) for _ in range(7)]
    blob = b"".join(
        make_v1725_event({0: w}, timestamps={0: 10 * i}) for i, w in
        enumerate(waves)
    )
    meta = scan_headers(blob, board=2)
    assert len(meta["offset"]) == 7
    L = int(meta["n_samples"].max())
    got = np.asarray(unpack_samples_device(
        np.frombuffer(blob, np.uint8), meta["offset"], meta["n_samples"], L
    ))
    for i, w in enumerate(waves):
        np.testing.assert_array_equal(got[i, : len(w)], w)
        assert np.all(got[i, len(w):] == 0)


def test_odd_offsets_and_negative_samples():
    """Different-length records shift later sample starts across both
    uint32 half-words; sign extension must hold for extreme values."""
    w0 = np.array([-32768, 32767, -1, 1, 0, -12345], dtype=np.int16)
    w1 = np.array([100, -100, 32767, -32768], dtype=np.int16)
    blob = make_v1725_event({0: w0}) + make_v1725_event({1: w1})
    meta = scan_headers(blob, board=0)
    got = np.asarray(unpack_samples_device(
        np.frombuffer(blob, np.uint8), meta["offset"], meta["n_samples"], 6
    ))
    np.testing.assert_array_equal(got[0], w0)
    np.testing.assert_array_equal(got[1, :4], w1)


def test_scan_headers_matches_walker_metadata(tmp_path):
    write_v1725_run(tmp_path / "daq", run_name="r", n_events=5)
    path = next((tmp_path / "daq" / "r" / "RAW").iterdir())
    meta = scan_headers(path.read_bytes(), board=0)
    assert len(meta["offset"]) == 10  # 5 events x 2 channels
    assert sorted(set(meta["channel"].tolist())) == [0, 1]
    np.testing.assert_array_equal(meta["baseline"][meta["channel"] == 0], 900)


def test_native_header_scan_matches_python(tmp_path):
    from waveformanalysis_tpu.native import scan_v1725_headers_bytes
    from waveformanalysis_tpu.ops.v1725_device import _scan_headers_py

    rng = np.random.default_rng(5)
    blob = b"".join(
        make_v1725_event(
            {int(c): rng.integers(-999, 999, 2 * rng.integers(3, 30),
                                  dtype=np.int16)
             for c in rng.choice(16, size=rng.integers(1, 4), replace=False)},
            timestamps={c: int(rng.integers(0, 2**47)) for c in range(16)},
            baselines={c: int(rng.integers(0, 65535)) for c in range(16)},
        )
        for _ in range(40)
    ) + b"\x01\x02"  # malformed tail exercises the stop behavior
    native = scan_v1725_headers_bytes(blob)
    if native is None:
        pytest.skip("native library unavailable")
    py = _scan_headers_py(blob, board=4, base_offset=100)
    assert len(native["offset"]) == len(py["offset"])
    for k in ("channel", "timestamp", "baseline", "n_samples"):
        np.testing.assert_array_equal(native[k], py[k], err_msg=k)
    np.testing.assert_array_equal(native["offset"] + 100, py["offset"])
    np.testing.assert_array_equal(native["trunc"].astype(bool), py["trunc"])


def test_plugin_parity_device_vs_host(tmp_path):
    write_v1725_run(tmp_path / "daq", run_name="r", n_events=6, n_samples=40)
    host = _mk_ctx(tmp_path, device=False).get_data("r", "st_waveforms")
    dev = _mk_ctx(tmp_path, device=True).get_data("r", "st_waveforms")
    assert len(host) == len(dev) == 12
    for col in host.columns:
        np.testing.assert_array_equal(
            np.asarray(host[col]), np.asarray(dev[col]), err_msg=col
        )


def test_plugin_parity_multi_file(tmp_path):
    daq = tmp_path / "daq"
    raw = daq / "r" / "RAW"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(9)
    for seg in range(3):
        blob = b"".join(
            make_v1725_event(
                {0: rng.integers(-500, 500, 2 * rng.integers(8, 24),
                                 dtype=np.int16)},
                timestamps={0: seg * 10_000 + i},
            )
            for i in range(4)
        )
        (raw / f"data_b1_seg{seg}.bin").write_bytes(blob)
    host = _mk_ctx(tmp_path, device=False).get_data("r", "st_waveforms")
    dev = _mk_ctx(tmp_path, device=True).get_data("r", "st_waveforms")
    assert len(host) == len(dev) == 12
    assert np.all(np.asarray(dev["board"]) == 1)
    for col in host.columns:
        np.testing.assert_array_equal(
            np.asarray(host[col]), np.asarray(dev[col]), err_msg=col
        )


def test_wave_length_clipping_parity(tmp_path):
    write_v1725_run(tmp_path / "daq", run_name="r", n_events=3, n_samples=32)
    ctx_h = _mk_ctx(tmp_path, device=False)
    ctx_d = _mk_ctx(tmp_path, device=True)
    for ctx in (ctx_h, ctx_d):
        ctx.set_config({"st_waveforms": {"wave_length": 16}})
    host = ctx_h.get_data("r", "st_waveforms")
    dev = ctx_d.get_data("r", "st_waveforms")
    assert np.asarray(dev["wave"]).shape[1] == 16
    for col in host.columns:
        np.testing.assert_array_equal(
            np.asarray(host[col]), np.asarray(dev[col]), err_msg=col
        )


def test_truncated_file_parity(tmp_path):
    """A file cut mid-waveform: both paths stop at the same record."""
    daq = tmp_path / "daq"
    raw = daq / "r" / "RAW"
    raw.mkdir(parents=True)
    w = np.arange(-20, 20, dtype=np.int16)
    blob = make_v1725_event({0: w}) + make_v1725_event({0: w})
    (raw / "cut_b0_seg0.bin").write_bytes(blob[: len(blob) - 30])
    host = _mk_ctx(tmp_path, device=False).get_data("r", "st_waveforms")
    dev = _mk_ctx(tmp_path, device=True).get_data("r", "st_waveforms")
    assert len(host) == len(dev) == 1
    np.testing.assert_array_equal(
        np.asarray(host["wave"]), np.asarray(dev["wave"])
    )


def test_device_resident_pipeline_parity(tmp_path):
    """device_unpack feeds the fused bundle WITHOUT a host round trip: the
    st_waveforms wave column stays a device array and downstream outputs
    are bit-identical to the host-unpacked pipeline."""
    import jax

    from waveformanalysis_tpu.plugins.builtin.basic_features import (
        BasicFeaturesPlugin,
    )
    from waveformanalysis_tpu.plugins.builtin.hit_finder import (
        ThresholdHitPlugin,
    )
    from waveformanalysis_tpu.plugins.builtin.peak_finding import (
        HitFinderPlugin,
    )

    write_v1725_run(tmp_path / "daq", run_name="r", n_events=16,
                    n_samples=64)

    def mk(device):
        ctx = _mk_ctx(tmp_path, device=device)
        ctx.register(BasicFeaturesPlugin(), HitFinderPlugin(),
                     ThresholdHitPlugin())
        ctx.set_config({"hit": {"use_filtered": False,
                                "use_derivative": False, "height": 100.0,
                                "prominence": 50.0, "width": 2}})
        return ctx

    ctx_d = mk(True)
    st = ctx_d.get_data("r", "st_waveforms")
    assert isinstance(st["wave"], jax.Array), \
        "device_unpack must keep the wave matrix device-resident"

    targets = ["basic_features", "hit", "hit_threshold"]
    out_d = ctx_d.get_data("r", targets)
    out_h = mk(False).get_data("r", targets)
    for name in targets:
        a, b = out_h[name], out_d[name]
        assert len(a) == len(b), name
        for col in a.columns:
            np.testing.assert_array_equal(
                np.asarray(a[col]), np.asarray(b[col]),
                err_msg=f"{name}.{col}",
            )


def test_device_table_persists_and_reloads(tmp_path):
    """A st_waveforms Table whose wave column is a device array persists
    through the async writer and reloads (fresh context) byte-identical to
    the host-unpacked payload."""
    write_v1725_run(tmp_path / "daq", run_name="r", n_events=5, n_samples=32)
    ctx = _mk_ctx(tmp_path, device=True)
    st = ctx.get_data("r", "st_waveforms")
    ctx.flush_saves()

    ctx2 = _mk_ctx(tmp_path, device=True)  # same storage dir ("dev")
    assert ctx2.cache_domain.is_cache_hit("r", "st_waveforms")
    st2 = ctx2.get_data("r", "st_waveforms")
    for col in st.columns:
        np.testing.assert_array_equal(
            np.asarray(st[col]), np.asarray(st2[col]), err_msg=col
        )

    host = _mk_ctx(tmp_path, device=False).get_data("r", "st_waveforms")
    np.testing.assert_array_equal(
        np.asarray(st2["wave"]), np.asarray(host["wave"])
    )


def test_device_unpack_untracked_in_lineage(tmp_path):
    write_v1725_run(tmp_path / "daq", run_name="r", n_events=2)
    ctx_h = _mk_ctx(tmp_path, device=False)
    ctx_d = _mk_ctx(tmp_path, device=True)
    assert ctx_h.key_for("r", "st_waveforms") == \
        ctx_d.key_for("r", "st_waveforms"), \
        "execution strategy must not rotate lineage"


def test_multi_group_buffers_match_single_group(tmp_path):
    """Files exceeding the group byte budget split into several device
    uploads whose concatenated matrix and GLOBAL offsets match the
    single-group result (exercises the >2 GiB path at a tiny limit)."""
    from waveformanalysis_tpu.ops.v1725_device import read_files_device

    daq = tmp_path / "daq" / "r" / "RAW"
    daq.mkdir(parents=True)
    rng = np.random.default_rng(13)
    paths = []
    for seg in range(4):
        blob = b"".join(
            make_v1725_event(
                {0: rng.integers(-500, 500, 2 * rng.integers(4, 16),
                                 dtype=np.int16)},
                timestamps={0: seg * 1000 + i},
            )
            for i in range(3)
        )
        p = daq / f"x_b0_seg{seg}.bin"
        p.write_bytes(blob)
        paths.append(str(p))

    waves_one, meta_one = read_files_device(paths)
    # limit of 1 byte forces one group PER FILE
    waves_many, meta_many = read_files_device(paths, _group_limit=1)
    np.testing.assert_array_equal(np.asarray(waves_one),
                                  np.asarray(waves_many))
    for k in meta_one:
        np.testing.assert_array_equal(meta_one[k], meta_many[k], err_msg=k)
    # offsets are global positions in the padded byte stream: strictly
    # increasing across file boundaries
    assert np.all(np.diff(meta_many["offset"]) > 0)
