"""Resident pipeline server: protocol, warm-cache reuse, storage sharing.

The server holds one Context so jit programs and caches stay warm across
requests (waveformanalysis_tpu/server.py); results persist through the
normal lineage-keyed storage so other Contexts read them directly.
"""

import json
import os
import threading

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.dataframe import DataFramePlugin
from waveformanalysis_tpu.plugins.builtin.event_analysis import GroupedEventsPlugin
from waveformanalysis_tpu.server import PipelineServer, request, wait_ready
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


@pytest.fixture()
def running_server(tmp_path):
    ctx = Context(storage_dir=str(tmp_path / "store"),
                  config={"show_progress": False})
    ctx.register(BasicFeaturesPlugin(), DataFramePlugin(),
                 GroupedEventsPlugin())
    for i in range(3):
        st = make_fake_st_waveforms(n_events=24, pulse_height=300,
                                    polarity="positive", seed=i)
        st["channel"] = (np.arange(24) % 2).astype(np.int16)
        ctx.inject_data(f"r{i}", "st_waveforms", st)

    sock = str(tmp_path / "wfa.sock")
    server = PipelineServer(ctx, sock)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    assert wait_ready(sock, timeout=30.0)
    yield ctx, sock
    request(sock, {"op": "shutdown"})
    t.join(timeout=30.0)
    assert not t.is_alive()


def test_ping_and_stats(running_server):
    _ctx, sock = running_server
    assert request(sock, {"op": "ping"})["pong"] is True
    stats = request(sock, {"op": "stats"})
    assert stats["ok"] and "df" in stats["registered"]


def test_get_data_computes_and_persists(running_server):
    ctx, sock = running_server
    resp = request(sock, {"op": "get_data", "run_id": "r0",
                          "names": ["df_events"]})
    assert resp["ok"], resp
    assert resp["results"]["df_events"]["rows"] == 24
    request(sock, {"op": "flush"})

    # a SEPARATE context over the same storage reads the served result
    # (same inputs injected -> same lineage -> same key)
    ctx2 = Context(storage_dir=str(ctx.storage_dir),
                   config={"show_progress": False})
    ctx2.register(BasicFeaturesPlugin(), DataFramePlugin(),
                  GroupedEventsPlugin())
    st = make_fake_st_waveforms(n_events=24, pulse_height=300,
                                polarity="positive", seed=0)
    st["channel"] = (np.arange(24) % 2).astype(np.int16)
    ctx2.inject_data("r0", "st_waveforms", st)
    assert ctx2.cache_domain.is_cache_hit("r0", "df_events")
    assert len(ctx2.get_data("r0", "df_events")) == 24


def test_warm_second_request_is_cached(running_server):
    _ctx, sock = running_server
    r1 = request(sock, {"op": "get_data", "run_id": "r1",
                        "names": ["basic_features"]})
    r2 = request(sock, {"op": "get_data", "run_id": "r1",
                        "names": ["basic_features"]})
    assert r1["ok"] and r2["ok"]
    assert r2["seconds"] < r1["seconds"]
    assert r2["results"]["basic_features"]["key"] == \
        r1["results"]["basic_features"]["key"]


def test_batched_op(running_server):
    _ctx, sock = running_server
    resp = request(sock, {"op": "get_data_batched",
                          "run_ids": ["r0", "r1", "r2"],
                          "names": ["basic_features"]})
    assert resp["ok"], resp
    for rid in ("r0", "r1", "r2"):
        assert resp["results"][rid]["basic_features"]["rows"] == 24


def test_error_reported_not_fatal(running_server):
    _ctx, sock = running_server
    resp = request(sock, {"op": "get_data", "run_id": "missing",
                          "names": ["df"]})
    assert resp["ok"] is False and "error" in resp
    # server still alive
    assert request(sock, {"op": "ping"})["pong"] is True


def test_unknown_op_and_bad_json(running_server):
    _ctx, sock = running_server
    assert request(sock, {"op": "dance"})["ok"] is False
    import socket as socket_mod

    with socket_mod.socket(socket_mod.AF_UNIX) as s:
        s.connect(sock)
        s.sendall(b"this is not json\n")
        buf = s.recv(1 << 16)
    assert json.loads(buf)["ok"] is False


def test_soak_mixed_requests(running_server):
    """Sustained mixed traffic: interleaved computes, errors, malformed
    payloads, and flushes leave the server healthy and the pending-save
    registry drained."""
    from waveformanalysis_tpu.context.execution_domain import _PENDING_SAVES

    _ctx, sock = running_server
    for i in range(40):
        rid = f"r{i % 3}"
        if i % 7 == 3:
            resp = request(sock, {"op": "get_data", "run_id": "nope",
                                  "names": ["df"]})
            assert resp["ok"] is False
        elif i % 11 == 5:
            assert request(sock, {"op": "nonsense"})["ok"] is False
        else:
            resp = request(sock, {"op": "get_data", "run_id": rid,
                                  "names": ["basic_features", "df"]})
            assert resp["ok"], resp
    request(sock, {"op": "flush"})
    stats = request(sock, {"op": "stats"})
    assert stats["requests"] >= 42
    root = str(_ctx.storage_dir)
    assert not any(k[0] == root for k in _PENDING_SAVES), \
        "flush must drain the async-save registry"


def test_cli_entry_point_registered():
    import tomllib

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    assert meta["project"]["scripts"]["waveform-serve"] == \
        "waveformanalysis_tpu.server:main"
