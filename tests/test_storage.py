"""Storage layer tests: memmap round-trips, atomicity, locks, streams, SQLite."""

import json
from pathlib import Path

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.schema import BASIC_FEATURES_SCHEMA, create_record_dtype
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.storage import (
    MemmapStorage,
    SQLiteBackend,
    validate_backend,
)
from waveformanalysis_tpu.storage.memmap import FileLock
from waveformanalysis_tpu.foundation.exceptions import StorageError


@pytest.fixture
def storage(tmp_path):
    return MemmapStorage(tmp_path / "store")


def make_structured(n=10):
    arr = np.zeros(n, dtype=[("time", "i8"), ("val", "f4"), ("wave", "i2", (16,))])
    arr["time"] = np.arange(n)
    arr["val"] = np.linspace(0, 1, n)
    arr["wave"] = np.arange(n * 16).reshape(n, 16) % 1000
    return arr


def make_table(n=10):
    return Table(
        {
            "height": np.linspace(0, 5, n).astype(np.float32),
            "amp": np.ones(n, dtype=np.float32),
            "area": np.arange(n, dtype=np.float32),
            "max_abs_diff": np.zeros(n, dtype=np.float32),
            "timestamp": np.arange(n, dtype=np.int64) * 1000,
            "board": np.zeros(n, dtype=np.int16),
            "channel": (np.arange(n) % 2).astype(np.int16),
            "event_index": np.arange(n, dtype=np.int64),
        },
        schema=BASIC_FEATURES_SCHEMA,
    )


class TestStructuredRoundtrip:
    def test_save_load(self, storage):
        arr = make_structured()
        meta = storage.save_memmap("k1", arr, run_id="r1", lineage={"v": 1})
        assert meta["format"] == "structured"
        out = storage.load_memmap("k1", run_id="r1")
        assert isinstance(out, np.memmap)  # zero-copy
        np.testing.assert_array_equal(np.asarray(out), arr)

    def test_metadata_contains_lineage_and_checksum(self, storage):
        arr = make_structured()
        storage.save_memmap("k1", arr, run_id="r1", lineage={"plugin": "x"})
        meta = storage.get_metadata("k1", run_id="r1")
        assert meta["lineage"] == {"plugin": "x"}
        assert "checksum" in meta and meta["checksum"]["value"]
        assert meta["n_rows"] == 10

    def test_size_mismatch_treated_corrupt(self, storage, tmp_path):
        arr = make_structured()
        storage.save_memmap("k1", arr, run_id="r1")
        bin_path = storage._bin_path("k1", "r1")
        with open(bin_path, "ab") as fh:
            fh.write(b"garbage")
        assert storage.load_memmap("k1", run_id="r1") is None

    def test_exists_delete_list(self, storage):
        storage.save_memmap("a", make_structured(), run_id="r1")
        storage.save_memmap("b", make_structured(), run_id="r1")
        assert storage.exists("a", "r1")
        assert storage.list_keys("r1") == ["a", "b"]
        assert storage.get_size("a", "r1") > 0
        storage.delete("a", "r1")
        assert not storage.exists("a", "r1")
        assert storage.list_keys("r1") == ["b"]


class TestTableRoundtrip:
    def test_save_load_table(self, storage):
        tbl = make_table()
        meta = storage.save_memmap("t1", tbl, run_id="r1")
        assert meta["format"] == "table"
        out = storage.load_memmap("t1", run_id="r1")
        assert isinstance(out, Table)
        assert out.schema is BASIC_FEATURES_SCHEMA
        for name in tbl.field_names:
            np.testing.assert_array_equal(np.asarray(out[name]), np.asarray(tbl[name]))
        # zero-copy: columns are memmaps
        assert isinstance(out["height"], np.memmap)

    def test_field_alignment(self, storage):
        tbl = make_table()
        storage.save_memmap("t1", tbl, run_id="r1")
        meta = storage.get_metadata("t1", "r1")
        for f in meta["fields"]:
            assert f["offset"] % 64 == 0

    def test_string_fields_rejected(self, storage):
        tbl = Table({"s": np.array(["a", "b"])})
        with pytest.raises(StorageError):
            storage.save_memmap("bad", tbl, run_id="r1")


class TestCompression:
    def test_gzip_roundtrip(self, tmp_path):
        storage = MemmapStorage(tmp_path / "store", compression="gzip")
        arr = make_structured(100)
        meta = storage.save_memmap("k", arr, run_id="r")
        assert meta["compression"] == "gzip"
        out = storage.load_memmap("k", run_id="r")
        np.testing.assert_array_equal(np.asarray(out), arr)

    def test_compressed_table(self, tmp_path):
        storage = MemmapStorage(tmp_path / "store", compression="gzip")
        tbl = make_table()
        storage.save_memmap("t", tbl, run_id="r")
        out = storage.load_memmap("t", run_id="r")
        np.testing.assert_array_equal(np.asarray(out["area"]), np.asarray(tbl["area"]))


class TestStreaming:
    def test_stream_save(self, storage):
        writer = storage.save_stream("s1", run_id="r1")
        chunks = [make_structured(5), make_structured(7)]
        for c in chunks:
            writer.append(c)
        meta = storage.finalize_save("s1", writer, run_id="r1", lineage={"x": 1})
        assert meta["n_rows"] == 12
        out = storage.load_memmap("s1", run_id="r1")
        assert len(out) == 12
        np.testing.assert_array_equal(out["time"][:5], chunks[0]["time"])

    def test_stream_dtype_mismatch(self, storage):
        writer = storage.save_stream("s2", run_id="r1")
        writer.append(make_structured(3))
        bad = np.zeros(2, dtype=[("other", "f8")])
        with pytest.raises(StorageError):
            writer.append(bad)
        writer.abort()

    def test_stream_table_chunks(self, storage):
        writer = storage.save_stream("s3", run_id="r1")
        writer.append(make_table(4))
        writer.append(make_table(6))
        meta = storage.finalize_save("s3", writer, run_id="r1")
        assert meta["n_rows"] == 10
        out = storage.load_memmap("s3", run_id="r1")
        assert out.dtype.names == BASIC_FEATURES_SCHEMA.numpy_dtype().names


class TestDataFrames:
    def test_dataframe_roundtrip(self, storage):
        import pandas as pd

        df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        meta = storage.save_dataframe("df1", df, run_id="r1", lineage={"l": 2})
        assert meta["type"] == "dataframe"
        out = storage.load_dataframe("df1", run_id="r1")
        pd.testing.assert_frame_equal(out, df)


class TestIntegrityAndLocks:
    def test_verify_integrity(self, storage):
        storage.save_memmap("good", make_structured(), run_id="r1")
        storage.save_memmap("bad", make_structured(), run_id="r1")
        # corrupt 'bad' in place (same size)
        bin_path = storage._bin_path("bad", "r1")
        data = bytearray(bin_path.read_bytes())
        data[0] ^= 0xFF
        bin_path.write_bytes(bytes(data))
        report = storage.verify_integrity("r1")
        assert report["checked"] == 2
        assert report["corrupt"] == ["bad"]

    def test_filelock_reentrant_conflict(self, tmp_path):
        lock_path = tmp_path / "x.lock"
        with FileLock(lock_path, timeout=0.3, retry_interval=0.05):
            l2 = FileLock(lock_path, timeout=0.3, retry_interval=0.05)
            with pytest.raises(Exception):
                l2.acquire()


class TestSQLiteBackend:
    def test_protocol_complete(self, tmp_path):
        backend = SQLiteBackend(tmp_path / "cache.db")
        assert validate_backend(backend) == []

    def test_roundtrip(self, tmp_path):
        backend = SQLiteBackend(tmp_path / "cache.db")
        arr = make_structured()
        backend.save_memmap("k", arr, run_id="r", lineage={"a": 1})
        out = backend.load_memmap("k", run_id="r")
        np.testing.assert_array_equal(out, arr)
        assert backend.get_metadata("k", "r")["lineage"] == {"a": 1}
        assert backend.list_keys("r") == ["k"]
        backend.delete("k", "r")
        assert not backend.exists("k", "r")

    def test_table_roundtrip(self, tmp_path):
        backend = SQLiteBackend(tmp_path / "cache.db")
        tbl = make_table()
        backend.save_memmap("t", tbl, run_id="r")
        out = backend.load_memmap("t", run_id="r")
        np.testing.assert_array_equal(np.asarray(out["height"]), np.asarray(tbl["height"]))

    def test_stream(self, tmp_path):
        backend = SQLiteBackend(tmp_path / "cache.db")
        writer = backend.save_stream("s", run_id="r")
        writer.append(make_structured(3))
        meta = backend.finalize_save("s", writer, run_id="r")
        assert meta["n_rows"] == 3
        out = backend.load_memmap("s", run_id="r")
        assert len(out) == 3


@pytest.mark.slow
def test_concurrent_processes_computing_same_key(tmp_path):
    """Six processes race to compute and persist the same (run, data) key
    against one storage dir: every process must succeed (fcntl locks +
    atomic tmp-rename), and the surviving cache entry must be valid."""
    import subprocess
    import sys

    code = """
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.base import Plugin

class Slow(Plugin):
    provides = "slow_data"
    version = "1.0.0"
    save_when = "always"
    def compute(self, context, run_id, **kw):
        time.sleep(0.2)
        return np.arange(1000, dtype=np.float64) * 3.0

ctx = Context(storage_dir=sys.argv[1], config={{"show_progress": False}})
ctx.register(Slow())
out = np.asarray(ctx.get_data("r", "slow_data"))
assert out.shape == (1000,) and out[999] == 2997.0
""".format(repo=str(Path(__file__).parent.parent))
    store = str(tmp_path / "store")
    procs = [subprocess.Popen([sys.executable, "-c", code, store],
                              stderr=subprocess.PIPE, text=True)
             for _ in range(6)]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-500:]
    # a fresh context must read the surviving entry cleanly
    r = subprocess.run([sys.executable, "-c", code, store],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
