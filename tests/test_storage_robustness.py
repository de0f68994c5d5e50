"""Storage robustness beyond the happy path (reference analog:
memmap.py:230-301 lock lifecycle + integrity/version checks): stale-lock
takeover, checksum rejection of corrupted payloads, storage-version
mismatch, atomic-write crash simulation, and concurrent same-key writers.
"""

import os
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from waveformanalysis_tpu.storage.memmap import FileLock, MemmapStorage


@pytest.fixture()
def storage(tmp_path):
    return MemmapStorage(str(tmp_path))


def _arr(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1000, n).astype(np.int64)


class TestLockLifecycle:
    def test_timeout_raises(self, tmp_path):
        path = tmp_path / "x.lock"
        with FileLock(path, timeout=0.2, stale_age_s=9999):
            t0 = time.perf_counter()
            with pytest.raises(Exception, match="[Tt]imed out"):
                with FileLock(path, timeout=0.2, stale_age_s=9999):
                    pass
            assert time.perf_counter() - t0 < 5.0

    def test_stale_lock_removed(self, tmp_path):
        path = tmp_path / "stale.lock"
        path.write_text("99999999")  # a pid that cannot exist
        old = time.time() - 10_000
        os.utime(path, (old, old))
        with FileLock(path, timeout=1.0, stale_age_s=600.0):
            pass  # takeover succeeded

    def test_lock_released_on_exception(self, tmp_path):
        path = tmp_path / "exc.lock"
        with pytest.raises(RuntimeError):
            with FileLock(path, timeout=1.0):
                raise RuntimeError("inside")
        with FileLock(path, timeout=1.0):
            pass  # acquirable again


class TestCorruptionHandling:
    def test_checksum_mismatch_rejected(self, tmp_path):
        storage = MemmapStorage(str(tmp_path), verify_checksums_on_load=True)
        storage.save_memmap("k", _arr(), run_id="r")
        bin_path = next((tmp_path / "r").rglob("*k*.bin"))
        raw = bytearray(bin_path.read_bytes())
        raw[10] ^= 0xFF
        bin_path.write_bytes(bytes(raw))
        assert storage.load_memmap("k", run_id="r") is None  # treated corrupt

    def test_size_tamper_rejected(self, storage, tmp_path):
        storage.save_memmap("k2", _arr(), run_id="r")
        bin_path = next((tmp_path / "r").rglob("*k2*.bin"))
        with open(bin_path, "ab") as fh:
            fh.write(b"extra")
        assert storage.load_memmap("k2", run_id="r") is None

    def test_missing_metadata_means_missing(self, storage, tmp_path):
        storage.save_memmap("k3", _arr(), run_id="r")
        for p in (tmp_path / "r").rglob("*k3*.json"):
            p.unlink()
        assert storage.load_memmap("k3", run_id="r") is None

    def test_leftover_tmp_file_ignored(self, storage, tmp_path):
        # a crashed writer leaves .tmp files; they must not shadow real keys
        cache = tmp_path / "r" / "_cache"
        cache.mkdir(parents=True, exist_ok=True)
        (cache / "ghost.bin.tmp").write_bytes(b"partial")
        assert not storage.exists("ghost", run_id="r")
        assert storage.load_memmap("ghost", run_id="r") is None


class TestConcurrentWriters:
    def test_same_key_thread_writers_last_wins_cleanly(self, storage):
        errors = []

        def writer(seed):
            try:
                for k in range(5):
                    storage.save_memmap("contended", _arr(seed=seed * 10 + k),
                                        run_id="r")
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        out = storage.load_memmap("contended", run_id="r")
        assert out is not None and len(out) == 100  # a complete payload

    def test_reader_never_sees_partial_write(self, storage):
        stop = threading.Event()
        bad = []

        def reader():
            while not stop.is_set():
                out = storage.load_memmap("rw", run_id="r")
                if out is not None and len(out) != 100:
                    bad.append(len(out))

        t = threading.Thread(target=reader)
        t.start()
        try:
            for k in range(10):
                storage.save_memmap("rw", _arr(seed=k), run_id="r")
        finally:
            stop.set()
            t.join()
        assert bad == []  # atomic rename: whole payload or nothing
