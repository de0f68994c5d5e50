"""On-device V1725 sample unpacking: raw file bytes -> padded wave matrix.

The host's role shrinks to a header-only walk (byte offsets + per-record
metadata; no sample copying); the raw buffer uploads ONCE as uint32 words
and a jitted gather/bit-slice program materializes the (n, L) int16 wave
matrix directly in HBM — where the feature/peak kernels consume it. This is
the SURVEY §7 "on-device bit-unpacking (uint32 ops)" path; the host walker
(formats/v1725.py:124, reference: utils/formats/v1725.py:26-115) remains
the default and the parity oracle (tests/test_v1725_device.py).

Event layout (reference: utils/formats/v1725.py:26-115): 16-byte event
header (channel mask at bytes 4 and 11), then per active channel a 12-byte
channel header (22-bit size in words, trunc flag bit 6 of byte 3, 48-bit
timestamp, 16-bit baseline) followed by little-endian int16 samples.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

EVENT_HEADER_BYTES = 16
CH_HEADER_BYTES = 12


def scan_headers(
    buf: bytes, board: int, base_offset: int = 0
) -> Dict[str, np.ndarray]:
    """Header-only walk: per-record metadata + sample byte offsets.

    Uses the native walker when available (wfa_v1725_headers — at 50k
    records the python loop costs ~215 ms vs ~2 ms native), with the pure
    python loop as the exact-parity fallback. Same truncation semantics as
    the full walker (short header/waveform -> stop this file with a
    warning); ``base_offset`` shifts offsets when several files concatenate
    into one device buffer.
    """
    try:
        from waveformanalysis_tpu.native import scan_v1725_headers_bytes

        native = scan_v1725_headers_bytes(buf)
    except Exception as e:  # pragma: no cover - import/ABI issues
        logger.debug("native header scan unavailable: %s", e)
        native = None
    if native is not None:
        n_rec = len(native["offset"])
        return {
            "board": np.full(n_rec, board, dtype=np.int16),
            "channel": native["channel"],
            "timestamp": native["timestamp"],
            "baseline": native["baseline"],
            "trunc": native["trunc"].astype(bool),
            "offset": native["offset"] + base_offset,
            "n_samples": native["n_samples"],
        }
    return _scan_headers_py(buf, board, base_offset)


def _scan_headers_py(
    buf: bytes, board: int, base_offset: int = 0
) -> Dict[str, np.ndarray]:
    """Pure-python header walk (parity oracle for the native scan)."""
    n = len(buf)
    view = memoryview(buf)
    boards: List[int] = []
    channels: List[int] = []
    timestamps: List[int] = []
    baselines: List[int] = []
    truncs: List[bool] = []
    offsets: List[int] = []
    lengths: List[int] = []
    pos = 0
    while pos + EVENT_HEADER_BYTES <= n:
        header = view[pos : pos + EVENT_HEADER_BYTES]
        pos += EVENT_HEADER_BYTES
        mask = header[4] | (header[11] << 8)
        truncated = False
        for ch in range(16):
            if not (mask >> ch) & 1:
                continue
            if pos + CH_HEADER_BYTES > n:
                logger.warning("Short channel header at byte %d", pos)
                truncated = True
                break
            ch_header = view[pos : pos + CH_HEADER_BYTES]
            pos += CH_HEADER_BYTES
            size_words = (
                int.from_bytes(ch_header[0:3], "little") & ((1 << 22) - 1)
            )
            sig_bytes = (size_words - 3) * 4
            if sig_bytes < 0 or pos + sig_bytes > n:
                logger.warning("Short waveform at byte %d", pos)
                truncated = True
                break
            boards.append(board)
            channels.append(ch)
            timestamps.append(int.from_bytes(ch_header[4:10], "little"))
            baselines.append(int.from_bytes(ch_header[10:12], "little"))
            truncs.append(bool((ch_header[3] >> 6) & 1))
            offsets.append(base_offset + pos)
            lengths.append(sig_bytes // 2)
            pos += sig_bytes
        if truncated:
            break
    return {
        "board": np.asarray(boards, dtype=np.int16),
        "channel": np.asarray(channels, dtype=np.int16),
        "timestamp": np.asarray(timestamps, dtype=np.int64),
        "baseline": np.asarray(baselines, dtype=np.float64),
        "trunc": np.asarray(truncs, dtype=bool),
        "offset": np.asarray(offsets, dtype=np.int64),
        "n_samples": np.asarray(lengths, dtype=np.int32),
    }


_unpack_cache: Dict[int, object] = {}


def _unpack_program(L: int):
    """jitted (raw_u32, offsets, lengths) -> (n, L) int16, cached on L."""
    prog = _unpack_cache.get(L)
    if prog is not None:
        return prog
    import jax
    import jax.numpy as jnp

    def unpack(raw_u32, offsets, lengths):
        # byte index of sample k of record i; samples are 2-byte LE
        byte_idx = offsets[:, None] + 2 * jnp.arange(L, dtype=jnp.int32)[None, :]
        word = raw_u32[byte_idx >> 2]
        half = (byte_idx >> 1) & 1
        u16 = (word >> (16 * half)) & jnp.uint32(0xFFFF)
        s = u16.astype(jnp.int32)
        s = jnp.where(s >= 32768, s - 65536, s)
        valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
        return jnp.where(valid, s, 0).astype(jnp.int16)

    prog = jax.jit(unpack)
    _unpack_cache[L] = prog
    return prog


def unpack_samples_device(
    raw: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, L: int
):
    """Device (n, L) int16 wave matrix from a raw byte buffer.

    ``raw`` is the file bytes as uint8 (padded here to a 4-byte multiple);
    offsets are byte positions of each record's first sample (always even —
    headers are 4-byte-aligned structures); rows pad with zeros past
    ``lengths`` and truncate beyond ``L``.
    """
    import jax.numpy as jnp

    raw = np.asarray(raw, dtype=np.uint8)
    if len(raw) + 2 * int(L) >= 2**31:
        # byte_idx is computed in int32 on device; callers chunk buffers
        # (read_files_device groups files below this bound)
        raise ValueError(
            f"raw buffer of {len(raw)} bytes exceeds the int32 byte-index "
            "range of the device unpack program; split the input"
        )
    pad = (-len(raw)) % 4
    if pad:
        raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
    raw_u32 = raw.view(np.uint32)
    prog = _unpack_program(int(L))
    return prog(
        jnp.asarray(raw_u32),
        jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(np.minimum(lengths, L).astype(np.int32)),
    )


def read_files_device(
    file_paths: List, wave_length: Optional[int] = None,
    board_from_path=None, _group_limit: Optional[int] = None,
) -> Tuple[object, Dict[str, np.ndarray]]:
    """(device wave matrix, metadata columns) for a list of V1725 files.

    File buffers concatenate (each padded to a 4-byte boundary so word
    indexing stays valid) in GROUPS bounded by the unpack program's int32
    byte-index range (~2 GiB, minus 2*L headroom for the per-record sample
    span); each group uploads once, per-group matrices concatenate on
    device. Metadata comes from the header-only host walk; ``offset``
    values in the returned metadata are positions in the GLOBAL padded
    byte stream across all files.
    """
    # scan everything first: L (hence the per-group byte budget) depends on
    # the longest record, and the returned offsets are global
    bufs: List[bytes] = []
    metas: List[Dict[str, np.ndarray]] = []
    for fp in file_paths:
        path = Path(fp)
        if not path.exists():
            logger.warning("File not found: %s", path)
            continue
        board = board_from_path(path) if board_from_path else 0
        buf = path.read_bytes()
        metas.append(scan_headers(buf, board))
        pad = (-len(buf)) % 4
        if pad:
            buf = buf + b"\x00" * pad
        bufs.append(buf)

    if not metas or sum(len(m["offset"]) for m in metas) == 0:
        empty = {k: np.zeros(0, dtype=v.dtype) for k, v in
                 scan_headers(b"", 0).items()}
        return None, empty

    max_samples = max(
        (int(m["n_samples"].max()) for m in metas if len(m["n_samples"])),
        default=1,
    )
    L = int(wave_length) if wave_length else max_samples
    # int32 byte-index headroom: group bytes + 2*L must stay under 2**31
    # (_group_limit lets tests exercise the multi-group path cheaply)
    group_limit = _group_limit if _group_limit is not None else max(
        2**31 - 2 * max(L, max_samples) - 8, 1 << 20
    )

    global_meta: List[Dict[str, np.ndarray]] = []
    parts = []
    g_bufs: List[bytes] = []
    g_offsets: List[np.ndarray] = []
    g_lengths: List[np.ndarray] = []
    g_size = 0
    global_base = 0

    def _flush_group():
        nonlocal g_bufs, g_offsets, g_lengths, g_size
        if g_bufs and sum(len(o) for o in g_offsets):
            raw = np.frombuffer(b"".join(g_bufs), dtype=np.uint8)
            parts.append(unpack_samples_device(
                raw, np.concatenate(g_offsets),
                np.concatenate(g_lengths), L,
            ))
        g_bufs, g_offsets, g_lengths, g_size = [], [], [], 0

    for buf, m in zip(bufs, metas):
        if g_bufs and g_size + len(buf) > group_limit:
            _flush_group()
        g_bufs.append(buf)
        g_offsets.append(m["offset"] + g_size)
        g_lengths.append(m["n_samples"])
        g_size += len(buf)
        gm = dict(m)
        gm["offset"] = m["offset"] + global_base
        global_meta.append(gm)
        global_base += len(buf)
    _flush_group()

    meta = {
        k: np.concatenate([m[k] for m in global_meta])
        for k in global_meta[0]
    }
    if len(parts) == 1:
        return parts[0], meta
    import jax.numpy as jnp

    return jnp.concatenate(parts, axis=0), meta
