"""Pallas TPU kernel for zero-phase IIR (sosfiltfilt) filtering.

The XLA path (ops/filtering.py) realizes each second-order section as a
log-depth associative scan over 2x2 affine state maps — O(L log L) work and
several HBM sweeps per section. An IIR recurrence is fundamentally
sequential in time, which maps naturally to a Pallas kernel: transpose to
time-major, pack 1024 events per (8, 128) vector register, and step the
direct-form-II-transposed cascade once per sample entirely in VMEM —
O(L) work, one HBM read + one write per direction.

Padding, initial conditions, and float32 conditioning (odd reflection,
sosfilt_zi steady state, DC-mean removal with exact H(1)^2 add-back) are
shared with the XLA implementation so both match scipy.signal.sosfiltfilt
to the same tolerance (tests/test_filter_pallas.py).

(reference analog: the scipy sosfiltfilt call in
waveform_analysis/core/plugins/builtin/cpu/filtering.py:198-224)
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waveformanalysis_tpu.ops.filtering import (
    design_butterworth_sos,
    sosfilt_zi,
    sosfiltfilt_padlen,
)

KERNEL_VERSION = "filter-pallas-v1"

_SUB = 8      # sublanes per vreg
_LANE = 128   # lanes per vreg
_BLOCK_EVENTS = _SUB * _LANE
# independent event-groups advanced per time step (ILP against the IIR
# dependency chain); batches are padded to groups*1024 events. 2 is the
# VMEM ceiling: 4 groups x (288,32,128) f32 in+out with double buffering
# exceeds the 16 MB scoped-vmem limit
_ILP_GROUPS = 2


def _sosfilt_kernel(x_ref, zi_ref, y_ref, *, sos: tuple, n_steps: int,
                    groups: int):
    """Direct-form-II-transposed SOS cascade, time-major.

    x_ref/y_ref: (Lp, groups*8, 128) — ``groups`` independent 1024-event
    blocks advance in ONE time loop. The recurrence's serial dependency
    chain (y -> z0 -> next y, section to section) leaves the VPU idle
    between dependent ops; interleaving independent groups fills those
    latency bubbles and amortizes the per-step loop overhead, which
    dominates a body this small. zi_ref: (2S, groups*8, 128) per-event
    scaled initial conditions.
    """
    S = len(sos)
    z = []
    for g in range(groups):
        for s in range(2 * S):
            z.append(zi_ref[s, 8 * g:8 * (g + 1), :])

    def body(t, zs):
        new_zs = list(zs)
        for g in range(groups):
            x = x_ref[t, 8 * g:8 * (g + 1), :]
            base = g * 2 * S
            for s in range(S):
                b0, b1, b2, a1, a2 = sos[s]
                y = b0 * x + zs[base + 2 * s]
                new_zs[base + 2 * s] = b1 * x - a1 * y + zs[base + 2 * s + 1]
                new_zs[base + 2 * s + 1] = b2 * x - a2 * y
                x = y
            y_ref[t, 8 * g:8 * (g + 1), :] = x
        return tuple(new_zs)

    jax.lax.fori_loop(0, n_steps, body, tuple(z))


def _sosfilt_pallas_timemajor(ext_T: jax.Array, sos_np: np.ndarray,
                              zi0: jax.Array, interpret: bool) -> jax.Array:
    """Run the cascade over a (Lp, n) time-major block (n % 1024 == 0)."""
    Lp, n = ext_T.shape
    S = sos_np.shape[0]
    # normalize a0 (scipy emits a0 == 1 for butterworth, but be safe)
    sos_static = tuple(
        (float(r[0] / r[3]), float(r[1] / r[3]), float(r[2] / r[3]),
         float(r[4] / r[3]), float(r[5] / r[3]))
        for r in sos_np
    )
    Lp_pad = Lp + ((-Lp) % _SUB)
    if Lp_pad != Lp:
        ext_T = jnp.pad(ext_T, ((0, Lp_pad - Lp), (0, 0)))

    groups = _ILP_GROUPS if n % (_ILP_GROUPS * _BLOCK_EVENTS) == 0 else 1

    x3 = ext_T.reshape(Lp_pad, n // _LANE, _LANE)
    zi3 = zi0.reshape(2 * S, n // _LANE, _LANE)
    grid = (n // (groups * _BLOCK_EVENTS),)
    y3 = pl.pallas_call(
        functools.partial(_sosfilt_kernel, sos=sos_static, n_steps=Lp,
                          groups=groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lp_pad, groups * _SUB, _LANE),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * S, groups * _SUB, _LANE),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lp_pad, groups * _SUB, _LANE),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lp_pad, n // _LANE, _LANE),
                                       jnp.float32),
        interpret=interpret,
    )(x3, zi3)
    return y3.reshape(Lp_pad, n)[:Lp]


def _sosfiltfilt_fused_kernel(x_ref, y_ref, y_sc, *, sos: tuple,
                              zi_unit: tuple, L: int, padlen: int,
                              groups: int):
    """Whole zero-phase filter in ONE kernel: reflection padding by index
    arithmetic, forward cascade into VMEM scratch, backward cascade reading
    the scratch in reverse — no materialized ext/reverse/intermediate
    arrays, one HBM read + one write per event block.

    x_ref: (L, groups*8, 128) mean-removed input; y_ref: same shape output;
    y_sc scratch: (Lp, groups*8, 128) with Lp = L + 2*padlen.
    """
    S = len(sos)
    Lp = L + 2 * padlen
    f32 = jnp.float32
    shape = (_SUB, _LANE)
    zb = jnp.zeros(shape, jnp.bool_)
    G = groups

    def ext_at(t, g, x0, xL):
        """Odd-reflected extended sample at ext index t (scipy pad)."""
        lo, hi = 8 * g, 8 * (g + 1)
        in_left = t < padlen
        in_right = t >= padlen + L
        idx = jnp.where(
            in_left, padlen - t,
            jnp.where(in_right, 2 * (L - 1) + padlen - t, t - padlen),
        )
        xv = x_ref[idx, lo:hi, :]
        left_v = 2.0 * x0 - xv
        right_v = 2.0 * xL - xv
        return jnp.where(zb | in_left, left_v,
                         jnp.where(zb | in_right, right_v, xv))

    x0s = [x_ref[0, 8 * g:8 * (g + 1), :] for g in range(G)]
    xLs = [x_ref[L - 1, 8 * g:8 * (g + 1), :] for g in range(G)]

    # All groups advance in LOCKSTEP inside one loop body, statements
    # interleaved per section so the independent chains overlap — written
    # as one sequential per-group loop, Mosaic scheduled the chains back
    # to back and the latency bubbles stayed empty.
    def step_sections(xs, zs):
        """One cascade step for every group; returns (ys, new_zs)."""
        new_zs = list(zs)
        xs = list(xs)
        for s in range(S):
            b0, b1, b2, a1, a2 = sos[s]
            ys = [b0 * xs[g] + zs[g * 2 * S + 2 * s] for g in range(G)]
            for g in range(G):
                base = g * 2 * S
                new_zs[base + 2 * s] = (
                    b1 * xs[g] - a1 * ys[g] + zs[base + 2 * s + 1]
                )
                new_zs[base + 2 * s + 1] = b2 * xs[g] - a2 * ys[g]
            xs = ys
        return xs, new_zs

    # forward: ext -> y_sc
    carry_f = []
    for g in range(G):
        first = ext_at(0, g, x0s[g], xLs[g])
        carry_f += [f32(zi_unit[j]) * first for j in range(2 * S)]

    def fwd(t, zs):
        xs = [ext_at(t, g, x0s[g], xLs[g]) for g in range(G)]
        ys, new_zs = step_sections(xs, zs)
        for g in range(G):
            y_sc[t, 8 * g:8 * (g + 1), :] = ys[g]
        return tuple(new_zs)

    jax.lax.fori_loop(0, Lp, fwd, tuple(carry_f))

    # backward: y_sc reversed -> y_ref (only the central L samples)
    carry_b = []
    for g in range(G):
        first_b = y_sc[Lp - 1, 8 * g:8 * (g + 1), :]
        carry_b += [f32(zi_unit[j]) * first_b for j in range(2 * S)]

    def bwd(t, zs):
        rt = Lp - 1 - t
        xs = [y_sc[rt, 8 * g:8 * (g + 1), :] for g in range(G)]
        ys, new_zs = step_sections(xs, zs)

        def store():
            for g in range(G):
                y_ref[rt - padlen, 8 * g:8 * (g + 1), :] = ys[g]
        pl.when((rt >= padlen) & (rt < padlen + L))(store)
        return tuple(new_zs)

    jax.lax.fori_loop(0, Lp, bwd, tuple(carry_b))


def _sosfiltfilt_fused_timemajor(x_T: jax.Array, sos_np: np.ndarray,
                                 zi_unit: np.ndarray, padlen: int,
                                 interpret: bool) -> jax.Array:
    """One fused forward+backward pass over (L, n) time-major input."""
    L, n = x_T.shape
    S = sos_np.shape[0]
    sos_static = tuple(
        (float(r[0] / r[3]), float(r[1] / r[3]), float(r[2] / r[3]),
         float(r[4] / r[3]), float(r[5] / r[3]))
        for r in sos_np
    )
    zi_static = tuple(float(v) for v in np.asarray(zi_unit).reshape(-1))
    Lp = L + 2 * padlen
    Lp_pad = Lp + ((-Lp) % _SUB)
    L_pad = L + ((-L) % _SUB)
    if L_pad != L:
        x_T = jnp.pad(x_T, ((0, L_pad - L), (0, 0)))

    groups = _ILP_GROUPS if n % (_ILP_GROUPS * _BLOCK_EVENTS) == 0 else 1
    x3 = x_T.reshape(L_pad, n // _LANE, _LANE)
    grid = (n // (groups * _BLOCK_EVENTS),)
    y3 = pl.pallas_call(
        functools.partial(
            _sosfiltfilt_fused_kernel, sos=sos_static, zi_unit=zi_static,
            L=L, padlen=padlen, groups=groups,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L_pad, groups * _SUB, _LANE),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L_pad, groups * _SUB, _LANE),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L_pad, n // _LANE, _LANE),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Lp_pad, groups * _SUB, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(x3)
    return y3.reshape(L_pad, n)[:L]


def _zi_block(zi_unit: np.ndarray, first: jax.Array) -> jax.Array:
    """(2S, n) per-event initial conditions: zi_unit[s] * first."""
    zi_flat = jnp.asarray(zi_unit.reshape(-1), jnp.float32)  # (2S,)
    return zi_flat[:, None] * first[None, :]


def sosfiltfilt_pallas(
    waves: Any,
    sos: np.ndarray,
    dtype: Any = np.float32,
    interpret: bool = False,
) -> np.ndarray:
    """Zero-phase sosfiltfilt over a (n, L) batch via the Pallas scan.

    Matches scipy.signal.sosfiltfilt (and ops.filtering.sosfiltfilt_device)
    to float32 tolerance.
    """
    x_np = np.ascontiguousarray(waves, dtype=np.float32)
    n, L = x_np.shape
    padlen = sosfiltfilt_padlen(sos)
    if L <= padlen:
        raise ValueError(f"wave length {L} must exceed padlen {padlen}")
    zi_unit = sosfilt_zi(sos)  # (S, 2)

    # pad to the ILP-group granularity once past one block so the kernel
    # runs with interleaved groups (small batches stay single-group)
    unit = _ILP_GROUPS * _BLOCK_EVENTS if n > _BLOCK_EVENTS else _BLOCK_EVENTS
    pad_n = (-n) % unit
    x = jnp.asarray(x_np)
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0)))

    out = _sosfiltfilt_pallas_jit(
        x, tuple(map(tuple, np.asarray(sos, np.float64))),
        tuple(map(tuple, zi_unit)), padlen, interpret,
    )
    return np.asarray(out[:n], dtype=dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _sosfiltfilt_pallas_jit(x, sos_t, zi_t, padlen, interpret, fused=True):
    sos_np = np.asarray(sos_t, np.float64)
    zi_unit = np.asarray(zi_t, np.float64)

    # float32 conditioning: remove the per-wave mean, add back its exact DC
    # response c * H(1)^2 (zi holds each section in steady state)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    dc_gain = float(np.prod(np.sum(sos_np[:, :3], axis=1)
                            / np.sum(sos_np[:, 3:], axis=1)))
    dc_response = mean * (dc_gain * dc_gain)
    x = x - mean

    if fused:
        # reflection, forward and backward cascades all inside ONE kernel —
        # the two-pass path below materializes ~6 full-array HBM round
        # trips (concat/reverse/intermediate) that dominate its runtime
        y_T = _sosfiltfilt_fused_timemajor(
            x.T, sos_np, zi_unit, padlen, interpret
        )
        return y_T.T + dc_response

    # odd reflection padding (scipy contract)
    left = 2.0 * x[:, :1] - x[:, padlen:0:-1]
    right = 2.0 * x[:, -1:] - x[:, -2:-padlen - 2:-1]
    ext = jnp.concatenate([left, x, right], axis=1)

    ext_T = ext.T  # (Lp, n) time-major

    # forward
    zi_f = _zi_block(zi_unit, ext_T[0])
    y = _sosfilt_pallas_timemajor(ext_T, sos_np, zi_f, interpret)
    # backward on the reversed signal
    y_rev = y[::-1]
    zi_b = _zi_block(zi_unit, y_rev[0])
    y2 = _sosfilt_pallas_timemajor(y_rev, sos_np, zi_b, interpret)
    y2 = y2[::-1]

    out = y2[padlen:y2.shape[0] - padlen].T  # back to (n, L)
    return out + dc_response


def bandpass_filter_pallas(
    waves: Any,
    lowcut_ghz: float,
    highcut_ghz: float,
    fs_ghz: float,
    order: int = 2,
    interpret: bool = False,
) -> np.ndarray:
    """Convenience: design + apply the standard Butterworth bandpass."""
    sos = design_butterworth_sos(order, lowcut_ghz, highcut_ghz, fs_ghz)
    return sosfiltfilt_pallas(waves, sos, interpret=interpret)
