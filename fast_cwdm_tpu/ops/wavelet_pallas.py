"""Pallas TPU kernels for the 3D Haar DWT/IDWT.

The reference implements the 3D transform as 24 chained dense matmuls with
inter-axis transposes, rebuilding banded filter matrices on every call
(`/root/reference/DWT_IDWT/DWT_IDWT_Functions.py:115-208`,
`DWT_IDWT_layer.py:459-646`). Here the whole decomposition of one volume is
a single Pallas kernel:

* grid over X-pairs — each program owns one output X position;
* X-axis Haar = one VPU add/sub of two resident (Y, Z) slices;
* Y-axis (sublane dim) and Z-axis (lane dim) via small banded matmuls on
  the MXU — decimated filter matrices are cached host-side constants, never
  rebuilt;
* all 8 subbands of the block are produced in one pass over HBM; output is
  band-major ``(8, X/2, Y/2, Z/2)`` so the minor dims stay lane-friendly
  (the flat band-last latent layout would waste 15/16 of each lane tile).

Custom VJP: the Haar transform is orthonormal, so the backward of ``dwt``
IS ``idwt`` of the cotangent (and vice versa) — the same kernels serve both
directions (semantics of `DWT_IDWT_Functions.py:138-156`).

Exactness is pinned against the XLA slice/add path in
``tests/test_wavelet_pallas.py`` (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_cwdm_tpu.ops.wavelet import _banded_matrices

_F32 = jnp.float32


@functools.lru_cache(maxsize=None)
def _mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(L, H) decimated Haar analysis matrices for length n (cached)."""
    lo, hi = _banded_matrices(n, "haar")
    return lo.astype(np.float32), hi.astype(np.float32)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _dwt3_kernel(x_ref, ly_ref, hy_ref, lzt_ref, hzt_ref, out_ref):
    """One X-pair → all 8 subbands at that output X position.

    x_ref:   (2, Y, Z)      input slice pair (VMEM)
    ly/hy:   (Y/2, Y)       Y-axis analysis matrices
    lzt/hzt: (Z, Z/2)       Z-axis analysis matrices (pre-transposed)
    out_ref: (8, 1, Y/2, Z/2) band-major output block
    """
    r = np.float32(1.0 / np.sqrt(2.0))
    x0 = x_ref[0]
    x1 = x_ref[1]
    ax = (x0 + x1) * r  # X-low
    dx = (x0 - x1) * r  # X-high

    band = 0
    for vx in (ax, dx):  # X: low, high
        for my in (ly_ref, hy_ref):  # Y: low, high
            vy = jnp.dot(my[:], vx, preferred_element_type=_F32,
                         precision=jax.lax.Precision.HIGHEST)
            for mz in (lzt_ref, hzt_ref):  # Z: low, high
                out_ref[band, 0] = jnp.dot(
                    vy, mz[:], preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                band += 1


def _idwt3_kernel(b_ref, lyt_ref, hyt_ref, lz_ref, hz_ref, out_ref):
    """All 8 subbands at one X position → the two image X-slices.

    b_ref:   (8, 1, Y/2, Z/2)
    lyt/hyt: (Y, Y/2)   Y-axis synthesis (analysis transposed)
    lz/hz:   (Z/2, Z)   Z-axis synthesis
    out_ref: (2, Y, Z)
    """
    r = np.float32(1.0 / np.sqrt(2.0))
    acc_a = None
    acc_d = None
    band = 0
    for xi in range(2):  # X: low, high
        for my in (lyt_ref, hyt_ref):
            for mz in (lz_ref, hz_ref):
                v = b_ref[band, 0]
                v = jnp.dot(v, mz[:], preferred_element_type=_F32,
                            precision=jax.lax.Precision.HIGHEST)
                v = jnp.dot(my[:], v, preferred_element_type=_F32,
                            precision=jax.lax.Precision.HIGHEST)
                if xi == 0:
                    acc_a = v if acc_a is None else acc_a + v
                else:
                    acc_d = v if acc_d is None else acc_d + v
                band += 1
    out_ref[0] = (acc_a + acc_d) * r
    out_ref[1] = (acc_a - acc_d) * r


# ---------------------------------------------------------------------------
# pallas_call wrappers (single volume (X, Y, Z))
# ---------------------------------------------------------------------------


def _dwt3_single(x: jax.Array, interpret: bool = False) -> jax.Array:
    X, Y, Z = x.shape
    assert X % 2 == 0 and Y % 2 == 0 and Z % 2 == 0
    ly, hy = _mats(Y)
    lz, hz = _mats(Z)
    mats = (
        jnp.asarray(ly),
        jnp.asarray(hy),
        jnp.asarray(lz.T),
        jnp.asarray(hz.T),
    )
    return pl.pallas_call(
        _dwt3_kernel,
        grid=(X // 2,),
        in_specs=[
            pl.BlockSpec((2, Y, Z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Y // 2, Y), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Y // 2, Y), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, Z // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, Z // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 1, Y // 2, Z // 2), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((8, X // 2, Y // 2, Z // 2), x.dtype),
        interpret=interpret,
    )(x, *mats)


def _idwt3_single(bands: jax.Array, interpret: bool = False) -> jax.Array:
    eight, Xh, Yh, Zh = bands.shape
    assert eight == 8
    Y, Z = 2 * Yh, 2 * Zh
    ly, hy = _mats(Y)
    lz, hz = _mats(Z)
    mats = (
        jnp.asarray(ly.T),
        jnp.asarray(hy.T),
        jnp.asarray(lz),
        jnp.asarray(hz),
    )
    return pl.pallas_call(
        _idwt3_kernel,
        grid=(Xh,),
        in_specs=[
            pl.BlockSpec((8, 1, Yh, Zh), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Y, Yh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Y, Yh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Zh, Z), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Zh, Z), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * Xh, Y, Z), bands.dtype),
        interpret=interpret,
    )(bands, *mats)


# ---------------------------------------------------------------------------
# Public API with custom VJP (orthonormal: bwd(dwt) = idwt of cotangent)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def dwt3_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """3D Haar DWT of ``(..., X, Y, Z)`` → band-major ``(..., 8, X/2, Y/2,
    Z/2)``; leading dims are vmapped."""
    fn = functools.partial(_dwt3_single, interpret=interpret)
    for _ in range(x.ndim - 3):
        fn = jax.vmap(fn)
    return fn(x)


def _dwt3_fwd(x, interpret):
    return dwt3_pallas(x, interpret), None


def _dwt3_bwd(interpret, _, g):
    return (idwt3_pallas(g, interpret),)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def idwt3_pallas(bands: jax.Array, interpret: bool = False) -> jax.Array:
    """Inverse of :func:`dwt3_pallas`."""
    fn = functools.partial(_idwt3_single, interpret=interpret)
    for _ in range(bands.ndim - 4):
        fn = jax.vmap(fn)
    return fn(bands)


def _idwt3_fwd(bands, interpret):
    return idwt3_pallas(bands, interpret), None


def _idwt3_bwd(interpret, _, g):
    return (dwt3_pallas(g, interpret),)


dwt3_pallas.defvjp(_dwt3_fwd, _dwt3_bwd)
idwt3_pallas.defvjp(_idwt3_fwd, _idwt3_bwd)


# band-major (8, X/2, ...) ↔ the package's flat band-last (..., 8) layout


def dwt3_flat_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """(..., X, Y, Z, 1) → (..., X/2, Y/2, Z/2, 8) via the Pallas kernel."""
    assert x.shape[-1] == 1, "Pallas path covers the C=1 image case"
    bands = dwt3_pallas(x[..., 0], interpret)  # (..., 8, X/2, Y/2, Z/2)
    return jnp.moveaxis(bands, -4, -1)


def idwt3_flat_pallas(y: jax.Array, interpret: bool = False) -> jax.Array:
    """(..., X/2, Y/2, Z/2, 8) → (..., X, Y, Z, 1)."""
    bands = jnp.moveaxis(y, -1, -4)
    return idwt3_pallas(bands, interpret)[..., None]
