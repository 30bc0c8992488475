"""Pallas fused prologue+conv3d kernel (experimental, PERF.md roadmap #1).

XLA:TPU never fuses producers into convolutions, so every ResBlock pays two
full HBM round-trips materializing `silu(groupnorm(x))` before each 3³ conv
(the dominant cost at level-0 resolution — see PERF.md trace). This kernel
computes

    y = conv3d( silu( (x - mean_c) * inv_c * scale_c + bias_c ), w ) + b

in ONE pass over the input: the normalize+SiLU happens in VMEM on the way
into 27 shifted (Y·Z, Cin)×(Cin, Cout) MXU matmuls.

Structure: grid over X; each program receives the (i-1, i, i+1) input
slices via three BlockSpecs with shifted/clamped index maps (out-of-range
neighbours are gated off with `pl.when`), zero-pads Y/Z in VMEM, and
accumulates the 27 taps into an f32 scratch.

GroupNorm statistics are computed OUTSIDE (a cheap reduction pass) and
passed per-channel — only the expensive apply+activation pass is fused.
Stride 1, kernel 3, SAME padding (the shape used by every ResBlock conv,
`unet.py:228-311`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _kernel(x_prev, x_cur, x_next, w_ref, b_ref, mean_ref, inv_ref,
            scale_ref, bias_ref, out_ref, acc_ref, im_ref, *,
            apply_prologue, fold_taps):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    Y, Z = x_cur.shape[1], x_cur.shape[2]
    C = x_cur.shape[3]

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def tap(ref, dx):
        act = ref[0]
        if apply_prologue:
            xn = (act.astype(_F32) - mean_ref[0]) * inv_ref[0]
            xn = xn * scale_ref[0] + bias_ref[0]
            act = (xn * jax.nn.sigmoid(xn)).astype(act.dtype)  # SiLU
        padded = jnp.pad(act, ((1, 1), (1, 1), (0, 0)))
        if fold_taps:
            # fold the 9 (dy,dz) taps into ONE K=9·C matmul — K=64 alone
            # fills half an MXU tile; K=576 keeps the systolic array busy.
            # Staged through a VMEM scratch (Mosaic cannot concat shifted
            # slices directly: "offset mismatch on non-concat dimension").
            k = 0
            for dy in range(3):
                for dz in range(3):
                    im_ref[:, :, k * C : (k + 1) * C] = padded[
                        dy : dy + Y, dz : dz + Z, :
                    ]
                    k += 1
            acc_ref[:] += jax.lax.dot_general(
                im_ref[:],
                w_ref[dx].reshape(9 * C, -1),
                (((2,), (0,)), ((), ())),
                preferred_element_type=_F32,
            )
        else:
            for dy in range(3):
                for dz in range(3):
                    sl = padded[dy : dy + Y, dz : dz + Z, :]
                    acc_ref[:] += jax.lax.dot_general(
                        sl,
                        w_ref[dx, dy, dz],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=_F32,
                    )

    @pl.when(i > 0)
    def _():
        tap(x_prev, 0)

    tap(x_cur, 1)

    @pl.when(i < n - 1)
    def _():
        tap(x_next, 2)

    out_ref[0] = (acc_ref[:] + b_ref[0].astype(_F32)).astype(out_ref.dtype)


def _conv3d_single(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    mean: jax.Array,
    inv: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    apply_prologue: bool,
    fold_taps: bool = True,
    interpret: bool = False,
) -> jax.Array:
    X, Y, Z, C = x.shape
    Co = w.shape[-1]
    vec = lambda v: v.reshape(1, -1)  # noqa: E731

    kern = functools.partial(
        _kernel, apply_prologue=apply_prologue, fold_taps=fold_taps
    )
    return pl.pallas_call(
        kern,
        grid=(X,),
        in_specs=[
            pl.BlockSpec((1, Y, Z, C),
                         lambda i: (jnp.maximum(i - 1, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, Z, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, Z, C),
                         lambda i: (jnp.minimum(i + 1, X - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 3, C, Co), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Y, Z, Co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Y, Z, Co), _F32),
            pltpu.VMEM((Y, Z, 9 * C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, x, x, w, b.reshape(1, -1), vec(mean), vec(inv), vec(scale), vec(bias))


def _blocked_kernel(prev_ref, cur_ref, next_ref, w_ref, b_ref, mean_ref,
                    inv_ref, scale_ref, bias_ref, out_ref, acc_ref, im_ref,
                    ext_ref, *, apply_prologue, tx):
    """Row-slab variant: each program owns TX output rows; the halo rows
    come in as single-row blocks, so HBM input traffic is (TX+2)/TX× the
    volume instead of the naive 3× of the one-row-per-program scheme."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    _, Y, Z, C = cur_ref.shape

    def pro(act):
        if not apply_prologue:
            return act
        xn = (act.astype(_F32) - mean_ref[0]) * inv_ref[0]
        xn = xn * scale_ref[0] + bias_ref[0]
        return (xn * jax.nn.sigmoid(xn)).astype(act.dtype)

    # extended slab: ext[0] = last row of the previous block (zero at the
    # volume edge — conv zero padding), ext[1:tx+1] = this block,
    # ext[tx+1] = first row of the next block
    first = pro(prev_ref[0])
    ext_ref[0] = jnp.where(i > 0, first, jnp.zeros_like(first))
    for j in range(tx):
        ext_ref[j + 1] = pro(cur_ref[j])
    last = pro(next_ref[0])
    ext_ref[tx + 1] = jnp.where(i < n - 1, last, jnp.zeros_like(last))

    acc_ref[:] = jnp.zeros_like(acc_ref)
    w_flat = [w_ref[d].reshape(9 * C, -1) for d in range(3)]
    for r in range(tx + 2):
        # stage the 9 (dy,dz)-shifted copies of ext row r once
        padded = jnp.pad(ext_ref[r], ((1, 1), (1, 1), (0, 0)))
        k = 0
        for dy in range(3):
            for dz in range(3):
                im_ref[:, :, k * C : (k + 1) * C] = padded[
                    dy : dy + Y, dz : dz + Z, :
                ]
                k += 1
        im = im_ref[:]
        # ext row r feeds output rows j = r - d (input row j+d-1 = r-1)
        for d in range(3):
            j = r - d
            if 0 <= j < tx:
                acc_ref[j] += jax.lax.dot_general(
                    im,
                    w_flat[d],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                )
    out_ref[:] = (acc_ref[:] + b_ref[0].astype(_F32)).astype(out_ref.dtype)


def _conv3d_blocked(
    x, w, b, mean, inv, scale, bias, *, apply_prologue, tx=8,
    interpret=False,
):
    X, Y, Z, C = x.shape
    Co = w.shape[-1]
    assert X % tx == 0, f"X={X} not divisible by block {tx}"
    vec = lambda v: v.reshape(1, -1)  # noqa: E731
    kern = functools.partial(
        _blocked_kernel, apply_prologue=apply_prologue, tx=tx
    )
    nb = X // tx
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, Y, Z, C),
                         lambda i: (jnp.maximum(i * tx - 1, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, Y, Z, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, Z, C),
                         lambda i: (jnp.minimum(i * tx + tx, X - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 3, C, Co), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tx, Y, Z, Co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tx, Y, Z, Co), _F32),
            pltpu.VMEM((Y, Z, 9 * C), x.dtype),
            pltpu.VMEM((tx + 2, Y, Z, C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, x, x, w, b.reshape(1, -1), vec(mean), vec(inv), vec(scale), vec(bias))


def conv3d_fused(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    gn: tuple[jax.Array, jax.Array, jax.Array, jax.Array] | None = None,
    fold_taps: bool = True,
    block_x: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused [GN-apply+SiLU] + 3³ SAME conv.

    ``x``: (..., X, Y, Z, Cin); ``w``: (3,3,3,Cin,Cout); ``b``: (Cout,).
    ``gn``: optional per-channel (mean, inv_std, scale, bias), each (Cin,)
    or broadcastable per-batch (B, Cin) — pass None for a plain conv.
    Leading batch dims are vmapped.
    """
    C = x.shape[-1]
    if gn is None:
        z = jnp.zeros((C,), x.dtype)
        o = jnp.ones((C,), x.dtype)
        mean, inv, scale, bias = z, o, o, z
        apply_prologue = False
    else:
        mean, inv, scale, bias = (a.astype(_F32) for a in gn)
        apply_prologue = True

    if block_x:
        fn = functools.partial(
            _conv3d_blocked,
            apply_prologue=apply_prologue,
            tx=block_x,
            interpret=interpret,
        )
    else:
        fn = functools.partial(
            _conv3d_single,
            apply_prologue=apply_prologue,
            fold_taps=fold_taps,
            interpret=interpret,
        )
    if x.ndim == 4:
        return fn(x, w, b, mean, inv, scale, bias)
    assert x.ndim == 5
    if apply_prologue and mean.ndim == 2:
        scale_b = (
            jnp.broadcast_to(scale, mean.shape) if scale.ndim == 1 else scale
        )
        bias_b = (
            jnp.broadcast_to(bias, mean.shape) if bias.ndim == 1 else bias
        )
        return jax.vmap(
            lambda xi, mi, vi, si, bi: fn(xi, w, b, mi, vi, si, bi)
        )(x, mean, inv, scale_b, bias_b)
    return jax.vmap(lambda xi: fn(xi, w, b, mean, inv, scale, bias))(x)


def group_stats(x: jax.Array, num_groups: int):
    """Per-(batch, channel) GroupNorm mean/inv-std, expanded to channel
    vectors (the cheap reduction pass that stays outside the kernel)."""
    *lead, C = x.shape
    b = x.shape[0]
    g = num_groups
    xf = x.astype(_F32).reshape(b, -1, g, C // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    mean_sq = (xf * xf).mean(axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    expand = lambda a: jnp.broadcast_to(  # noqa: E731
        a, (b, 1, g, C // g)
    ).reshape(b, C)
    return expand(mean), expand(inv)


# ---------------------------------------------------------------------------
# v4: N-packed fused ResBlock conv
# ---------------------------------------------------------------------------
#
# Profiling the production forward (PERF.md round-1 session 2) showed the
# convs run at ~70 TF/s because Cout=64 fills only half the MXU's 128
# lanes, and another ~35 ms/forward goes to the elementwise passes around
# them. v4 packs the three X-taps into one (Y·Z, 9C)×(9C, 3Co) matmul per
# halo row (N=3Co=192 at L0: 117 TF/s measured vs 73 at N=64), normalizes
# rows on the fly (GN-apply+SiLU prologue — no ext scratch), and folds the
# bias / timestep-embedding / residual-skip adds into the epilogue.


def _v4_make_kernel(*, apply_prologue, add_temb, add_skip, tx, pack_n,
                    unroll=False, algo="im2col"):
    def kernel(*refs):
        it = iter(refs)
        prev_ref = next(it); cur_ref = next(it); next_ref = next(it)
        w_ref = next(it); b_ref = next(it)
        if apply_prologue:
            mean_ref = next(it); inv_ref = next(it)
            scale_ref = next(it); bias_ref = next(it)
        if add_temb:
            temb_ref = next(it)
        if add_skip:
            skip_ref = next(it)
        out_ref = next(it)
        acc_ref = next(it); im_ref = next(it)

        i = pl.program_id(0)
        n = pl.num_programs(0)
        _, Y, Z, C = cur_ref.shape
        Co = out_ref.shape[-1]

        def pro(act):
            if apply_prologue:
                xn = (act.astype(_F32) - mean_ref[0]) * inv_ref[0]
                xn = xn * scale_ref[0] + bias_ref[0]
                act = (xn * jax.nn.sigmoid(xn)).astype(act.dtype)
            return act

        acc_ref[:] = jnp.zeros_like(acc_ref)

        # fori_loop (NOT a python unroll: straight-lining tx+2 copies of the
        # staging temporaries overflows VMEM by ~2x)
        def body(r, _):
            static = isinstance(r, int)
            if static:
                src = (
                    prev_ref[0] if r == 0
                    else next_ref[0] if r == tx + 1
                    else cur_ref[r - 1]
                )
            else:
                crow = cur_ref[jnp.clip(r - 1, 0, tx - 1)]
                src = jnp.where(
                    r == 0, prev_ref[0],
                    jnp.where(r == tx + 1, next_ref[0], crow),
                )
            row = pro(src)
            # conv zero padding applies AFTER the prologue: out-of-volume
            # halo rows must be zero in conv-input space (pro(0) != 0)
            if static and r == 0:
                row = jnp.where(i > 0, row, jnp.zeros_like(row))
            elif static and r == tx + 1:
                row = jnp.where(i < n - 1, row, jnp.zeros_like(row))
            elif not static:
                gate = ((r != 0) | (i > 0)) & ((r != tx + 1) | (i < n - 1))
                row = jnp.where(gate, row, jnp.zeros_like(row))
            padded = jnp.pad(row, ((1, 1), (1, 1), (0, 0)))
            if algo == "dzslab":
                # stage only the 3 dz shifts (im_ref is (Y+2, Z, 3C)); the
                # dy shifts come FREE as whole-row slices of the slab's
                # outermost dim feeding 3 K=3C dots
                for dz in range(3):
                    im_ref[:, :, dz * C : (dz + 1) * C] = padded[
                        :, dz : dz + Z, :
                    ]
                res = None
                for dy in range(3):
                    d = jax.lax.dot_general(
                        im_ref[dy : dy + Y],
                        w_ref[dy * 3 * C : (dy + 1) * 3 * C],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=_F32,
                    )
                    res = d if res is None else res + d
            else:
                k = 0
                for dy in range(3):
                    for dz in range(3):
                        im_ref[:, :, k * C : (k + 1) * C] = padded[
                            dy : dy + Y, dz : dz + Z, :
                        ]
                        k += 1
            if algo != "dzslab" and pack_n:
                res = jax.lax.dot_general(
                    im_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                )  # (Y, Z, 3Co)
            for dx in range(3):
                j = r - dx

                def add_part(j, dx):
                    if pack_n or algo == "dzslab":
                        part = res[:, :, dx * Co : (dx + 1) * Co]
                    else:
                        part = jax.lax.dot_general(
                            im_ref[:], w_ref[:, dx * Co : (dx + 1) * Co],
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=_F32,
                        )
                    if isinstance(j, int):
                        acc_ref[j] = acc_ref[j] + part
                    else:
                        jx = pl.ds(jnp.maximum(j, 0), 1)
                        acc_ref[jx] = acc_ref[jx] + part[None]

                if static:
                    if 0 <= j < tx:
                        add_part(j, dx)
                else:
                    pl.when((j >= 0) & (j < tx))(lambda: add_part(j, dx))

            return 0

        if unroll:
            # straight-line variant: lets Mosaic software-pipeline the dots
            # at the cost of per-iteration temporaries (VMEM); only viable
            # at small tx
            for r in range(tx + 2):
                body(r, 0)
        else:
            jax.lax.fori_loop(0, tx + 2, body, 0)

        extra = b_ref[0].astype(_F32)
        if add_temb:
            extra = extra + temb_ref[0]
        for j in range(tx):
            o = acc_ref[j] + extra
            if add_skip:
                o = o + skip_ref[j].astype(_F32)
            out_ref[j] = o.astype(out_ref.dtype)

    return kernel


def _conv3d_v4_single(
    x, w_packed, b, gn, temb, skip, *, tx, pack_n, interpret, vmem_mb,
    unroll=False, algo="im2col",
):
    X, Y, Z, C = x.shape
    Co = w_packed.shape[1] // 3
    assert X % tx == 0, f"X={X} % tx={tx}"
    vec = lambda v: v.reshape(1, -1)  # noqa: E731

    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, (lambda i: (0,) * len(shp)), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((1, Y, Z, C), lambda i: (jnp.maximum(i * tx - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tx, Y, Z, C), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Y, Z, C),
                     lambda i: (jnp.minimum(i * tx + tx, X - 1), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        full(w_packed.shape),
        full((1, Co)),
    ]
    args = [x, x, x, w_packed, vec(b)]
    if gn is not None:
        mean, inv, scale, bias = (a.astype(_F32) for a in gn)
        in_specs += [full((1, C))] * 4
        args += [vec(mean), vec(inv), vec(scale), vec(bias)]
    if temb is not None:
        in_specs.append(full((1, Co)))
        args.append(vec(temb.astype(_F32)))
    if skip is not None:
        in_specs.append(
            pl.BlockSpec((tx, Y, Z, Co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(skip)

    kern = _v4_make_kernel(
        apply_prologue=gn is not None,
        add_temb=temb is not None,
        add_skip=skip is not None,
        tx=tx,
        pack_n=pack_n,
        unroll=unroll,
        algo=algo,
    )
    return pl.pallas_call(
        kern,
        grid=(X // tx,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tx, Y, Z, Co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tx, Y, Z, Co), _F32),
            (
                pltpu.VMEM((Y + 2, Z, 3 * C), x.dtype)
                if algo == "dzslab"
                else pltpu.VMEM((Y, Z, 9 * C), x.dtype)
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def pack_conv_weights(w):
    """(3,3,3,Ci,Co) DHWIO kernel → (9·Ci, 3·Co) with the X-taps stacked on
    N and the (dy,dz,ci) im2col order on K."""
    Co = w.shape[-1]
    return w.transpose(1, 2, 3, 0, 4).reshape(9 * w.shape[3], 3 * Co)


def conv3d_fused_v4(
    x,
    w,
    b,
    *,
    gn=None,
    temb=None,
    skip=None,
    tx: int | None = None,
    pack_n: bool = True,
    unroll: bool = False,
    algo: str = "im2col",
    interpret: bool = False,
    vmem_mb: int = 100,
):
    """Fused [GN-apply+SiLU] → 3³ SAME conv → [+bias +temb +skip].

    ``x``: (B, X, Y, Z, Ci); ``w``: (3,3,3,Ci,Co); ``b``: (Co,).
    ``gn``: per-(batch,)channel (mean, inv, scale, bias) — (Ci,) or (B, Ci).
    ``temb``: per-(batch,)channel add after the conv — (Co,) or (B, Co).
    ``skip``: residual tensor (B, X, Y, Z, Co) added in the epilogue.
    """
    assert x.ndim == 5
    C = x.shape[-1]
    if tx is None:
        tx = 8 if C <= 64 else 4
    w_packed = pack_conv_weights(w).astype(x.dtype)
    b = b.astype(_F32)

    def one(xi, gni, tembi, skipi):
        return _conv3d_v4_single(
            xi, w_packed, b, gni, tembi, skipi,
            tx=tx, pack_n=pack_n, interpret=interpret, vmem_mb=vmem_mb,
            unroll=unroll, algo=algo,
        )

    def bcast(v, width):
        if v is None:
            return None
        v = jnp.asarray(v)
        if v.ndim == 1:
            v = jnp.broadcast_to(v, (x.shape[0], width))
        return v

    gn_b = None
    if gn is not None:
        gn_b = tuple(bcast(a, C) for a in gn)
    temb_b = bcast(temb, w.shape[-1])

    outs = []
    for bi in range(x.shape[0]):  # batch is 1-2 at these volume sizes
        gni = tuple(a[bi] for a in gn_b) if gn_b is not None else None
        tembi = temb_b[bi] if temb_b is not None else None
        skipi = skip[bi] if skip is not None else None
        outs.append(one(x[bi], gni, tembi, skipi))
    return jnp.stack(outs)
