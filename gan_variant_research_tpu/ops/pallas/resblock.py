"""Pallas TPU kernels for the generator's hot pattern: reflect-pad + 3×3
conv (the №1 pattern — 9 residual blocks × 2 convs at 64×64×4·ngf,
SURVEY.md §2.4).

XLA materializes every reflect-padded tensor (measured ~30 ms/step of pad
copies at B=32, 256²) and lowers the pad backward to slice+add passes
(~18 ms/step). Here the pad never exists in HBM:

- ``reflect_conv3x3``: forward kernel, grid (N, Cout/128). The padded
  input is built in VMEM from the sample's block; the conv runs as nine
  shifted (H·W, Cin)×(Cin, 128) MXU matmuls with fp32 accumulation.
- input grad: same kernel shape on the zero-padded cotangent with the
  spatially-flipped, io-swapped kernel, with the reflect-pad transpose
  (edge fold) applied in-kernel.
- weight grad: grid (N,) accumulating nine (H·W, Cin)ᵀ(H·W, Cout) matmuls
  into a revisited fp32 output block (classic Pallas reduction pattern).

Instance norm / ReLU / the residual add stay in XLA — they fuse into
single elementwise passes there. ``resblock_reference`` is the pure-XLA
oracle used by the tests and as the fallback path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# --------------------------------------------------------------------------- #
# Pure-XLA oracle / fallback

def _instance_norm_hw(h, eps):
    mean = jnp.mean(h, axis=(0, 1), keepdims=True)
    var = jnp.mean(jax.lax.square(h - mean), axis=(0, 1), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (h - mean) * rstd, mean, rstd


def resblock_reference(x, w1, b1, w2, b2, eps: float = 1e-5):
    """Reference residual block (reflect pad, IN, ReLU, biased convs) in
    plain XLA; the test oracle for the kernels."""

    def one(xi):
        xf = xi.astype(jnp.float32)

        def conv(inp, w, b):
            xp = jnp.pad(inp, ((1, 1), (1, 1), (0, 0)), mode="reflect")
            y = jax.lax.conv_general_dilated(
                xp[None], w.astype(jnp.float32), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )[0]
            return y + b.astype(jnp.float32)

        h1 = conv(xf, w1, b1)
        n1, _, _ = _instance_norm_hw(h1, eps)
        a1 = jax.nn.relu(n1)
        h2 = conv(a1, w2, b2)
        n2, _, _ = _instance_norm_hw(h2, eps)
        return (xf + n2).astype(x.dtype)

    return jax.vmap(one)(x)


# --------------------------------------------------------------------------- #
# Forward kernel: reflect-pad + conv3×3

def _row_chunk(rows: int, target: int = 8) -> int:
    """Largest divisor of ``rows`` that is ≤ target (row-chunked conv)."""
    for r in range(min(target, rows), 0, -1):
        if rows % r == 0:
            return r
    return 1


def _chunked_conv(xp_ref, w_ref, out_rows: int, width: int,
                  c_in: int, c_out: int, write_chunk):
    """Row-chunked 3×3 correlation over a VMEM-resident padded input ref.

    Mosaic only allows dynamic slice offsets on untiled leading dims, so
    the row loop uses pl.ds on dim 0 while the 3×3 taps are STATIC slices
    of each small (R+2, W+2, Cin) chunk value — one chunk of shifted
    copies live at a time keeps the VMEM stack bounded (a fully unrolled
    whole-plane version allocated 9 full shifted copies ⇒ 37 MB).

    ``write_chunk(row_start, acc)`` stores each (R·width, c_out) fp32
    result."""
    r_step = _row_chunk(out_rows)

    def chunk(ci, _):
        r = ci * r_step
        xs = xp_ref[pl.ds(r, r_step + 2), :, :]
        acc = jnp.zeros((r_step * width, c_out), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = xs[dy : dy + r_step, dx : dx + width, :]
                acc = acc + jnp.dot(
                    sl.reshape(r_step * width, c_in), w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                )
        write_chunk(r, r_step, acc)
        return 0

    jax.lax.fori_loop(0, out_rows // r_step, chunk, 0)


def _reflect_pad_vals(v):
    rows = jnp.concatenate([v[1:2], v, v[-2:-1]], axis=0)
    return jnp.concatenate([rows[:, 1:2], rows, rows[:, -2:-1]], axis=1)


def _store_reflect_pad(xp_ref, x):
    """Fill a (H+2, W+2, C) scratch ref with reflect_pad(x) using in-place
    static-slice writes (concatenate-based padding materialized ~4.5 MB of
    value temporaries and blew the VMEM stack)."""
    h, width, _ = x.shape
    xp_ref[1 : h + 1, 1 : width + 1, :] = x
    # rows from the interior, then cols from the row-padded result
    xp_ref[0:1, 1 : width + 1, :] = x[1:2]
    xp_ref[h + 1 : h + 2, 1 : width + 1, :] = x[h - 2 : h - 1]
    xp_ref[:, 0:1, :] = xp_ref[:, 2:3, :]
    xp_ref[:, width + 1 : width + 2, :] = xp_ref[:, width - 1 : width, :]


def _store_zero_pad2(zp_ref, v):
    h, width, c = v.shape
    zp_ref[:] = jnp.zeros_like(zp_ref)
    zp_ref[2 : h + 2, 2 : width + 2, :] = v


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, xp_ref):
    x = x_ref[0]
    h, width, c_in = x.shape
    cb = out_ref.shape[-1]
    _store_reflect_pad(xp_ref, x)
    b = b_ref[0].astype(jnp.float32)

    def write(r, r_step, acc):
        out_ref[0, pl.ds(r, r_step), :, :] = (
            (acc + b).reshape(r_step, width, cb).astype(out_ref.dtype)
        )

    _chunked_conv(xp_ref, w_ref, h, width, c_in, cb, write)


def _fwd_pallas(x, w, b):
    n, h, width, c_in = x.shape
    c_out = w.shape[-1]
    co_blocks = max(1, c_out // _LANES)
    cb = c_out // co_blocks
    return pl.pallas_call(
        _fwd_kernel,
        interpret=_interpret(),
        grid=(n, co_blocks),
        in_specs=[
            pl.BlockSpec((1, h, width, c_in), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c_in, cb), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, width, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, width, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, width + 2, c_in), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * width * c_in * c_out,
            bytes_accessed=2 * n * h * width * (c_in + c_out),
            transcendentals=0,
        ),
    )(x, w.astype(x.dtype), b.reshape(1, c_out).astype(jnp.float32))


# --------------------------------------------------------------------------- #
# Input-gradient kernel: full correlation with flipped kernel + reflect fold

def _zero_pad2_vals(v):
    h, width, c = v.shape
    z_row = jnp.zeros((2, width, c), v.dtype)
    rows = jnp.concatenate([z_row, v, z_row], axis=0)
    z_col = jnp.zeros((h + 4, 2, c), v.dtype)
    return jnp.concatenate([z_col, rows, z_col], axis=1)


def _fold_reflect_vals(gp):
    """(H+2, W+2, C) cotangent of a reflect-pad → (H, W, C): crop and add
    the border rows/cols onto their reflection sources (cols then rows —
    the forward pads rows first, cols second)."""
    g = gp[:, 1:-1, :]
    col_l = gp[:, 0:1, :]
    col_r = gp[:, -1:, :]
    g = jnp.concatenate([g[:, :1], g[:, 1:2] + col_l, g[:, 2:-2],
                         g[:, -2:-1] + col_r, g[:, -1:]], axis=1)
    top = g[0:1]
    bot = g[-1:]
    g = g[1:-1]
    g = jnp.concatenate([g[:1], g[1:2] + top, g[2:-2], g[-2:-1] + bot,
                         g[-1:]], axis=0)
    return g


def _dx_kernel(dy_ref, wf_ref, out_ref, zp_ref, dxp_ref):
    dy = dy_ref[0]
    h, width, c_out = dy.shape
    cb = out_ref.shape[-1]
    _store_zero_pad2(zp_ref, dy)                  # (H+4, W+4, Cout)

    def write(r, r_step, acc):
        dxp_ref[pl.ds(r, r_step), :, :] = acc.reshape(
            r_step, width + 2, cb
        ).astype(dxp_ref.dtype)

    # full correlation gives the padded-input grad (H+2, W+2, CinB)
    _chunked_conv(zp_ref, wf_ref, h + 2, width + 2, c_out, cb, write)
    out_ref[0] = _fold_reflect_vals(dxp_ref[:]).astype(out_ref.dtype)


def _dx_pallas(dy, w):
    n, h, width, c_out = dy.shape
    c_in = w.shape[2]
    ci_blocks = max(1, c_in // _LANES)
    cb = c_in // ci_blocks
    # flipped, io-swapped kernel: (3, 3, Cout, Cin)
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(dy.dtype)
    return pl.pallas_call(
        _dx_kernel,
        interpret=_interpret(),
        grid=(n, ci_blocks),
        in_specs=[
            pl.BlockSpec((1, h, width, c_out), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c_out, cb), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, width, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, width, c_in), dy.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 4, width + 4, c_out), dy.dtype),
            # bf16 staging keeps the kernel under the 16 MB VMEM budget;
            # the incoming cotangent is bf16 anyway
            pltpu.VMEM((h + 2, width + 2, cb), dy.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * (h + 2) * (width + 2) * c_in * c_out,
            bytes_accessed=2 * n * h * width * (c_in + c_out),
            transcendentals=0,
        ),
    )(dy, w_flip)


# --------------------------------------------------------------------------- #
# Weight-gradient kernel: grid (N,) accumulating into a revisited block

def _dw_kernel(x_ref, dy_ref, out_ref, xp_ref):
    i = pl.program_id(0)
    x = x_ref[0]
    h, width, c_in = x.shape
    c_out = dy_ref.shape[-1]
    _store_reflect_pad(xp_ref, x)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r_step = _row_chunk(h)

    def chunk(ci, _):
        r = ci * r_step
        xs = xp_ref[pl.ds(r, r_step + 2), :, :]
        dyc = dy_ref[0, pl.ds(r, r_step), :, :].reshape(r_step * width, c_out)
        for ddy in range(3):
            for ddx in range(3):
                sl = xs[ddy : ddy + r_step, ddx : ddx + width, :]
                part = jax.lax.dot_general(
                    sl.reshape(r_step * width, c_in), dyc,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_ref[ddy, ddx] += part
        return 0

    jax.lax.fori_loop(0, h // r_step, chunk, 0)


def _dw_pallas(x, dy):
    n, h, width, c_in = x.shape
    c_out = dy.shape[-1]
    return pl.pallas_call(
        _dw_kernel,
        interpret=_interpret(),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, width, c_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, width, c_out), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, c_in, c_out), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, c_in, c_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2, width + 2, c_in), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * width * c_in * c_out,
            bytes_accessed=2 * n * h * width * (c_in + c_out) + 4 * 9 * c_in * c_out,
            transcendentals=0,
        ),
    )(x, dy)


# --------------------------------------------------------------------------- #
# Differentiable fused op

def _xla_reflect_pad_transpose(gp):
    """XLA reflect-pad transpose: crop + fold borders (slice/add fusions)."""
    g = gp[:, :, 1:-1, :]
    g = g.at[:, :, 1, :].add(gp[:, :, 0, :])
    g = g.at[:, :, -2, :].add(gp[:, :, -1, :])
    top, mid, bot = g[:, 0], g[:, 1:-1], g[:, -1]
    mid = mid.at[:, 1].add(top)
    mid = mid.at[:, -2].add(bot)
    return mid


def _xla_data_grad(dy, w):
    """Grad w.r.t. the reflect-padded conv input: full correlation with the
    flipped, io-swapped kernel, then the pad transpose."""
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(dy.dtype)
    dxp = jax.lax.conv_general_dilated(
        dy, w_flip, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _xla_reflect_pad_transpose(dxp)


def _xla_weight_grad(x, dy):
    """dW[kh,kw,ci,co] = Σ xp[n,h+kh,w+kw,ci]·dy[n,h,w,co] as nine
    (N·H·W, Cin)ᵀ(N·H·W, Cout) matmuls (XLA fuses these onto the MXU)."""
    n, h, width, c_in = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    dyf = dy.reshape(-1, dy.shape[-1])
    rows = []
    for kh in range(3):
        row = []
        for kw in range(3):
            sl = xp[:, kh : kh + h, kw : kw + width, :].reshape(-1, c_in)
            row.append(jnp.einsum("ic,io->co", sl, dyf,
                                  preferred_element_type=jnp.float32))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)  # (3, 3, Cin, Cout)


@jax.custom_vjp
def reflect_conv3x3(x, w, b):
    """reflect_pad(1) + 3×3 valid conv + bias, NHWC. Forward is the fused
    Pallas kernel (the pad never exists in HBM); backward uses XLA's conv
    grad formulations — the all-Pallas backward (``_dx_pallas`` /
    ``_dw_pallas``, kept for benchmarking) measured slower end-to-end than
    XLA's batched grad convs. ``w`` is HWIO, ``b`` (Cout,)."""
    return _fwd_pallas(x, w, b)


def _rc_fwd(x, w, b):
    return _fwd_pallas(x, w, b), (x, w)


def _rc_bwd(res, g):
    x, w = res
    g_cast = g.astype(x.dtype)
    dx = _xla_data_grad(g_cast, w)
    dw = _xla_weight_grad(x, g_cast)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(jnp.float32)


reflect_conv3x3.defvjp(_rc_fwd, _rc_bwd)


def fused_resblock(x, w1, b1, w2, b2, eps: float = 1e-5):
    """Residual block built on the fused pad+conv kernels; IN/ReLU/add stay
    in XLA (single fused elementwise passes). Differentiable end-to-end."""
    from gan_variant_research_tpu.ops.nn_ops import instance_norm

    h1 = reflect_conv3x3(x, w1, b1)
    a1 = jax.nn.relu(instance_norm(h1, eps))
    h2 = reflect_conv3x3(a1, w2, b2)
    return x + instance_norm(h2, eps)


def resblock_supported(shape, c_in: int, c_out: int | None = None) -> bool:
    """Pallas-path eligibility: lane-aligned channels and per-sample blocks
    that fit VMEM with double buffering."""
    c_out = c_out if c_out is not None else c_in
    _, h, width, _ = shape
    if c_in % _LANES != 0 or c_out % _LANES != 0:
        return False
    # x block + padded copy + out block (double-buffered) + weights + acc
    per_sample = (
        2 * h * width * c_in * 2          # x block ×2 (pipeline)
        + (h + 2) * (width + 2) * c_in * 2  # padded copy
        + 2 * h * width * _LANES * 2      # out block ×2
        + 9 * c_in * _LANES * 2           # weight block
        + h * width * _LANES * 4          # fp32 accumulator
    )
    return per_sample < 13 * 1024 * 1024
