"""Probe: are int8 convolutions faster than bf16 on this TPU?

Decides whether an int8-quantized serving path is worth building: the v5e
MXU's int8 rate is nominally 2x bf16, but that only materializes if XLA
lowers int8 convs onto it. Times the serving forward's dominant conv shapes
(ResNet-9 generator at 256^2) in bf16 vs int8(+int32 accum), scalar-fetch
timing (block_until_ready is unreliable over the axon tunnel - docs/PERF.md).

Usage: python scripts/probe_int8_conv.py [--batch 64] [--iters 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gan_variant_research_tpu.core.cache import enable_persistent_cache


SHAPES = [
    # (name, input NHWC, kernel HWIO, strides)
    ("trunk3x3 x18", (0, 66, 66, 256), (3, 3, 256, 256), (1, 1)),
    ("down0", (0, 258, 258, 64), (3, 3, 64, 128), (2, 2)),
    ("down1", (0, 130, 130, 128), (3, 3, 128, 256), (2, 2)),
    ("stem_s2d", (0, 134, 134, 12), (4, 4, 12, 256), (1, 1)),
]


def conv_fn(strides, dtype, accum):
    @jax.jit
    def f(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, strides, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=accum,
        )
        return jnp.sum(y.astype(jnp.float32))

    return f


def time_fn(f, x, k, iters):
    float(f(x, k))  # compile + warm
    float(f(x, k))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(x, k)
    float(s)
    # scalar-fetch each iter would serialize the tunnel; fetch once and
    # divide - the dispatch queue drains on the final fetch
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} batch={args.batch}")

    for name, ishape, kshape, strides in SHAPES:
        ishape = (args.batch,) + ishape[1:]
        x32 = rng.standard_normal(ishape, dtype=np.float32)
        k32 = rng.standard_normal(kshape, dtype=np.float32) / np.sqrt(
            np.prod(kshape[:3]))
        rows = []
        for tag, dt, accum in [
            ("bf16", jnp.bfloat16, jnp.float32),
            ("int8", jnp.int8, jnp.int32),
        ]:
            if dt == jnp.int8:
                x = jnp.asarray(np.clip(x32 * 40, -127, 127).astype(np.int8))
                k = jnp.asarray(np.clip(k32 * 400, -127, 127).astype(np.int8))
            else:
                x = jnp.asarray(x32, dt)
                k = jnp.asarray(k32, dt)
            f = conv_fn(strides, dt, accum)
            ms = time_fn(f, x, k, args.iters)
            rows.append((tag, ms))
            print(f"  {name:14s} {tag}: {ms:8.3f} ms")
        b, i = rows[0][1], rows[1][1]
        print(f"  {name:14s} int8/bf16 speedup: {b / i:0.2f}x")


if __name__ == "__main__":
    main()
