"""InceptionV3 (FID variant) in JAX/flax, NHWC — the feature network behind
the reference's TorchMetrics MiFID/FID scores (EVAL/eval/mifid.py:39-48,
which wraps torch-fidelity's FeatureExtractorInceptionV3 with the canonical
``pt_inception-2015-12-05`` weights).

Replicated architecture details (the FID variant differs from torchvision):
- BasicConv2d = bias-free conv + BatchNorm(eps=1e-3, inference) + ReLU;
- InceptionA/C and E_1 pool branches use avg-pool(3, s1, p1) with
  count_include_pad=False; E_2 (the last block) uses MAX-pool there;
- input pipeline: uint8 [0,255] → float → (x − 128) / 128 (torch-fidelity
  normalization), bilinear 299² (the EVAL datasets already resize on load,
  EVAL/eval/datasets.py:60);
- output: 2048-d global-average pool3 features.

Weights: ``load_torch_inception_weights`` converts the torch-fidelity /
pytorch-fid state dict (.pth, loaded via torch CPU) or a pre-converted
``.npz`` into the flax param tree. There is NO random-weight fallback for
scoring — FID against random features is meaningless, so construction
without weights is allowed only with ``allow_random=True`` (tests).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_DIMS = ("NHWC", "HWIO", "NHWC")


def _max_pool(x, window=3, stride=2, padding="VALID"):
    pad = ((0, 0), (1, 1), (1, 1), (0, 0)) if padding == "SAME1" else "VALID"
    if padding == "SAME1":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, window, window, 1),
            (1, stride, stride, 1), pad,
        )
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID",
    )


def _avg_pool_3x3_s1_exclude_pad(x):
    """avg_pool(3, stride 1, pad 1, count_include_pad=False) — the FID
    variant's pool-branch pooling."""
    window = (1, 3, 3, 1)
    strides = (1, 1, 1, 1)
    padding = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, padding)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, padding)
    return summed / counts


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3, inference stats) + ReLU."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_c = x.shape[-1]
        # He init keeps random-weight activations O(1) through the ~90-conv
        # stack (only relevant for allow_random test mode; real runs load
        # the canonical weights)
        kernel = self.param(
            "conv_kernel", nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (kh, kw, in_c, self.features), jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=self.strides,
            padding=((self.padding[0],) * 2, (self.padding[1],) * 2),
            dimension_numbers=_DIMS,
        )
        gamma = self.param("bn_scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bn_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.features,), jnp.float32)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return jax.nn.relu(y)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1_exclude_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1_exclude_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (Mixed_7b) | 'max' (Mixed_7c, FID variant)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, "SAME1")
        else:
            bp = _avg_pool_3x3_s1_exclude_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Full FID feature net: uint8-normalized input → 2048-d pool3."""

    @nn.compact
    def __call__(self, x):
        # x: float NHWC in [-1, 1] at 299×299
        if x.shape[1] < 75 or x.shape[2] < 75:
            raise ValueError(
                f"InceptionV3 needs inputs ≥75×75 (got {x.shape[1]}×{x.shape[2]}); "
                "smaller images collapse to empty feature maps in Mixed_7a."
            )
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool → (N, 2048)


def preprocess_uint8(u8_nhwc: jnp.ndarray) -> jnp.ndarray:
    """torch-fidelity input normalization: (float(x) − 128) / 128."""
    return (u8_nhwc.astype(jnp.float32) - 128.0) / 128.0


# --------------------------------------------------------------------------- #
# Weight conversion

def _convert_torch_state_dict(sd: dict) -> dict:
    """torch-fidelity / pytorch-fid InceptionV3 state dict → flax params.

    torch names: ``Mixed_5b.branch1x1.conv.weight`` (OIHW),
    ``....bn.{weight,bias,running_mean,running_var}``. flax names:
    ``params[Mixed_5b][branch1x1][{conv_kernel,bn_scale,bn_bias,bn_mean,bn_var}]``.
    """
    params: dict = {}

    def put(path: list[str], leaf: str, value: np.ndarray):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for name, tensor in sd.items():
        value = np.asarray(tensor)
        parts = name.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(parts[:-2], "conv_kernel", value.transpose(2, 3, 1, 0))  # OIHW→HWIO
        elif parts[-2] == "bn":
            leaf = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(parts[-1])
            if leaf is None:  # num_batches_tracked etc.
                continue
            put(parts[:-2], leaf, value)
        elif parts[0] in ("fc", "AuxLogits"):
            continue  # classifier head unused for pool3 features
        # silently skip anything else (e.g. resize buffers)
    return params


def load_torch_inception_weights(path: str | Path) -> dict:
    """Load FID InceptionV3 weights from a torch ``.pth`` state dict or a
    pre-converted ``.npz`` (flat 'a/b/c' keys)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(
            f"Inception weights not found: {path}. Provide the torch-fidelity "
            "pt_inception-2015-12-05 state dict (.pth) or a converted .npz."
        )
    if path.suffix == ".npz":
        flat = np.load(path)
        params: dict = {}
        for key in flat.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = flat[key]
        return params
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return _convert_torch_state_dict(sd)


def save_converted_weights(params: dict, path: str | Path):
    """Save a flax param tree as a flat .npz for fast reload."""
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez_compressed(path, **flat)


class InceptionFID:
    """Jitted 2048-d feature extractor.

    ``weights_path=None`` requires ``allow_random=True`` and yields random
    features — ONLY for pipeline tests, never for reportable scores.

    ``mesh`` (a ``parallel.mesh.MeshContext``) turns the forward into a
    data-parallel GSPMD program: params replicated, the uint8 batch sharded
    along its leading axis, features returned batch-sharded (the host gather
    happens in ``features_u8``). With a 1-device mesh (or ``None``) the
    program is the single-chip one — same math either way, per-row identical.
    """

    def __init__(self, weights_path: str | Path | None = None,
                 allow_random: bool = False, mesh=None):
        self.module = InceptionV3FID()
        self.randomly_initialized = weights_path is None
        self.mesh = mesh if (mesh is not None and mesh.num_devices > 1) else None
        if weights_path is not None:
            self.params = load_torch_inception_weights(weights_path)
            self._validate_params()
        else:
            if not allow_random:
                raise ValueError(
                    "InceptionFID needs the canonical FID weights for "
                    "meaningful scores. Pass weights_path (pt_inception .pth "
                    "or converted .npz), or allow_random=True for pipeline "
                    "tests only."
                )
            # jitted init: eager flax .init dispatches hundreds of tiny ops
            # (minutes over a remote-device tunnel); fused it is sub-second
            self.params = jax.jit(lambda: self.module.init(
                jax.random.key(0), jnp.zeros((1, 299, 299, 3), jnp.float32)
            )["params"])()
        jit_kwargs = {}
        if self.mesh is not None:
            # replicate params across the mesh once; shard the batch axis of
            # input and output so each device runs its rows (DP eval — the
            # reference's single-GPU extractor has no equivalent layer)
            self.params = jax.device_put(self.params, self.mesh.replicated())
            jit_kwargs = {
                "in_shardings": self.mesh.batch_sharding(4),
                "out_shardings": self.mesh.batch_sharding(2),
            }
        self._features = jax.jit(
            lambda u8: self.module.apply({"params": self.params},
                                         preprocess_uint8(u8)),
            **jit_kwargs,
        )

    def _validate_params(self):
        template = jax.eval_shape(
            lambda: self.module.init(jax.random.key(0),
                                     jnp.zeros((1, 299, 299, 3), jnp.float32))
        )["params"]
        t_leaves = dict(_iter_leaves(template))
        g_leaves = dict(_iter_leaves(self.params))
        missing = t_leaves.keys() - g_leaves.keys()
        extra = g_leaves.keys() - t_leaves.keys()
        if missing or extra:
            raise ValueError(
                f"Converted Inception weights do not match the architecture; "
                f"missing={sorted(missing)[:5]}… extra={sorted(extra)[:5]}…"
            )
        bad_shapes = [
            f"{p}: {tuple(np.shape(g_leaves[p]))} != {tuple(t_leaves[p].shape)}"
            for p in t_leaves
            if tuple(np.shape(g_leaves[p])) != tuple(t_leaves[p].shape)
        ]
        if bad_shapes:
            raise ValueError(
                "Converted Inception weights have wrong leaf shapes "
                f"(truncated or foreign checkpoint?): {bad_shapes[:5]}…"
            )

    def features_u8(self, u8_nhwc: np.ndarray) -> np.ndarray:
        """uint8 NHWC batch (299×299) → (N, 2048) float32 features."""
        return np.asarray(self._features(u8_nhwc))


def _iter_leaves(tree, prefix=""):
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _iter_leaves(v, key)
        else:
            yield key, v
