"""InceptionV3 feature extractor for FID, in JAX.

The reference computes rFID with pytorch_fid when installed, else a
manual torchvision InceptionV3 pass (tools/test_reconstruction_hf.py:98-176).
This implements the InceptionV3 feature graph (pool3, 2048-d) with a
converter from either weight set:

  * **fid variant** (pytorch_fid's pt_inception-2015-12-05): input in
    [0,1] is scaled to [-1,1]; InceptionA/C pool branches use
    count_include_pad=False average pooling; InceptionE_2 (Mixed_7c)
    uses max pooling in its pool branch. This is what the published
    FID/rFID numbers are defined on.
  * **torchvision IMAGENET1K_V1**: the reference's manual fallback.

Weights load from ``$VTP_INCEPTION_WEIGHTS`` (a torch .pt/.pth state
dict); without them, callers degrade gracefully exactly like the
reference does without pytorch_fid.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Dict[str, jnp.ndarray]]


def inception_available() -> bool:
    return _find_weights() is not None


def _find_weights() -> Optional[str]:
    for p in (
        os.environ.get("VTP_INCEPTION_WEIGHTS", ""),
        os.path.expanduser("~/.cache/vtp_tpu/pt_inception-2015-12-05.pth"),
        os.path.expanduser("~/.cache/vtp_tpu/inception_v3.pth"),
    ):
        if p and os.path.exists(p):
            return p
    return None


# ------------------------------------------------------------ primitives


def _conv_bn(x: jax.Array, p: Dict, stride=1, padding=(0, 0)) -> jax.Array:
    """BasicConv2d: conv(no bias) + BN(eps=1e-3, inference) + relu."""
    if isinstance(padding, int):
        padding = (padding, padding)
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    scale = p["gamma"] * jax.lax.rsqrt(p["var"] + 1e-3)
    out = out * scale[None, :, None, None] + (p["beta"] - p["mean"] * scale)[None, :, None, None]
    return jax.nn.relu(out)


def _maxpool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )


def _avgpool3(x, count_include_pad: bool) -> jax.Array:
    """3x3 stride-1 pad-1 average pool."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1)),
    )
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1)),
    )
    return s / counts


# --------------------------------------------------------------- blocks


def _inception_a(x, p, fid: bool):
    b1 = _conv_bn(x, p["branch1x1"])
    b5 = _conv_bn(_conv_bn(x, p["branch5x5_1"]), p["branch5x5_2"], padding=2)
    b3 = _conv_bn(x, p["branch3x3dbl_1"])
    b3 = _conv_bn(b3, p["branch3x3dbl_2"], padding=1)
    b3 = _conv_bn(b3, p["branch3x3dbl_3"], padding=1)
    bp = _conv_bn(_avgpool3(x, count_include_pad=not fid), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(x, p):
    b3 = _conv_bn(x, p["branch3x3"], stride=2)
    bd = _conv_bn(x, p["branch3x3dbl_1"])
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bd = _conv_bn(bd, p["branch3x3dbl_3"], stride=2)
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=1)


def _inception_c(x, p, fid: bool):
    b1 = _conv_bn(x, p["branch1x1"])
    b7 = _conv_bn(x, p["branch7x7_1"])
    b7 = _conv_bn(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = _conv_bn(b7, p["branch7x7_3"], padding=(3, 0))
    bd = _conv_bn(x, p["branch7x7dbl_1"])
    bd = _conv_bn(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = _conv_bn(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = _conv_bn(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = _conv_bn(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = _conv_bn(_avgpool3(x, count_include_pad=not fid), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(x, p):
    b3 = _conv_bn(_conv_bn(x, p["branch3x3_1"]), p["branch3x3_2"], stride=2)
    b7 = _conv_bn(x, p["branch7x7x3_1"])
    b7 = _conv_bn(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = _conv_bn(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = _conv_bn(b7, p["branch7x7x3_4"], stride=2)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=1)


def _inception_e(x, p, pool: str, fid: bool):
    b1 = _conv_bn(x, p["branch1x1"])
    b3 = _conv_bn(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        _conv_bn(b3, p["branch3x3_2a"], padding=(0, 1)),
        _conv_bn(b3, p["branch3x3_2b"], padding=(1, 0)),
    ], axis=1)
    bd = _conv_bn(x, p["branch3x3dbl_1"])
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate([
        _conv_bn(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
        _conv_bn(bd, p["branch3x3dbl_3b"], padding=(1, 0)),
    ], axis=1)
    if pool == "max":  # pytorch_fid's FIDInceptionE_2 (Mixed_7c)
        bp = _maxpool(x, k=3, s=1, pad=1)
    else:
        bp = _avgpool3(x, count_include_pad=not fid)
    bp = _conv_bn(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


# -------------------------------------------------------------- network


def inception_features(params: Params, x: jax.Array, *, fid_variant: bool = True) -> jax.Array:
    """(B, 3, H, W) in [0, 1] -> (B, 2048) pool3 features.

    Input is bilinearly resized to 299 and, in the fid variant, scaled
    to [-1, 1] (pytorch_fid semantics).
    """
    x = x.astype(jnp.float32)
    if x.shape[2] != 299 or x.shape[3] != 299:
        x = jax.image.resize(x, (x.shape[0], 3, 299, 299), "bilinear")
    if fid_variant:
        x = 2.0 * x - 1.0

    x = _conv_bn(x, params["Conv2d_1a_3x3"], stride=2)
    x = _conv_bn(x, params["Conv2d_2a_3x3"])
    x = _conv_bn(x, params["Conv2d_2b_3x3"], padding=1)
    x = _maxpool(x)
    x = _conv_bn(x, params["Conv2d_3b_1x1"])
    x = _conv_bn(x, params["Conv2d_4a_3x3"])
    x = _maxpool(x)
    x = _inception_a(x, params["Mixed_5b"], fid_variant)
    x = _inception_a(x, params["Mixed_5c"], fid_variant)
    x = _inception_a(x, params["Mixed_5d"], fid_variant)
    x = _inception_b(x, params["Mixed_6a"])
    x = _inception_c(x, params["Mixed_6b"], fid_variant)
    x = _inception_c(x, params["Mixed_6c"], fid_variant)
    x = _inception_c(x, params["Mixed_6d"], fid_variant)
    x = _inception_c(x, params["Mixed_6e"], fid_variant)
    x = _inception_d(x, params["Mixed_7a"])
    x = _inception_e(x, params["Mixed_7b"], "avg", fid_variant)
    x = _inception_e(x, params["Mixed_7c"], "max" if fid_variant else "avg", fid_variant)
    return jnp.mean(x, axis=(2, 3))  # adaptive avg pool -> (B, 2048)


# ------------------------------------------------------------- converter


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """torch state dict (torchvision or pytorch_fid naming) -> params."""
    params: Params = {}
    prefixes = set()
    for k in sd:
        if ".conv.weight" in k:
            prefixes.add(k[: -len(".conv.weight")])
    for pref in prefixes:
        block_path = pref.split(".")
        # e.g. "Mixed_5b.branch1x1" or "Conv2d_1a_3x3"
        top = block_path[0]
        leaf = ".".join(block_path[1:]) if len(block_path) > 1 else None
        entry = {
            "w": jnp.asarray(sd[f"{pref}.conv.weight"], jnp.float32),
            "gamma": jnp.asarray(sd[f"{pref}.bn.weight"], jnp.float32),
            "beta": jnp.asarray(sd[f"{pref}.bn.bias"], jnp.float32),
            "mean": jnp.asarray(sd[f"{pref}.bn.running_mean"], jnp.float32),
            "var": jnp.asarray(sd[f"{pref}.bn.running_var"], jnp.float32),
        }
        if leaf is None:
            params[top] = entry
        else:
            params.setdefault(top, {})[leaf] = entry
    return params


def load_inception_feature_fn(weights_path: Optional[str] = None, *, fid_variant: bool = True):
    """Returns a jitted ``feature_fn(images01_nchw) -> (B, 2048)`` or
    raises when weights are unavailable."""
    path = weights_path or _find_weights()
    if path is None:
        raise FileNotFoundError(
            "Inception weights not found; set VTP_INCEPTION_WEIGHTS to a "
            "pytorch_fid pt_inception-2015-12-05.pth or torchvision "
            "inception_v3 state dict."
        )
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = convert_inception_state_dict(sd)
    fn = jax.jit(lambda x: inception_features(params, x, fid_variant=fid_variant))
    return fn
