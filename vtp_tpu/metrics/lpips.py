"""LPIPS (VGG16 flavor) in JAX.

Behavioral reference: ``vtp/utils/lpips.py:61-175`` (the LightningDiT
LPIPS): scale inputs, run VGG16 features, tap the five relu outputs,
channel-unit-normalize, squared diff, 1x1 learned linear heads, spatial
mean, sum over taps.

Weights cannot be auto-downloaded here (zero egress); provide them via
``$VTP_LPIPS_WEIGHTS`` pointing at either a full LPIPS state dict or a
directory with ``vgg16.pth`` (torchvision) + ``vgg.pth`` (lin heads).
Without weights, callers should gate on ``lpips_available()`` — the same
graceful degradation the reference applies to torchmetrics/pytorch_fid.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 ``features`` conv indices and channel plan
_VGG_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_POOL_BEFORE = {5, 10, 17, 24}  # conv indices preceded by 2x2 maxpool
_TAPS = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}  # feature idx (after relu) -> tap
_TAP_AFTER_CONV = {2: 0, 7: 1, 14: 2, 21: 3, 28: 4}
_CHNS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_available() -> bool:
    return _find_weights() is not None


def _find_weights() -> Optional[str]:
    for p in (os.environ.get("VTP_LPIPS_WEIGHTS", ""),
              os.path.expanduser("~/.cache/vtp_tpu/lpips")):
        if p and os.path.exists(p):
            return p
    return None


def _conv(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def vgg16_taps(params: Dict, x: jax.Array) -> List[jax.Array]:
    """VGG16 features with the five LPIPS relu taps; x: (B, 3, H, W)."""
    taps: List[jax.Array] = []
    for i, (idx, _, _) in enumerate(_VGG_CONVS):
        if idx in _POOL_BEFORE:
            x = _maxpool(x)
        x = jax.nn.relu(_conv(x, params[f"conv{idx}"]["w"], params[f"conv{idx}"]["b"]))
        if idx in _TAP_AFTER_CONV:
            taps.append(x)
    return taps


def lpips_forward(params: Dict, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """LPIPS distance per image pair; inputs in [-1, 1], (B, 3, H, W)."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    x0 = (img1.astype(jnp.float32) - shift) / scale
    x1 = (img2.astype(jnp.float32) - shift) / scale
    taps0 = vgg16_taps(params["vgg"], x0)
    taps1 = vgg16_taps(params["vgg"], x1)
    total = 0.0
    for k in range(5):
        f0 = _unit_normalize(taps0[k])
        f1 = _unit_normalize(taps1[k])
        diff = (f0 - f1) ** 2
        lin = params["lins"][k]  # (C,) 1x1-conv weights
        score = jnp.sum(diff * lin[None, :, None, None], axis=1)  # (B, H, W)
        total = total + jnp.mean(score, axis=(1, 2))
    return total  # (B,)


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (norm + eps)


def convert_lpips_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Full LPIPS torch state dict -> JAX params. Accepts both the
    combined dict (net.slice*/lin*) and raw torchvision (features.*)
    plus lin-only dicts merged by the caller."""
    vgg: Dict[str, Dict] = {}
    for idx, cin, cout in _VGG_CONVS:
        for key in (f"net.slice{_slice_of(idx)}.{idx}.weight", f"features.{idx}.weight"):
            if key in sd:
                vgg[f"conv{idx}"] = {
                    "w": jnp.asarray(sd[key], jnp.float32),
                    "b": jnp.asarray(sd[key.replace("weight", "bias")], jnp.float32),
                }
                break
        else:
            raise KeyError(f"missing vgg conv {idx}")
    lins = []
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in sd:
                w = np.asarray(sd[key], np.float32)  # (1, C, 1, 1)
                lins.append(jnp.asarray(w[0, :, 0, 0]))  # (C,)
                break
        else:
            raise KeyError(f"missing lin{k}")
    return {"vgg": vgg, "lins": lins}


def _slice_of(conv_idx: int) -> int:
    if conv_idx < 4:
        return 1
    if conv_idx < 9:
        return 2
    if conv_idx < 16:
        return 3
    if conv_idx < 23:
        return 4
    return 5


class LPIPS:
    """Callable wrapper mirroring the reference's LPIPS class
    (test_reconstruction_hf.py:65-80): returns None-able metric when
    weights are unavailable."""

    def __init__(self, weights_path: Optional[str] = None):
        path = weights_path or _find_weights()
        self.params = None
        if path is None:
            return
        sd = _load_torch_weights(path)
        self.params = convert_lpips_state_dict(sd)
        self._fn = jax.jit(lpips_forward)

    @property
    def available(self) -> bool:
        return self.params is not None

    def __call__(self, img1, img2):
        """img1/img2 in [-1, 1], (B, 3, H, W). Returns (B,) distances or
        None when weights are unavailable."""
        if self.params is None:
            return None
        return self._fn(self.params, img1, img2)


def _load_torch_weights(path: str) -> Dict[str, np.ndarray]:
    import torch

    if os.path.isdir(path):
        sd: Dict[str, np.ndarray] = {}
        for f in sorted(os.listdir(path)):
            if f.endswith((".pth", ".pt")):
                part = torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
                sd.update({k: v.float().numpy() for k, v in part.items()})
        return sd
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}
