"""Convert reference (HF VTPModel) checkpoints to vtp_tpu pytrees.

Handles the reference's checkpoint-facing quirks:
  * conv weights -> GEMM kernels (patchify, 1x1 in/out projections);
  * torch Linear ``(out, in)`` -> JAX ``(in, out)`` kernels;
  * RoPE ``periods`` persistent buffer cast to the rope dtype
    (embeddings.py:124-128 registers it in bf16);
  * ``LinearKMaskedBias.bias_mask`` premultiplied into the qkv bias
    (attention.py:26-38);
  * per-layer block params stacked along a leading depth axis for scan;
  * DINOHead ``weight_norm`` parametrization kept decomposed (v, g).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vit import ROPE_DTYPES

Array = np.ndarray


def _t(w: Array) -> jnp.ndarray:
    """torch Linear weight (out, in) -> kernel (in, out)."""
    return jnp.asarray(np.ascontiguousarray(w.T), jnp.float32)


def _a(w: Array, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(w, dtype)


def _conv1x1(w: Array) -> jnp.ndarray:
    """(out, in, 1, 1) conv -> (in, out) kernel."""
    return _t(w.reshape(w.shape[0], w.shape[1]))


def _norm(sd: Dict[str, Array], prefix: str) -> dict:
    p = {"scale": _a(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = _a(sd[f"{prefix}.bias"])
    return p


def _linear(sd: Dict[str, Array], prefix: str) -> dict:
    p = {"kernel": _t(sd[f"{prefix}.weight"])}
    p["bias"] = _a(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    return p


def _qkv(sd: Dict[str, Array], prefix: str) -> dict:
    kernel = _t(sd[f"{prefix}.weight"])
    bias = None
    if f"{prefix}.bias" in sd:
        b = sd[f"{prefix}.bias"].astype(np.float32)
        mask = sd.get(f"{prefix}.bias_mask")
        if mask is not None:
            b = b * mask.astype(np.float32)
        bias = _a(b)
    return {"kernel": kernel, "bias": bias}


def _stack(trees: list) -> dict:
    """Stack a list of identical-structure param dicts along axis 0."""
    import jax

    return jax.tree.map(
        lambda *xs: None if xs[0] is None else jnp.stack(xs, axis=0),
        *trees,
        is_leaf=lambda x: x is None,
    )


def _vit_block(sd: Dict[str, Array], p: str, use_qk_norm: bool, has_ls: bool) -> dict:
    blk = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "attn": {
            "qkv": _qkv(sd, f"{p}.attn.qkv"),
            "proj": _linear(sd, f"{p}.attn.proj"),
        },
    }
    if use_qk_norm:
        blk["attn"]["q_norm"] = _norm(sd, f"{p}.attn.q_norm")
        blk["attn"]["k_norm"] = _norm(sd, f"{p}.attn.k_norm")
    if f"{p}.mlp.w1.weight" in sd:
        blk["mlp"] = {
            "w1": _linear(sd, f"{p}.mlp.w1"),
            "w2": _linear(sd, f"{p}.mlp.w2"),
            "w3": _linear(sd, f"{p}.mlp.w3"),
        }
    else:
        blk["mlp"] = {
            "fc1": _linear(sd, f"{p}.mlp.fc1"),
            "fc2": _linear(sd, f"{p}.mlp.fc2"),
        }
    if has_ls:
        blk["ls1"] = {"gamma": _a(sd[f"{p}.ls1.gamma"])}
        blk["ls2"] = {"gamma": _a(sd[f"{p}.ls2.gamma"])}
    return blk


def _count_blocks(sd: Dict[str, Array], prefix: str) -> int:
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    idx = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    return max(idx) + 1 if idx else 0


def convert_trunk(sd: Dict[str, Array], cfg: VTPConfig, prefix: str = "trunk") -> dict:
    rope_dtype = ROPE_DTYPES[cfg.rope_dtype]
    depth = _count_blocks(sd, f"{prefix}.blocks") or cfg.vision_depth
    use_qk_norm = f"{prefix}.blocks.0.attn.q_norm.weight" in sd
    has_ls = f"{prefix}.blocks.0.ls1.gamma" in sd
    pw = sd[f"{prefix}.patch_embed.proj.weight"]
    params = {
        "patch_embed": {
            "kernel": _t(pw.reshape(pw.shape[0], -1)),
            "bias": _a(sd[f"{prefix}.patch_embed.proj.bias"]),
        },
        "cls_token": _a(sd[f"{prefix}.cls_token"]),
        "mask_token": _a(sd[f"{prefix}.mask_token"]),
        "rope": {"periods": _a(sd[f"{prefix}.rope_embed.periods"], rope_dtype)},
        "blocks": _stack([
            _vit_block(sd, f"{prefix}.blocks.{i}", use_qk_norm, has_ls) for i in range(depth)
        ]),
        "norm": _norm(sd, f"{prefix}.norm"),
    }
    if f"{prefix}.storage_tokens" in sd:
        params["storage_tokens"] = _a(sd[f"{prefix}.storage_tokens"])
    if f"{prefix}.cls_norm.weight" in sd:
        params["cls_norm"] = _norm(sd, f"{prefix}.cls_norm")
    if f"{prefix}.local_cls_norm.weight" in sd:
        params["local_cls_norm"] = _norm(sd, f"{prefix}.local_cls_norm")
    if f"{prefix}.feature_bottleneck.weight" in sd:
        params["feature_bottleneck"] = {
            "kernel": _t(sd[f"{prefix}.feature_bottleneck.weight"]),
            "bias": None,
        }
    return params


def convert_pixel_decoder(sd: Dict[str, Array], cfg: VTPConfig,
                          prefix: str = "pixel_decoder") -> dict:
    rope_dtype = ROPE_DTYPES[cfg.rope_dtype]
    depth = _count_blocks(sd, f"{prefix}.blocks") or cfg.decoder_depth
    use_qk_norm = f"{prefix}.blocks.0.attn.q_norm.weight" in sd
    has_ls = f"{prefix}.blocks.0.ls1.gamma" in sd
    p_in = {"kernel": _conv1x1(sd[f"{prefix}.proj_in.weight"])}
    p_in["bias"] = _a(sd[f"{prefix}.proj_in.bias"]) if f"{prefix}.proj_in.bias" in sd else None
    p_out = {"kernel": _conv1x1(sd[f"{prefix}.proj_out.weight"])}
    p_out["bias"] = _a(sd[f"{prefix}.proj_out.bias"]) if f"{prefix}.proj_out.bias" in sd else None
    return {
        "proj_in": p_in,
        "proj_out": p_out,
        "rope": {"periods": _a(sd[f"{prefix}.rope_embed.periods"], rope_dtype)},
        "blocks": _stack([
            _vit_block(sd, f"{prefix}.blocks.{i}", use_qk_norm, has_ls) for i in range(depth)
        ]),
        "norm": _norm(sd, f"{prefix}.norm"),
    }


def convert_text(sd: Dict[str, Array], cfg: VTPConfig, prefix: str = "") -> dict:
    """Text tower from the HF model's flattened naming
    (modeling_vtp.py:162-170): token_embedding / positional_embedding /
    text_transformer.resblocks.N / ln_final / text_projection."""
    t = (prefix + ".") if prefix else ""
    tx = f"{t}text_transformer.resblocks"
    if f"{tx}.0.ln_1.weight" not in sd and f"{t}transformer.resblocks.0.ln_1.weight" in sd:
        tx = f"{t}transformer.resblocks"  # legacy VTP naming (vtp.py:169)
    depth = _count_blocks(sd, tx) or cfg.text_depth
    has_ls = f"{tx}.0.ls_1.gamma" in sd

    def block(i: int) -> dict:
        p = f"{tx}.{i}"
        blk = {
            "ln_1": _norm(sd, f"{p}.ln_1"),
            "ln_2": _norm(sd, f"{p}.ln_2"),
            "attn": {
                "in_proj": {
                    "kernel": _t(sd[f"{p}.attn.in_proj_weight"]),
                    "bias": _a(sd[f"{p}.attn.in_proj_bias"]),
                },
                "out_proj": _linear(sd, f"{p}.attn.out_proj"),
            },
            "mlp": {
                "c_fc": _linear(sd, f"{p}.mlp.c_fc"),
                "c_proj": _linear(sd, f"{p}.mlp.c_proj"),
            },
        }
        if has_ls:
            blk["ls_1"] = {"gamma": _a(sd[f"{p}.ls_1.gamma"])}
            blk["ls_2"] = {"gamma": _a(sd[f"{p}.ls_2.gamma"])}
        return blk

    params = {
        "token_embedding": _a(sd[f"{t}token_embedding.weight"]),
        "positional_embedding": _a(sd[f"{t}positional_embedding"]),
        "blocks": _stack([block(i) for i in range(depth)]),
        "ln_final": _norm(sd, f"{t}ln_final"),
    }
    if f"{t}cls_emb" in sd:
        params["cls_emb"] = _a(sd[f"{t}cls_emb"])
    if f"{t}text_projection.weight" in sd:
        params["text_projection"] = _linear(sd, f"{t}text_projection")
    elif f"{t}text_projection" in sd:
        # bare nn.Parameter matrix (width, out) used as x @ W — no transpose
        params["text_projection"] = {"kernel": _a(sd[f"{t}text_projection"]), "bias": None}
    return params


def convert_state_dict(sd: Dict[str, Array], cfg: VTPConfig) -> dict:
    """Full HF VTPModel state dict (numpy values) -> vtp_tpu param tree."""
    params = {"trunk": convert_trunk(sd, cfg)}
    if "visual_proj.weight" in sd:
        params["visual_proj"] = {"kernel": _t(sd["visual_proj.weight"]), "bias": None}
    elif "proj.weight" in sd:  # legacy VTP naming (vtp.py:217)
        params["visual_proj"] = {"kernel": _t(sd["proj.weight"]), "bias": None}
    if any(k.startswith("pixel_decoder.") for k in sd):
        params["pixel_decoder"] = convert_pixel_decoder(sd, cfg)
    if "token_embedding.weight" in sd:
        params["text"] = convert_text(sd, cfg)
    if "logit_scale" in sd:
        params["logit_scale"] = _a(sd["logit_scale"])
    if "logit_bias" in sd:
        params["logit_bias"] = _a(sd["logit_bias"])
    return params


# --------------------------------------------------------------- file I/O


def _load_safetensors_dir(path: str) -> Dict[str, Array]:
    try:
        from safetensors.numpy import load_file
    except ImportError:  # pragma: no cover
        from safetensors import safe_open

        def load_file(fp):
            out = {}
            with safe_open(fp, framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out

    files = []
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".safetensors")]
    else:
        files = [path]
    sd: Dict[str, Array] = {}
    for f in files:
        sd.update(load_file(f))
    return sd


def load_vtp_checkpoint(
    path: str, config: Optional[VTPConfig] = None
) -> Tuple[VTPConfig, dict]:
    """Load a released HF checkpoint directory (config.json +
    *.safetensors) into (VTPConfig, params)."""
    cfg_path = os.path.join(path, "config.json") if os.path.isdir(path) else path
    with open(cfg_path if cfg_path.endswith(".json") else os.path.join(path, "config.json")) as f:
        cfg_dict = json.load(f)
    if cfg_dict.get("model_format") == "vtp_tpu":
        # native checkpoint — route to the native loader
        from vtp_tpu.checkpoint import load_pretrained

        return load_pretrained(path)
    if config is None:
        config = VTPConfig.from_dict(cfg_dict)
    sd = _load_safetensors_dir(path)
    # Strip an optional "vtp." base-model prefix.
    if any(k.startswith("vtp.") for k in sd):
        sd = {k[len("vtp."):] if k.startswith("vtp.") else k: v for k, v in sd.items()}
    sd = {k: np.asarray(v, dtype=np.float32) if v.dtype != np.float32 else v
          for k, v in sd.items()}
    return config, convert_state_dict(sd, config)
