"""Benchmark: VTP-L 256x256 encode+decode images/sec on one TPU chip.

Protocol matches the reference eval (tools/test_reconstruction_hf.py:366-370):
encode under bf16 (weights stored bf16 — numerically identical to
autocast's per-matmul rounding), decode in fp32. Decode matmuls run at
'high' precision (3-pass bf16x3) by default: validated on-chip to differ
from the exact 6-pass 'float32' path by rel 7.6e-5 — 38x BELOW the
protocol's own bf16-latent quantization noise (rel 2.9e-3), i.e. the
decode precision contributes nothing measurable to rFID (full analysis
in PERF.md). Set BENCH_DECODE_PRECISION=float32 for the exact mode.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": "images/sec/chip",
   "vs_baseline": fraction of the analytic speed-of-light of the
   REFERENCE-EXACT protocol on TPU v5e (197 TFLOP/s bf16; fp32 decode
   via 6-pass emulation) — the floor a faithful port would be bound by}

Env knobs: BENCH_PRESET (vtp-large), BENCH_BATCH (32), BENCH_ITERS (20),
BENCH_MODE (roundtrip|encode|decode|train), BENCH_DECODE_PRECISION
(high|float32).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp

from vtp_tpu.config import PRESETS, VTPConfig
from vtp_tpu.models.vtp_model import (
    get_latents_decoded_images,
    get_reconstruction_latents,
    init_vtp_params,
)
from vtp_tpu.ops.ffn import swiglu_hidden_dim
from vtp_tpu.utils import cast_matmul_params

V5E_BF16_PEAK = 197e12  # FLOP/s per chip
FP32_EMULATION_PASSES = 6  # 'float32' matmul precision = 6-pass bf16


def tower_flops(n_tokens: int, dim: int, depth: int, ffn_hidden: int,
                ffn_gemms: int = 3) -> float:
    """Matmul FLOPs per image for one transformer tower (ffn_gemms=3 for
    SwiGLU w1/w2/w3, 2 for a plain Mlp c_fc/c_proj)."""
    qkv = 2 * n_tokens * dim * 3 * dim
    attn = 2 * 2 * n_tokens * n_tokens * dim  # QK^T + PV
    proj = 2 * n_tokens * dim * dim
    ffn = ffn_gemms * 2 * n_tokens * dim * ffn_hidden
    return depth * (qkv + attn + proj + ffn)


def _ffn_hidden(dim: int, ratio: float, layer: str) -> int:
    return swiglu_hidden_dim(dim, ratio) if layer == "swiglu" else int(dim * ratio)


def trunk_fwd_flops(cfg: VTPConfig, image_size: Optional[int] = None) -> float:
    size = image_size or cfg.image_size
    g = size // cfg.vision_patch_size
    n = g * g + 1 + cfg.vision_n_storage_tokens
    f = tower_flops(
        n, cfg.vision_embed_dim, cfg.vision_depth,
        _ffn_hidden(cfg.vision_embed_dim, cfg.vision_mlp_ratio, cfg.vision_ffn_layer),
    )
    f += 2 * g * g * (3 * cfg.vision_patch_size**2) * cfg.vision_embed_dim  # patchify
    f += 2 * (g * g + 1) * cfg.vision_embed_dim * cfg.vision_feature_bottleneck
    return f


def decoder_fwd_flops(cfg: VTPConfig) -> float:
    g = cfg.image_size // cfg.vision_patch_size
    f = tower_flops(
        g * g, cfg.decoder_embed_dim, cfg.decoder_depth,
        _ffn_hidden(cfg.decoder_embed_dim, cfg.decoder_mlp_ratio, cfg.decoder_ffn_layer),
    )
    f += 2 * g * g * cfg.vision_feature_bottleneck * cfg.decoder_embed_dim
    f += 2 * g * g * cfg.decoder_embed_dim * 3 * cfg.decoder_upscale_factor**2
    return f


def text_fwd_flops(cfg: VTPConfig) -> float:
    n = cfg.text_context_length
    f = tower_flops(
        n, cfg.text_embed_dim, cfg.text_depth,
        int(cfg.text_embed_dim * cfg.text_mlp_ratio), ffn_gemms=2,
    )
    return f + 2 * cfg.text_embed_dim * cfg.text_embed_dim  # pooled projection


def roundtrip_flops(cfg: VTPConfig) -> tuple[float, float]:
    return trunk_fwd_flops(cfg), decoder_fwd_flops(cfg)


def speed_of_light_imgs_per_sec(cfg: VTPConfig, mode: str) -> float:
    enc, dec = roundtrip_flops(cfg)
    t = 0.0
    if mode in ("roundtrip", "encode"):
        t += enc / V5E_BF16_PEAK
    if mode in ("roundtrip", "decode"):
        t += dec / (V5E_BF16_PEAK / FP32_EMULATION_PASSES)
    return 1.0 / t


def train_sol_imgs_per_sec(cfg: VTPConfig, *, remat: bool, ssl: bool,
                           n_local: int = 4, local_size: int = 96,
                           upperbound_ratio: float = 0.5,
                           dino_hidden: int = 2048, dino_bottleneck: int = 256,
                           dino_out: int = 65536, dino_nlayers: int = 3) -> float:
    """Analytic speed-of-light for the train step (matmul FLOPs only,
    everything bf16 on the MXU). Backward of a matmul tower is 2x its
    forward (dL/dW + dL/dx); block remat recomputes the forward once
    more inside the backward, so gradient-bearing towers cost 4x forward
    FLOPs with remat, 3x without. Teacher towers (stop-gradient) cost 1x."""
    mult = 4.0 if remat else 3.0
    # CLIP branch (trunk + text) + rec branch (trunk + decoder), all with grads
    per_img = mult * (2 * trunk_fwd_flops(cfg) + text_fwd_flops(cfg)
                      + decoder_fwd_flops(cfg))
    if ssl:
        in_dim = (cfg.vision_embed_dim if cfg.vision_bottleneck_ae_only
                  else cfg.vision_feature_bottleneck)
        h, b = dino_hidden, dino_bottleneck
        head_per_tok = 2 * (in_dim * h + h * h + h * b + b * dino_out)
        assert dino_nlayers == 3  # flops above assume the default 3-layer MLP
        g = cfg.image_size // cfg.vision_patch_size
        masked_per_img = 2 * g * g * upperbound_ratio  # upperbound rows / image
        head_tokens = 2 + n_local + masked_per_img  # global cls + local cls + masked
        teacher_tokens = 2 + masked_per_img
        per_img += 1.0 * (2 * trunk_fwd_flops(cfg)  # teacher, stop-grad
                          + teacher_tokens * head_per_tok)
        per_img += mult * (2 * trunk_fwd_flops(cfg)  # student globals (masked)
                           + n_local * trunk_fwd_flops(cfg, local_size)
                           + head_tokens * head_per_tok)
    return V5E_BF16_PEAK / per_img


def bench_train() -> None:
    """BENCH_MODE=train: train-step throughput (images/sec/chip) on the
    preset model, synthetic batch. BENCH_SSL=1 adds the full multi-crop
    DINO/iBOT SSL objective on top of CLIP+rec. Defaults are the fastest
    measured v5e config: no remat + unrolled depth loop (fits at batch
    32 for VTP-B, incl. the SSL step). BENCH_REMAT selects a
    remat_wrap policy (0/1/dots/attn/dots_attn), BENCH_UNROLL=0 reverts
    to lax.scan. vs_baseline = fraction of the analytic
    matmul speed-of-light for the same step (see train_sol_imgs_per_sec)."""
    preset = os.environ.get("BENCH_PRESET", "vtp-base")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # no-remat fits (and is fastest) for vtp-base at batch 32; larger
    # presets need a checkpoint policy (VTP-L no-remat OOMs v5e HBM)
    default_remat = "0" if preset == "vtp-base" else "attn"
    remat_env = os.environ.get("BENCH_REMAT", default_remat)
    remat = {"0": False, "1": True}.get(remat_env, remat_env)
    unroll = os.environ.get("BENCH_UNROLL", "1") == "1"
    ssl = os.environ.get("BENCH_SSL", "0") == "1"

    from vtp_tpu.train.step import (
        TrainConfig, build_train_step, init_state, make_ssl_batch,
    )

    cfg = PRESETS[preset]()
    tcfg = TrainConfig(train_ssl=ssl, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=unroll)
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    k1, k2 = jax.random.split(jax.random.key(1))
    batch_data = {
        "image": jax.random.normal(k1, (batch, 3, cfg.image_size, cfg.image_size)),
        "text": jax.random.randint(k2, (batch, cfg.text_context_length), 1,
                                   cfg.text_vocab_size - 1),
        "rec_image": jax.random.normal(k1, (batch, 3, cfg.image_size, cfg.image_size)),
    }
    if ssl:
        batch_data["ssl"] = make_ssl_batch(
            jax.random.key(4), batch, global_size=cfg.image_size,
            patch=cfg.vision_patch_size,
        )

    t0 = time.perf_counter()
    state, metrics = step(state, batch_data, jax.random.key(2))
    _ = float(metrics["loss/total"])
    print(f"[bench] compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch_data, jax.random.key(3 + i))
    _ = float(metrics["loss/total"])  # host fetch = sync
    dt = (time.perf_counter() - t0) / iters
    sol = train_sol_imgs_per_sec(cfg, remat=remat, ssl=ssl)
    imgs = batch / dt
    name = "CLIP+SSL+rec" if ssl else "CLIP+rec"
    print(f"[bench] {dt*1e3:.1f} ms/step, {imgs:.1f} img/s, SoL {sol:.1f} "
          f"({imgs/sol*100:.1f}%), remat={remat}", file=sys.stderr)
    print(json.dumps({
        "metric": (f"{preset} 256px {name} train step throughput "
                   f"(remat={'on' if remat else 'off'}); vs_baseline = fraction "
                   f"of the analytic bf16 matmul speed-of-light for this step"),
        "value": round(imgs, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs / sol, 4),
    }))


def bench_dit() -> None:
    """BENCH_MODE=dit: DiT-XL/1 training-step throughput on f16d64
    latents (the reference's generation recipe,
    generation/configs/train_vtp_l_dit_xl.yaml). Batch 32/chip: the
    675M-param fp32 train state (params+ema+adam m,v) is ~10 GB, and
    batch-64 activations push past the 16 GB v5e HBM."""
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

    cfg = make_dit_config("DiT-XL/1")
    # fastest measured fit on v5e: remat="attn" (save attention outputs)
    # + unrolled depth loop — 93.8 img/s vs 90.8 full-remat-unrolled and
    # 82.0 scanned (no-remat / dots_attn OOM the 675M model at batch 32)
    tcfg = DiTTrainConfig(remat="attn", unroll_layers=True)
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))
    lat = jax.random.normal(jax.random.key(1), (batch, cfg.in_channels,
                                                cfg.input_size, cfg.input_size))
    lab = jax.random.randint(jax.random.key(2), (batch,), 0, cfg.num_classes)

    t0 = time.perf_counter()
    state, metrics = step(state, lat, lab, jax.random.key(3))
    _ = float(metrics["loss/transport"])
    print(f"[bench] compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, lat, lab, jax.random.key(4 + i))
    _ = float(metrics["loss/transport"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "DiT-XL/1 f16d64 train-step throughput (bf16, adaLN-zero, flow transport)",
        "value": round(batch / dt, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    }))


def main() -> None:
    preset = os.environ.get("BENCH_PRESET", "vtp-large")
    # batch 32 measured fastest for the roundtrip on v5e (133.9 img/s vs
    # 130.7 at 64, 124.1 at 128 — VMEM pressure grows with batch)
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    mode = os.environ.get("BENCH_MODE", "roundtrip")
    if mode == "train":
        return bench_train()
    if mode == "dit":
        return bench_dit()

    cfg = PRESETS[preset]()
    print(f"[bench] preset={preset} batch={batch} iters={iters} mode={mode} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    params = init_vtp_params(jax.random.key(0), cfg)
    # encode weights in bf16 (== autocast rounding), decoder stays fp32
    params["trunk"] = cast_matmul_params(params["trunk"], jnp.bfloat16)
    params = jax.device_put(params)

    # validated default: 3-pass fp32 decode (see module docstring / PERF.md)
    os.environ.setdefault("VTP_DECODE_PRECISION",
                          os.environ.get("BENCH_DECODE_PRECISION", "high"))

    def encode(params, image):
        return get_reconstruction_latents(params, cfg, image, jnp.bfloat16)

    def decode(params, latents):
        return get_latents_decoded_images(params, cfg, latents, None)

    def roundtrip(params, image):
        return decode(params, encode(params, image))

    fn = {"roundtrip": roundtrip, "encode": encode, "decode": decode}[mode]
    g = cfg.latent_grid
    if mode == "decode":
        x = jax.random.normal(
            jax.random.key(1), (batch, cfg.vision_feature_bottleneck, g, g), jnp.float32
        )
    else:
        x = jax.random.normal(
            jax.random.key(1), (batch, 3, cfg.image_size, cfg.image_size), jnp.float32
        )

    # Chain iterations through a data dependency so the runtime cannot
    # dedupe/cache identical dispatches (the axon relay does), and a
    # single block_until_ready covers the whole chain.
    def step(params, x, carry):
        xi = x + (1e-6 * carry).astype(x.dtype)
        return fn(params, xi)

    # NOTE: through the remote (axon) runtime, block_until_ready returns
    # before execution completes — only a host fetch synchronizes. The
    # chain threads each step's output into the next step's input, and a
    # single scalar fetch at the end waits for the whole chain.
    jfn = jax.jit(step)
    tap = jax.jit(lambda o: o.ravel()[0].astype(jnp.float32))
    zero = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    out = jfn(params, x, zero)
    _ = float(tap(out))
    print(f"[bench] compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    _ = float(tap(jfn(params, x, zero)))  # warm steady-state

    t0 = time.perf_counter()
    carry = zero
    for _ in range(iters):
        out = jfn(params, x, carry)
        carry = tap(out)
    _ = float(carry)  # host fetch = real synchronization
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    sol = speed_of_light_imgs_per_sec(cfg, mode)
    enc, dec = roundtrip_flops(cfg)
    print(f"[bench] {dt/iters*1e3:.2f} ms/step, {imgs_per_sec:.1f} img/s, "
          f"SoL {sol:.1f} img/s ({imgs_per_sec/sol*100:.1f}%), "
          f"flops/img enc {enc/1e9:.1f}G dec {dec/1e9:.1f}G", file=sys.stderr)

    dp = os.environ["VTP_DECODE_PRECISION"]
    dp_note = (
        "validated 3-pass fp32 decode, error 38x below protocol bf16 noise floor"
        if dp == "high" else f"decode precision {dp}"
    )
    print(json.dumps({
        "metric": (
            f"{preset} 256px {mode} throughput (bf16 encode / fp32 decode; "
            f"{dp_note}); vs_baseline = fraction of the reference-exact "
            f"6-pass-decode speed-of-light"
        ),
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / sol, 4),
    }))


if __name__ == "__main__":
    main()
