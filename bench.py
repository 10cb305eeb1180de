"""Benchmark: VTP-L 256x256 encode+decode images/sec on one TPU chip.

Protocol matches the reference eval (tools/test_reconstruction_hf.py:366-370):
encode under bf16 (weights stored bf16 — numerically identical to
autocast's per-matmul rounding), decode in fp32. Decode matmuls run at
'high' precision (3-pass bf16x3) by default: validated on-chip to differ
from the exact 6-pass 'float32' path by rel 7.6e-5 — 38x BELOW the
protocol's own bf16-latent quantization noise (rel 2.9e-3), i.e. the
decode precision contributes nothing measurable to rFID (full analysis
in PERF.md). Set BENCH_DECODE_PRECISION=float32 for the exact mode.

Output contract (hardened in round 5 — BENCH_r04 was rc=124 with zero
numbers after a single mid-run stall): a COMPLETE, self-contained JSON
line is printed after EVERY leg (the driver takes the last line), every
leg has a wall-clock budget and is skipped with an ``"error": "budget"``
row instead of hanging the artifact, rates are computed from the MIN
per-iteration wall (a tunnel grant-wedge inflates one iteration, not the
number — the measurement-hygiene pattern from
experiments/r4_vtpl_attn_accum_probe.py), and a heartbeat goes to stderr
between iterations.

  {"metric": ..., "value": imgs/sec/chip, "unit": "images/sec/chip",
   "vs_baseline": fraction of the analytic speed-of-light of the
   REFERENCE-EXACT protocol on TPU v5e (197 TFLOP/s bf16; fp32 decode
   via 6-pass emulation) — the floor a faithful port would be bound by}

Env knobs: BENCH_PRESET (vtp-large), BENCH_BATCH (32), BENCH_ITERS (20),
BENCH_MODE (roundtrip|encode|decode|train|dit), BENCH_DECODE_PRECISION
(high|float32), BENCH_LEG_BUDGET_S (420), BENCH_TOTAL_BUDGET_S (2700).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

from vtp_tpu.utils.env import bootstrap

bootstrap()

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

_T0 = time.monotonic()
LEG_BUDGET_S = float(os.environ.get("BENCH_LEG_BUDGET_S", "420"))
# dispatches chained on-device per host fetch: a tunnel fetch costs
# ~25-30 ms RTT, so walls are taken per GROUP and divided (min over
# groups still excises grant wedges). Groups are sized to ~this many
# seconds of chained work, bounding the RTT share of every wall sample
# to ~2.5% regardless of step duration.
_GROUP_TARGET_S = float(os.environ.get("BENCH_GROUP_TARGET_S", "2.0"))


def _group_size(walls, remaining: int) -> int:
    """Next group size: 1 to probe (first sample pays the RTT), then
    ~_GROUP_TARGET_S worth of chained dispatches."""
    if not walls:
        return 1
    import math as _math

    est = max(min(walls), 1e-3)
    return max(1, min(remaining, _math.ceil(_GROUP_TARGET_S / est)))
TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "2700"))


def _elapsed() -> float:
    return time.monotonic() - _T0


_STAGE = {"msg": "startup"}  # last heartbeat, for the watchdog's autopsy
_LAST_RESULT: dict = {}  # last emitted row, re-emitted by the watchdog


def _hb(msg: str) -> None:
    """Heartbeat: timestamped stderr line between dispatches, so a hung
    artifact still shows WHERE it hung."""
    _STAGE["msg"] = msg
    print(f"[bench +{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(result: dict) -> None:
    """Print the CURRENT result as one complete, self-contained JSON
    line. Called after every leg; the driver takes the last line, so a
    later stall costs only the legs that never ran."""
    _LAST_RESULT.clear()
    _LAST_RESULT.update(result)
    print(json.dumps(result), flush=True)


def _start_watchdog() -> None:
    """The leg/total budget checks run BETWEEN dispatches, so a single
    blocking call (a remote compile, the first dispatch of a fresh
    grant, a mid-loop grant wedge) can hold the main thread past every
    deadline — exactly how BENCH_r04 ended rc=124 with zero output.
    This daemon thread cannot unblock the tunnel, but it (a) heartbeats
    once a minute so the log shows the hang's location, and (b) at
    TOTAL_BUDGET_S + 120 re-emits the last self-contained result row
    with an "error" note and hard-exits — the driver always gets a
    parseable final line."""
    import threading

    deadline = TOTAL_BUDGET_S + 120.0

    def run() -> None:
        while True:
            time.sleep(60)
            el = _elapsed()
            print(f"[bench watchdog +{el:7.1f}s] alive; last stage: "
                  f"{_STAGE['msg']}", file=sys.stderr, flush=True)
            if el > deadline:
                row = dict(_LAST_RESULT) or {
                    "metric": "vtp-large 256px roundtrip throughput",
                    "value": None, "unit": "images/sec/chip",
                    "vs_baseline": None,
                }
                row["error"] = (
                    f"watchdog: total budget ({TOTAL_BUDGET_S:.0f}s + 120s "
                    f"slack) exceeded while blocked at: {_STAGE['msg']}"
                )[:300]
                print(json.dumps(row), flush=True)
                os._exit(3)

    threading.Thread(target=run, daemon=True, name="bench-watchdog").start()


def _min_wall_rate(walls, per_iter_items: float) -> dict:
    """Rate from the min per-iteration wall (wedge-immune) plus the
    honest spread, so the artifact itself shows whether the run was
    clean (min ≈ median) or wedged (max >> median)."""
    walls = sorted(walls)
    n = len(walls)
    med = walls[n // 2] if n % 2 else 0.5 * (walls[n // 2 - 1] + walls[n // 2])
    return {
        "rate": per_iter_items / walls[0],
        "walls": {"min_s": round(walls[0], 4), "median_s": round(med, 4),
                  "max_s": round(walls[-1], 4), "n": n},
    }


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


def _remat_recompute_fraction(cfg: VTPConfig, remat) -> float:
    """Fraction of forward matmul FLOPs recomputed in the backward under
    a remat_wrap policy. full remat recomputes everything (1.0); 'dots'
    and 'dots_attn' save every matmul output so only elementwise ops are
    recomputed (0.0 in a matmul-FLOPs model); 'attn' saves only the
    attention-kernel outputs, so all GEMMs (everything but the attention
    dots) re-run — approximated with the trunk's attention-dot fraction."""
    if remat in (False, "0", "off", None):
        return 0.0
    if remat in ("dots", "dots_attn"):
        return 0.0
    if remat == "attn":
        g = cfg.image_size // cfg.vision_patch_size
        n = g * g + 1 + cfg.vision_n_storage_tokens
        d = cfg.vision_embed_dim
        attn = 2 * 2 * n * n * d
        per_layer = tower_flops(
            n, d, 1,
            _ffn_hidden(d, cfg.vision_mlp_ratio, cfg.vision_ffn_layer),
        )
        return 1.0 - attn / per_layer
    return 1.0  # True / "full"


def train_sol_imgs_per_sec(cfg: VTPConfig, *, remat: bool, ssl: bool,
                           n_local: int = 4, local_size: int = 96,
                           upperbound_ratio: float = 0.5,
                           dino_hidden: int = 2048, dino_bottleneck: int = 256,
                           dino_out: int = 65536, dino_nlayers: int = 3) -> float:
    """Analytic speed-of-light for the train step (matmul FLOPs only,
    everything bf16 on the MXU). Backward of a matmul tower is 2x its
    forward (dL/dW + dL/dx); remat recomputes (part of) the forward
    inside the backward, so gradient-bearing towers cost (3 + recompute
    fraction) x forward FLOPs — 4x full remat, 3x none, partial policies
    in between (see _remat_recompute_fraction). Teacher towers
    (stop-gradient) cost 1x."""
    mult = 3.0 + _remat_recompute_fraction(cfg, remat)
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


def measure_train(*, preset: str, batch: int, iters: int, ssl: bool,
                  remat, unroll: bool, accum: int = 1,
                  moment_dtype: str = "fp32",
                  leg_budget_s: float = None) -> dict:
    """Measure train-step throughput; returns a dict of numbers (shared
    by BENCH_MODE=train and the train section of the default bench).
    ``accum > 1`` drives host-side microbatch accumulation (one
    optimizer step per ``accum`` microbatches, bf16 accumulator) and
    counts the FULL global batch per step. Walls are taken per group of
    chained steps with one host fetch at the group end (_group_size —
    the tunnel fetch RTT is ~25-30 ms); the reported rate uses the MIN
    per-step wall and the loop stops early once the leg budget is spent
    (>= 2 clean wall samples)."""
    from vtp_tpu.train.step import (
        TrainConfig, build_train_step, init_state, make_ssl_batch,
        run_host_accum_step,
    )

    leg_budget_s = LEG_BUDGET_S if leg_budget_s is None else leg_budget_s
    leg_t0 = time.monotonic()
    cfg = PRESETS[preset]()
    tcfg = TrainConfig(train_ssl=ssl, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=unroll,
                       accum_steps=accum, accum_dtype="bf16",
                       moment_dtype=moment_dtype)
    state = init_state(jax.random.key(0), cfg, tcfg)
    ts = build_train_step(cfg, tcfg)
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

    if accum <= 1:
        step = jax.jit(ts, donate_argnums=(0,))

        def run(state, key):
            return step(state, batch_data, key)
    else:
        micro = jax.jit(ts.micro_step, donate_argnums=(1, 2, 3))
        apply_ = jax.jit(ts.apply_accum, donate_argnums=(0, 1, 2, 3))
        # stacked=False: reuse one microbatch per accum step instead of
        # materializing the (accum, micro, ...) global batch on-chip —
        # the ~1.1 GB batch stack is what OOMed the VTP-L SSL legs
        # (traces/r5_vtpl_ssl_ladder.json).

        def run(state, key):
            return run_host_accum_step(ts, tcfg, state, batch_data, key,
                                       micro_jit=micro, apply_jit=apply_,
                                       stacked=False)

    name = "CLIP+SSL+rec" if ssl else "CLIP+rec"
    t0 = time.perf_counter()
    state, metrics = run(state, jax.random.key(2))
    _ = float(metrics["loss/total"])
    _hb(f"train/{preset}/{name} compile+first: {time.perf_counter() - t0:.1f}s")
    # walls per GROUP of steps with one loss fetch at the group end (a
    # tunnel fetch costs ~25-30 ms RTT — per-step fetching taxed the
    # 153 ms vtp-base step ~17% vs the round-3 artifact); steps chain
    # through the donated state on device, per-step PRNG keys keep the
    # tunnel dedup cache from collapsing the dispatches
    walls = []
    i = 0
    while i < iters:
        g = _group_size(walls, iters - i)
        t0 = time.perf_counter()
        for j in range(g):
            state, metrics = run(state, jax.random.key(3 + i + j))
        _ = float(metrics["loss/total"])  # host fetch = group sync
        wall = (time.perf_counter() - t0) / g
        walls.append(wall)
        i += g
        _hb(f"train/{preset}/{name} iter {i}/{iters}: {wall*1e3:.1f} "
            f"ms/step (group of {g})")
        if len(walls) >= 2 and time.monotonic() - leg_t0 > leg_budget_s:
            _hb(f"train/{preset}/{name}: leg budget {leg_budget_s:.0f}s spent "
                f"after {i} iters — stopping early")
            break
    sol = train_sol_imgs_per_sec(cfg, remat=remat, ssl=ssl)
    mw = _min_wall_rate(walls, batch * max(accum, 1))
    imgs = mw["rate"]
    _hb(f"train/{preset}/{name}: min {min(walls)*1e3:.1f} ms/step, "
        f"{imgs:.1f} img/s, SoL {sol:.1f} ({imgs/sol*100:.1f}%), "
        f"remat={remat}, accum={accum}")
    del state
    out = {
        "step": name,
        "preset": preset,
        "imgs_per_sec": round(imgs, 2),
        "vs_matmul_sol": round(imgs / sol, 4),
        "remat": str(remat),
        "walls": mw["walls"],
    }
    if accum > 1:
        out["accum"] = accum
        out["microbatch"] = batch
    return out


def _train_env_config(preset: str):
    """Shared BENCH_REMAT / BENCH_UNROLL parsing. Defaults are the
    fastest measured v5e config (PERF.md): no remat + unrolled depth
    loop for vtp-base; larger presets need a checkpoint policy (VTP-L
    no-remat OOMs v5e HBM at batch 32)."""
    default_remat = "off" if preset == "vtp-base" else "attn"
    remat_env = os.environ.get("BENCH_REMAT", default_remat)
    remat = {"0": False, "off": False, "1": True, "full": True}.get(
        remat_env, remat_env)
    # "0" = lax.scan, "1" = full unroll, k>1 = k-layer chunked scan
    unroll_env = os.environ.get("BENCH_UNROLL", "1")
    unroll = {"0": False, "1": True}.get(unroll_env, None)
    if unroll is None:
        unroll = int(unroll_env)
    return remat, unroll


def bench_train() -> None:
    """BENCH_MODE=train: train-step throughput (images/sec/chip) on the
    preset model, synthetic batch. BENCH_SSL=1 adds the full multi-crop
    DINO/iBOT SSL objective on top of CLIP+rec. BENCH_REMAT selects a
    remat_wrap policy (off/full/dots/attn/dots_attn), BENCH_UNROLL=0
    reverts to lax.scan. vs_baseline = fraction of the analytic matmul
    speed-of-light for the same step+policy (train_sol_imgs_per_sec;
    partial policies are modeled with their approximate recompute
    fraction, see _remat_recompute_fraction)."""
    preset = os.environ.get("BENCH_PRESET", "vtp-base")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    remat, unroll = _train_env_config(preset)
    ssl = os.environ.get("BENCH_SSL", "0") == "1"

    r = measure_train(preset=preset, batch=batch, iters=iters, ssl=ssl,
                      remat=remat, unroll=unroll)
    _emit({
        "metric": (f"{preset} 256px {r['step']} train step throughput "
                   f"(remat={r['remat']}); vs_baseline = fraction of the "
                   f"analytic bf16 matmul speed-of-light for this step+policy"),
        "value": r["imgs_per_sec"],
        "unit": "images/sec/chip",
        "vs_baseline": r["vs_matmul_sol"],
    })


def dit_train_sol_samples_per_sec(cfg, remat="attn") -> float:
    """Analytic matmul speed-of-light for the DiT train step (same
    model as train_sol_imgs_per_sec: backward = 2x forward, plus the
    recompute fraction of the remat policy)."""
    n = cfg.tokens_per_side ** 2
    d = cfg.dim
    fwd = tower_flops(n, d, cfg.depth, cfg.ffn_hidden, ffn_gemms=3)
    fwd += cfg.depth * 2 * d * 6 * d  # adaLN modulation GEMMs (per image)
    fwd += 2 * n * cfg.token_dim * d + 2 * n * d * (cfg.token_dim + 6 * d / n)
    if remat == "attn":
        attn = 2 * 2 * n * n * d
        per_layer = tower_flops(n, d, 1, cfg.ffn_hidden, ffn_gemms=3)
        frac = 1.0 - attn / per_layer
    else:
        frac = {False: 0.0, "dots": 0.0, "dots_attn": 0.0}.get(remat, 1.0)
    return V5E_BF16_PEAK / ((3.0 + frac) * fwd)


def measure_dit(*, batch: int, iters: int, accum: int,
                leg_budget_s: float = None) -> dict:
    """Measure DiT-XL/1 train-step throughput (shared by BENCH_MODE=dit
    and the train section of the default bench). Operating point
    (round 3b, measured ladder in PERF.md): B=32 microbatches with
    host-driven bf16 gradient accumulation, remat="attn" + unrolled
    depth loop (no-remat / dots_attn OOM the 675M model)."""
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import (
        DiTTrainConfig,
        build_dit_microbatch_steps,
        build_dit_train_step,
        init_dit_state,
        run_accum_step,
    )

    leg_budget_s = LEG_BUDGET_S if leg_budget_s is None else leg_budget_s
    leg_t0 = time.monotonic()
    cfg = make_dit_config("DiT-XL/1")
    # fastest measured fit on v5e: remat="attn" (save attention outputs)
    # + unrolled depth loop (no-remat / dots_attn OOM the 675M model);
    # bf16 accumulator (fp32 next to the 10.8 GB train state OOMs)
    remat = "attn"
    tcfg = DiTTrainConfig(remat=remat, unroll_layers=True,
                          accum_steps=accum, accum_dtype="bf16")
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    lat = jax.random.normal(jax.random.key(1), (batch, cfg.in_channels,
                                                cfg.input_size, cfg.input_size))
    lab = jax.random.randint(jax.random.key(2), (batch,), 0, cfg.num_classes)

    if accum <= 1:
        step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))

        def run(state, key):
            return step(state, lat, lab, key)
    else:
        micro, apply_ = build_dit_microbatch_steps(cfg, tcfg)
        micro = jax.jit(micro, donate_argnums=(1, 2))
        apply_ = jax.jit(apply_, donate_argnums=(0, 1, 2))
        # leading (accum,) microbatch axis (same synthetic batch per
        # microbatch — throughput bench, not training)
        lat_a = jnp.broadcast_to(lat, (accum,) + lat.shape)
        lab_a = jnp.broadcast_to(lab, (accum,) + lab.shape)

        def run(state, key):
            return run_accum_step(micro, apply_, tcfg, state, lat_a, lab_a, key)

    t0 = time.perf_counter()
    state, metrics = run(state, jax.random.key(3))
    _ = float(metrics["loss/transport"])
    _hb(f"train/DiT-XL compile+first: {time.perf_counter() - t0:.1f}s")
    # group-chained walls (see _group_size): one loss fetch per ~1 s of
    # chained steps bounds the ~25-30 ms tunnel-fetch RTT share
    walls = []
    i = 0
    while i < iters:
        g = _group_size(walls, iters - i)
        t0 = time.perf_counter()
        for j in range(g):
            state, metrics = run(state, jax.random.key(4 + i + j))
        _ = float(metrics["loss/transport"])
        wall = (time.perf_counter() - t0) / g
        walls.append(wall)
        i += g
        _hb(f"train/DiT-XL iter {i}/{iters}: {wall*1e3:.1f} ms/step "
            f"(group of {g})")
        if len(walls) >= 2 and time.monotonic() - leg_t0 > leg_budget_s:
            _hb(f"train/DiT-XL: leg budget {leg_budget_s:.0f}s spent — "
                "stopping early")
            break
    sol = dit_train_sol_samples_per_sec(cfg, remat)
    mw = _min_wall_rate(walls, batch * max(accum, 1))
    imgs = mw["rate"]
    _hb(f"train/DiT-XL: min {min(walls)*1e3:.1f} ms/step, {imgs:.1f} img/s, "
        f"SoL {sol:.1f} ({imgs/sol*100:.1f}%), accum={accum}")
    del state
    out = {
        "step": "DiT flow transport",
        "preset": "DiT-XL/1",
        "imgs_per_sec": round(imgs, 2),
        "vs_matmul_sol": round(imgs / sol, 4),
        "remat": remat,
        "walls": mw["walls"],
    }
    if accum > 1:
        out["accum"] = accum
        out["microbatch"] = batch
    return out


def bench_dit() -> None:
    """BENCH_MODE=dit: DiT-XL/1 training-step throughput on f16d64
    latents (the reference's generation recipe: global batch 1024,
    generation/configs/train_vtp_l_dit_xl.yaml). 131.8 img/s at
    BENCH_ACCUM=8 vs 118.5 plain-step B=32 (round 3b ladder, PERF.md).
    BENCH_ACCUM=1 benches the plain jitted step."""
    r = measure_dit(
        batch=int(os.environ.get("BENCH_BATCH", "32")),
        iters=int(os.environ.get("BENCH_ITERS", "8")),
        accum=int(os.environ.get("BENCH_ACCUM", "8")),
    )
    _emit({
        "metric": ("DiT-XL/1 f16d64 train-step throughput (bf16, adaLN-zero, "
                   f"flow transport, accum={r.get('accum', 1)}); vs_baseline "
                   "= fraction of the analytic bf16 matmul speed-of-light "
                   "for this step+policy"),
        "value": r["imgs_per_sec"],
        "unit": "samples/sec/chip",
        "vs_baseline": r["vs_matmul_sol"],
    })


def main() -> None:
    preset = os.environ.get("BENCH_PRESET", "vtp-large")
    # batch 32 measured fastest for the roundtrip on v5e (133.9 img/s vs
    # 130.7 at 64, 124.1 at 128 — VMEM pressure grows with batch)
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    mode = os.environ.get("BENCH_MODE", "roundtrip")
    # bootstrap row: the artifact parses even if the very first
    # compile/dispatch wedges past the driver's own timeout (the
    # watchdog upgrades this with the hang location).
    _emit({
        "metric": f"{preset} 256px {mode} throughput",
        "value": None, "unit": "images/sec/chip", "vs_baseline": None,
        "error": "startup: no leg completed yet",
    })
    _start_watchdog()
    if mode == "train":
        return bench_train()
    if mode == "dit":
        return bench_dit()

    cfg = PRESETS[preset]()
    _hb(f"preset={preset} batch={batch} iters={iters} mode={mode} "
        f"device={jax.devices()[0]}")

    params = init_vtp_params(jax.random.key(0), cfg)
    # encode weights in bf16 (== autocast rounding), decoder stays fp32
    params["trunk"] = cast_matmul_params(params["trunk"], jnp.bfloat16)
    int8 = mode == "encode" and os.environ.get("BENCH_INT8") == "1"
    if int8:
        # serving option, NOT the parity protocol: W8A8 int8 encoder
        # (utils/quantization; measured +38% over bf16 encode on v5e,
        # latent err 2.6x the bf16 noise floor — PERF.md round 3)
        from vtp_tpu.utils.quantization import quantize_matmul_params

        params["trunk"] = quantize_matmul_params(params["trunk"])
    params = jax.device_put(params)

    g = cfg.latent_grid
    if mode == "decode":
        x = jax.random.normal(
            jax.random.key(1), (batch, cfg.vision_feature_bottleneck, g, g), jnp.float32
        )
    else:
        x = jax.random.normal(
            jax.random.key(1), (batch, 3, cfg.image_size, cfg.image_size), jnp.float32
        )

    def measure(decode_precision: str) -> dict:
        """Measure ``mode`` throughput at the given fp32-decode matmul
        precision ('high' = validated 3-pass, 'float32' = reference-exact
        6-pass — an explicit argument since round 5, so each precision is
        its own trace, no env/cache interplay)."""
        leg_t0 = time.monotonic()

        def encode(params, image):
            return get_reconstruction_latents(params, cfg, image, jnp.bfloat16)

        def decode(params, latents):
            return get_latents_decoded_images(params, cfg, latents, None,
                                              decode_precision)

        def roundtrip(params, image):
            return decode(params, encode(params, image))

        fn = {"roundtrip": roundtrip, "encode": encode, "decode": decode}[mode]

        # Chain iterations through a data dependency so the runtime
        # cannot dedupe/cache identical dispatches (the axon relay
        # does), and end with a host fetch (block_until_ready is a no-op
        # through the remote runtime — only a fetch synchronizes).
        def step(params, x, carry):
            xi = x + (1e-6 * carry).astype(x.dtype)
            return fn(params, xi)

        jfn = jax.jit(step)
        tap = jax.jit(lambda o: o.ravel()[0].astype(jnp.float32))
        zero = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        out = jfn(params, x, zero)
        _ = float(tap(out))
        _hb(f"{mode} dp={decode_precision} compile+first: "
            f"{time.perf_counter() - t0:.1f}s")
        _ = float(tap(jfn(params, x, zero)))  # warm steady-state

        # Walls are taken per GROUP of chained dispatches with ONE host
        # fetch at the group end: a fetch through the tunnel costs
        # ~25-30 ms RTT (measured: the per-iteration-fetch harness
        # inflated every leg by exactly that vs the round-3 artifact),
        # so per-iteration fetching would tax a 130 ms roundtrip ~20%.
        # Within a group the carry chains ON DEVICE (tap returns a
        # device scalar — each dispatch gets a fresh buffer, which keeps
        # the tunnel's dedup cache from collapsing them); min over
        # groups still excises grant wedges, group-granular.
        walls = []
        carry = zero
        done = 0
        while done < iters:
            g = _group_size(walls, iters - done)
            t0 = time.perf_counter()
            for _i in range(g):
                out = jfn(params, x, carry)
                carry = tap(out)  # device scalar: chain, don't sync
            _ = float(carry)  # host fetch = group sync (carry stays on device)
            wall = (time.perf_counter() - t0) / g
            walls.append(wall)  # one per-iteration wall sample per group
            done += g
            _hb(f"{mode} dp={decode_precision} iter {done}/{iters}: "
                f"{wall*1e3:.1f} ms/iter (group of {g})")
            if len(walls) >= 2 and time.monotonic() - leg_t0 > LEG_BUDGET_S:
                _hb(f"{mode} dp={decode_precision}: leg budget spent after "
                    f"{done} iters — stopping early")
                break
        return _min_wall_rate(walls, batch)

    # vs_baseline denominator: analytic SoL of the REFERENCE-EXACT
    # protocol (encode bf16 at peak + decode 6-pass fp32 emulation)
    sol = speed_of_light_imgs_per_sec(cfg, mode)
    enc, dec = roundtrip_flops(cfg)

    # headline: validated 3-pass decode (PERF.md: output error 38x below
    # the protocol's own bf16-latent noise floor). Audit trail: the
    # reference-exact 6-pass number ships in the same JSON.
    dp_headline = os.environ.get("BENCH_DECODE_PRECISION", "high")
    result = {
        "metric": (
            f"{preset} 256px {mode} throughput (bf16 encode / fp32 decode; "
            f"headline value = validated 3-pass fp32 decode, error 38x below "
            f"the protocol bf16 noise floor; value_exact = reference-exact "
            f"6-pass fp32 decode); vs_baseline = fraction of the "
            f"reference-exact 6-pass-decode speed-of-light"
        ),
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }
    if dp_headline != "high":
        result["metric"] = result["metric"].replace(
            "headline value = validated 3-pass fp32 decode, error 38x below "
            "the protocol bf16 noise floor",
            f"decode precision {dp_headline}")
    if int8:
        result["metric"] = result["metric"].replace(
            "bf16 encode",
            "int8 W8A8 encode (serving option, not the parity protocol)")

    try:
        mw = measure(dp_headline)
        imgs_per_sec = mw["rate"]
        result["value"] = round(imgs_per_sec, 2)
        result["vs_baseline"] = round(imgs_per_sec / sol, 4)
        result["walls"] = mw["walls"]
        _hb(f"{mode}: {imgs_per_sec:.1f} img/s, SoL {sol:.1f} img/s "
            f"({imgs_per_sec/sol*100:.1f}%), flops/img enc {enc/1e9:.1f}G "
            f"dec {dec/1e9:.1f}G")
    except Exception as e:  # pragma: no cover - OOM/compile guard
        _hb(f"{mode} dp={dp_headline} failed: {e}")
        result["error"] = str(e)[:200]
    _emit(result)  # leg 1 landed — the artifact is non-empty from here on

    if (mode in ("roundtrip", "decode") and dp_headline == "high"
            and _elapsed() < TOTAL_BUDGET_S - 120):
        try:
            mw = measure("float32")
            result["value_exact"] = round(mw["rate"], 2)
            result["vs_baseline_exact"] = round(mw["rate"] / sol, 4)
        except Exception as e:  # pragma: no cover
            _hb(f"{mode} dp=float32 failed: {e}")
            result["value_exact_error"] = str(e)[:200]
        _emit(result)

    if mode == "roundtrip" and os.environ.get("BENCH_TRAIN", "1") == "1":
        # train-mode numbers ride along in the same auditable JSON
        # (compiles amortized by the persistent XLA cache, utils/env).
        # Free the roundtrip model's device buffers first: the SSL train
        # step needs nearly all of HBM (round-2b: no-remat fits at batch
        # 32 with ~0.5 GB to spare) and OOMs if the VTP-L params linger.
        del params, x
        import gc

        gc.collect()
        train = []
        result["train"] = train
        train_iters = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))

        def run_leg(label, skip_row, fn):
            """One budgeted train leg: emit the full JSON after it lands
            (or errors), and skip with an explicit row when the total
            budget is too spent to start it."""
            if _elapsed() > TOTAL_BUDGET_S - 180:
                _hb(f"skipping {label}: total budget "
                    f"({TOTAL_BUDGET_S:.0f}s) nearly spent")
                train.append({**skip_row, "error": "budget"})
            else:
                try:
                    train.append(fn())
                except Exception as e:  # pragma: no cover - OOM guard
                    _hb(f"{label} failed: {e}")
                    train.append({**skip_row, "error": str(e)[:200]})
            gc.collect()
            _emit(result)

        for ssl in (False, True):
            remat, unroll = _train_env_config("vtp-base")
            run_leg(
                f"train vtp-base ssl={ssl}",
                {"step": "CLIP+SSL+rec" if ssl else "CLIP+rec",
                 "preset": "vtp-base"},
                lambda ssl=ssl, remat=remat, unroll=unroll: measure_train(
                    preset="vtp-base", batch=32, iters=train_iters,
                    ssl=ssl, remat=remat, unroll=unroll),
            )
        # flagship preset (BASELINE.md north star): VTP-L CLIP+rec.
        # Operating point from the round-4 ladder (PERF.md "VTP-L
        # accumulation ladder"): no-remat DOES compile at microbatch
        # <= 16 with bf16 Adam moments (the r3 OOM was B=32-specific),
        # and host accumulation to global 256 amortizes the ~700M-param
        # optimizer/EMA HBM pass — 75.2 img/s vs 68.4 plain B=16 and
        # 65.7 for remat=attn B=32 x accum 8. BENCH_REMAT/BENCH_UNROLL
        # still override (then plain-step B=32, fp32 moments — the
        # pre-ladder operating point).
        if os.environ.get("BENCH_REMAT") is None:
            l_remat, l_unroll, lbatch, mom, acc = False, True, 16, "bf16", 16
        else:
            l_remat, l_unroll = _train_env_config("vtp-large")
            lbatch, mom, acc = 32, "fp32", 1
        run_leg(
            "train vtp-large CLIP+rec",
            {"step": "CLIP+rec", "preset": "vtp-large"},
            lambda: measure_train(
                preset="vtp-large", batch=lbatch,
                iters=max(train_iters // 2, 4),
                ssl=False, remat=l_remat, unroll=l_unroll, moment_dtype=mom,
                accum=acc),
        )
        # flagship SSL pre-training step (round-4 verdict item 3): VTP-L
        # CLIP+SSL+rec. unroll=False is REQUIRED here: the unrolled
        # depth-24 SSL step overruns the tunnel's remote compile helper
        # even with every Pallas kernel disabled (pure XLA program-size
        # limit — experiments/r5_ssl_triage2.py); the lax.scan depth
        # loop compiles and runs. Operating point from the round-5
        # scan-path ladder (PERF.md, traces/r5_vtpl_ssl_ladder.json):
        # micro-16 x accum-16 (29.5 img/s) > micro-8 x accum-32 (27.9);
        # micro-32 OOMs even with remat="attn" (multi-crop activations),
        # no-remat fails the same remote-compile program-size limit.
        run_leg(
            "train vtp-large CLIP+SSL+rec",
            {"step": "CLIP+SSL+rec", "preset": "vtp-large"},
            lambda: measure_train(
                preset="vtp-large", batch=16,
                iters=max(train_iters // 2, 4),
                ssl=True, remat="attn", unroll=False, moment_dtype="bf16",
                accum=16),
        )
        # generation recipe: DiT-XL/1 with host-driven bf16 accumulation
        run_leg(
            "train DiT-XL",
            {"step": "DiT flow transport", "preset": "DiT-XL/1"},
            lambda: measure_dit(batch=32, iters=max(train_iters // 2, 4),
                                accum=8),
        )

    _emit(result)


if __name__ == "__main__":
    main()
