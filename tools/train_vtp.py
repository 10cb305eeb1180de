#!/usr/bin/env python3
"""VTP pre-training loop: CLIP + DINO/iBOT SSL + reconstruction.

The reference releases the training meta-architecture
(``vtp/models/vtp.py``) but not the loop that drives it (SURVEY.md
section 1: "The actual pre-training loop is not in the repo"). This
tool completes the framework: config -> multi-crop data pipeline
(``vtp_tpu.data.ssl_crops``) -> the jitted combined train step
(``vtp_tpu.train.step``) -> orbax checkpoints, running SPMD over the
device mesh (batch sharded on the ``data`` axis, params replicated).

CLIP captions come from ImageFolder class names ("a photo of a {c}")
tokenized once per class — the standard proxy when a folder dataset has
no paired text; swap in a captioned dataset for production runs.

Usage:
    python tools/train_vtp.py --preset vtp-base --data_dir /data/train \
        --batch_size 256 --steps 100000 --out ./vtp_ckpt
    python tools/train_vtp.py --synthetic --steps 20     # smoke/throughput
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="vtp-base",
                   help="vtp-small / vtp-base / vtp-large")
    p.add_argument("--config", default=None,
                   help="HF config.json or legacy VTP YAML (overrides --preset)")
    p.add_argument("--data_dir", default=None, help="ImageFolder root")
    p.add_argument("--synthetic", action="store_true",
                   help="random data (smoke tests / throughput runs)")
    p.add_argument("--objectives", default="clip,ssl,rec")
    p.add_argument("--batch_size", type=int, default=256, help="global batch")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: split the global batch "
                        "into this many microbatches per optimizer step "
                        "(reference-scale global batches, e.g. 1024, on "
                        "small meshes); contrastive negatives stay "
                        "within a microbatch")
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.04)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--teacher_momentum", type=float, default=0.994)
    p.add_argument("--local_crops", type=int, default=4)
    p.add_argument("--local_size", type=int, default=96)
    p.add_argument("--mask_ratio", type=float, default=0.3)
    p.add_argument("--compute_dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--moment_dtype", default="fp32", choices=["fp32", "bf16"],
                   help="Adam moment storage; bf16 halves optimizer HBM "
                        "traffic and frees one fp32 param copy of state "
                        "(sub-percent update noise — train/optim.py)")
    p.add_argument("--remat", default="full",
                   choices=["off", "full", "dots", "attn", "dots_attn"],
                   help="gradient-checkpoint policy (models/blocks.remat_wrap); "
                        "'off' + --unroll_layers is the fastest v5e config "
                        "when the model fits (see PERF.md)")
    p.add_argument("--no_remat", action="store_true",
                   help="deprecated alias for --remat off")
    p.add_argument("--unroll_layers", action="store_true",
                   help="fully unroll the block depth loop (faster backward, "
                        "slower compile)")
    p.add_argument("--unroll_chunk", type=int, default=0,
                   help="scan depth/k segments of k unrolled layers: most of "
                        "the unrolled-backward win at a fraction of its "
                        "compile cost (PERF.md round 3)")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--sequence_parallel", action="store_true",
                   help="Megatron-SP activation layout: shard residual "
                        "token rows over the model axis between the "
                        "column/row-parallel GEMM pairs (needs a model "
                        "axis > 1 in --mesh)")
    p.add_argument("--mesh", default=None,
                   help="DATA,MODEL mesh shape (default: all devices on data)")
    p.add_argument("--tp_head_major", action="store_true",
                   help="permute the trunk qkv parameters into model-rank-"
                        "major column groups (parallel.sharding."
                        "qkv_head_major) so the fused Pallas attention "
                        "kernels engage per-shard under the model axis "
                        "instead of the +47%% XLA fallback (PERF.md r5); "
                        "needs a model axis > 1 dividing vision_num_heads; "
                        "checkpoints carry the layout (resume with the "
                        "same flag; inverse-permute for export)")
    p.add_argument("--context_parallel", type=int, default=1,
                   help="shard the attention token dim over a seq axis of "
                        "this size (ring/Ulysses context parallelism, "
                        "ops/ring_attention.py); composes with the data "
                        "axis AND a model axis (CP×TP: heads shard over "
                        "model inside the CP arms when "
                        "vision_num_heads %% model == 0)")
    p.add_argument("--cp_mode", default="auto",
                   choices=["auto", "ring", "ulysses"],
                   help="context-parallel arm preference (auto = Ulysses "
                        "all-to-all when heads divide the seq axis, else "
                        "the ppermute KV ring)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="stage-shard the transformer depth over a pipe axis "
                        "of this size (GPipe ppermute schedule, "
                        "parallel/pipeline.py); composes with the data axis; "
                        "tower depths and the microbatch must divide cleanly "
                        "or that tower falls back to the sequential scan")
    p.add_argument("--out", default="./vtp_ckpt")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--export_hf", action="store_true",
                   help="also write an HF-style model dir at the end")
    p.add_argument("--allow_pseudo_captions", action="store_true",
                   help="tolerate a tokenizer/vocab mismatch (tiny debug "
                        "configs) by substituting deterministic pseudo-"
                        "captions instead of raising")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _load_config(args):
    from vtp_tpu.config import PRESETS, VTPConfig

    if args.config:
        if args.config.endswith((".yaml", ".yml")):
            return VTPConfig.from_vtp_yaml(args.config)
        return VTPConfig.from_hf_json(args.config)
    return PRESETS[args.preset]()


def _pseudo_captions(n_classes, context_length, vocab_size):
    import numpy as np

    rng = np.random.default_rng(0)
    toks = rng.integers(1, max(vocab_size - 1, 2),
                        size=(n_classes, context_length))
    return toks.astype(np.int64)


def _class_captions(classes, context_length, vocab_size,
                    allow_pseudo_captions=False):
    """Tokenize 'a photo of a {c}' once per class; degrades to
    deterministic pseudo-tokens ONLY when the BPE vocab asset is absent
    (zero-egress installs) or --allow_pseudo_captions is set (tiny debug
    vocabs). A silent tokenizer/config vocab mismatch would train CLIP
    against noise — that case raises."""
    import numpy as np

    try:
        from vtp_tpu.tokenizers import get_tokenizer

        tok = get_tokenizer(context_length=context_length)
    except (FileNotFoundError, OSError, ImportError) as e:
        # vocab asset missing — the only implicitly-degraded mode
        print(f"[train_vtp] BPE vocab unavailable ({e}); using pseudo-captions")
        return _pseudo_captions(len(classes), context_length, vocab_size)
    texts = [f"a photo of a {c.replace('_', ' ')}" for c in classes]
    toks = np.asarray(tok(texts))
    if toks.max() >= vocab_size:
        if allow_pseudo_captions:
            print(f"[train_vtp] BPE ids exceed text_vocab_size={vocab_size}; "
                  "--allow_pseudo_captions set, using pseudo-captions")
            return _pseudo_captions(len(classes), context_length, vocab_size)
        raise ValueError(
            f"BPE token ids (max {toks.max()}) exceed text_vocab_size="
            f"{vocab_size} — config/tokenizer mismatch; refusing to train "
            "CLIP against clipped captions (pass --allow_pseudo_captions "
            "for debug configs)"
        )
    return toks


def synthetic_batches(args, cfg, n_patches, start_step=0):
    import numpy as np

    from vtp_tpu.data.ssl_crops import make_mask_bookkeeping

    # fold the resume step into the seed so a resumed run continues on a
    # fresh batch/mask stream instead of replaying the first batches
    rng = np.random.default_rng([args.seed, start_step])
    b = args.batch_size
    S, L = cfg.image_size, args.local_size
    while True:
        ssl = make_mask_bookkeeping(rng, 2 * b, n_patches, args.mask_ratio)
        ssl["global_crops"] = rng.standard_normal((2 * b, 3, S, S), np.float32)
        ssl["local_crops"] = rng.standard_normal(
            (args.local_crops * b, 3, L, L), np.float32)
        yield {
            "image": ssl["global_crops"][:b],
            "text": rng.integers(1, cfg.text_vocab_size - 1,
                                 (b, cfg.text_context_length)),
            "rec_image": ssl["global_crops"][:b],
            "ssl": ssl,
        }


def folder_batches(args, cfg, n_patches, start_step=0):
    import numpy as np

    from vtp_tpu.data import DataLoader, ImageFolder, InfiniteSampler
    from vtp_tpu.data.ssl_crops import (
        MultiCropDataset,
        MultiCropTransform,
        collate_multicrop,
        make_mask_bookkeeping,
    )

    folder = ImageFolder(args.data_dir)
    captions = _class_captions(folder.classes, cfg.text_context_length,
                               cfg.text_vocab_size,
                               allow_pseudo_captions=args.allow_pseudo_captions)
    transform = MultiCropTransform(
        global_size=cfg.image_size,
        local_size=args.local_size,
        n_local=args.local_crops,
    )
    # fold the resume step into every stream seed: a resumed run must
    # continue on fresh samples/augs/masks, not replay the first
    # start_step batches with identical randomness
    ds = MultiCropDataset(folder, transform, seed=args.seed + 7919 * start_step)
    loader = DataLoader(
        ds, args.batch_size,
        sampler=InfiniteSampler(len(ds), seed=args.seed + 7919 * start_step),
        num_workers=args.num_workers, drop_last=True,
        collate=collate_multicrop,
    )
    rng = np.random.default_rng([args.seed + 1, start_step])
    for global_crops, local_crops, labels in loader:
        b = labels.shape[0]
        ssl = make_mask_bookkeeping(rng, 2 * b, n_patches, args.mask_ratio)
        ssl["global_crops"] = global_crops
        ssl["local_crops"] = local_crops
        yield {
            "image": global_crops[:b],
            "text": captions[labels],
            "rec_image": global_crops[:b],
            "ssl": ssl,
        }


def main(argv=None) -> None:
    args = parse_args(argv)
    if not args.synthetic and not args.data_dir:
        raise SystemExit("pass --data_dir or --synthetic")

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vtp_tpu.checkpoint import (
        latest_train_state_step,
        restore_train_state,
        save_pretrained,
        save_train_state,
        wait_for_checkpoints,
    )
    from vtp_tpu.parallel import make_mesh
    from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

    cfg = _load_config(args)
    objectives = set(args.objectives.split(","))
    n_devices = jax.device_count()
    n_seq = args.context_parallel
    n_pipe = args.pipeline_parallel
    if args.mesh:
        n_data, n_model = (int(x) for x in args.mesh.split(","))
    else:
        n_data, n_model = n_devices // max(n_seq, 1) // max(n_pipe, 1), 1
    if n_seq > 1 and n_model > 1:
        # CP×TP composes (round 5): heads shard over model inside the
        # CP arms when the head count divides cleanly
        if cfg.vision_num_heads % n_model:
            raise SystemExit(
                f"--context_parallel with a model axis needs "
                f"vision_num_heads ({cfg.vision_num_heads}) % model "
                f"({n_model}) == 0")
    if n_seq > 1 and n_data * n_seq * n_model != n_devices:
        raise SystemExit(f"--context_parallel {n_seq} x data {n_data} x "
                         f"model {n_model} != {n_devices} devices")
    if n_pipe > 1:
        if n_model > 1 or n_seq > 1:
            raise SystemExit("--pipeline_parallel composes with the data "
                             "axis only (one of pipe/seq/model per mesh)")
        if n_data * n_pipe != n_devices:
            raise SystemExit(f"--pipeline_parallel {n_pipe} x data {n_data} "
                             f"!= {n_devices} devices")
        for tower, depth in (("vision", cfg.vision_depth),
                             ("text", cfg.text_depth),
                             ("decoder", cfg.decoder_depth)):
            if depth % n_pipe:
                print(f"[train_vtp] note: {tower} depth {depth} % pipe "
                      f"{n_pipe} != 0 — that tower runs the sequential "
                      f"scan (data-parallel only)", flush=True)
    if args.sequence_parallel and n_model <= 1:
        # without a model axis constrain_residual falls back to the
        # data-only layout — SP would silently no-op (round-4 advisor)
        raise SystemExit("--sequence_parallel needs a model axis > 1 "
                         "(--mesh DATA,MODEL); it would silently no-op "
                         "on this mesh")
    if args.tp_head_major:
        if n_model <= 1:
            raise SystemExit("--tp_head_major needs a model axis > 1 "
                             "(--mesh DATA,MODEL); the canonical layout is "
                             "already optimal single-rank")
        if cfg.vision_num_heads % n_model:
            raise SystemExit(f"--tp_head_major: vision_num_heads "
                             f"{cfg.vision_num_heads} % model {n_model} != 0")
    if args.batch_size % max(args.accum_steps * n_data, 1):
        raise SystemExit(f"global batch {args.batch_size} must divide by "
                         f"accum_steps x data axis "
                         f"({args.accum_steps} x {n_data})")
    # generators yield microbatches; the optimizer still sees
    # args.batch_size samples per step (accum_steps of them stacked)
    micro_bs = args.batch_size // args.accum_steps
    tcfg = TrainConfig(
        train_clip="clip" in objectives,
        train_ssl="ssl" in objectives,
        train_reconstruction="rec" in objectives,
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps,
        total_steps=args.steps,
        teacher_momentum=args.teacher_momentum,
        compute_dtype=None if args.compute_dtype == "fp32" else "bf16",
        remat=(False if (args.no_remat or args.remat == "off")
               else True if args.remat == "full" else args.remat),
        unroll_layers=(args.unroll_chunk or args.unroll_layers),
        drop_shards=n_data,
        accum_steps=args.accum_steps,
        moment_dtype=args.moment_dtype,
        sequence_parallel=args.sequence_parallel,
        pipeline_stages=n_pipe,
        tp_head_major=n_model if args.tp_head_major else 1,
    )

    state = init_state(jax.random.key(args.seed), cfg, tcfg)
    start_step = 0
    # The head-major qkv layout is shape- and dtype-identical to the
    # canonical one, so restore_train_state cannot detect a mismatch —
    # resuming a --tp_head_major run without the flag (or vice versa)
    # would silently read rank-major [Q_r|K_r|V_r] columns as [Q|K|V].
    # A sidecar records the layout the run was started with.
    import json as _json

    meta_path = os.path.join(args.out, "train_meta.json")
    want_hm = tcfg.tp_head_major
    if args.resume and latest_train_state_step(args.out) is not None:
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                saved_hm = int(_json.load(f).get("qkv_head_major", 1))
            if saved_hm != want_hm:
                raise SystemExit(
                    f"--resume layout mismatch: {args.out} was trained with "
                    f"qkv_head_major={saved_hm} but this run requests "
                    f"{want_hm} (--tp_head_major and the model-axis size "
                    f"must match the original run; the permuted layout is "
                    f"shape-identical, so this cannot be auto-detected)")
        state = restore_train_state(args.out, state)
        start_step = int(state["step"])
        print(f"[train_vtp] resumed from step {start_step}")

    if n_seq > 1:
        from vtp_tpu.parallel.mesh import make_cp_mesh

        mesh = make_cp_mesh(n_seq, n_data, n_model, mode=args.cp_mode)
    elif n_pipe > 1:
        from vtp_tpu.parallel.pipeline import make_pp_mesh

        mesh = make_pp_mesh(n_pipe, n_data)
    else:
        mesh = make_mesh(n_data, n_model) if n_devices > 1 else None
    if mesh is not None:
        from vtp_tpu.parallel import shard_params

        if n_model > 1:  # Megatron column/row rules on the model axis
            state["params"] = shard_params(state["params"], mesh)
            if "teacher" in state:
                state["teacher"] = shard_params(state["teacher"], mesh)
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))

        # with accumulation the leading axis is (accum_steps,) microbatch
        # stacking (scanned over on-device); the data axis moves to 1
        _lead = (None,) if args.accum_steps > 1 else ()

        def shard(batch):
            def put(x):
                x = np.asarray(x)
                spec = P(*_lead, "data",
                         *([None] * (x.ndim - 1 - len(_lead))))
                return jax.device_put(x, NamedSharding(mesh, spec))

            out = {k: put(v) for k, v in batch.items() if k != "ssl"}
            if "ssl" in batch:
                ssl = batch["ssl"]
                out["ssl"] = {
                    "global_crops": put(ssl["global_crops"]),
                    "local_crops": put(ssl["local_crops"]),
                    "masks": put(ssl["masks"]),
                    # flat-index bookkeeping addresses the global token
                    # table -> replicate
                    "mask_indices": jax.device_put(
                        ssl["mask_indices"], NamedSharding(mesh, P())),
                    "mask_weight": jax.device_put(
                        ssl["mask_weight"], NamedSharding(mesh, P())),
                }
            return out
    else:
        def shard(batch):
            return jax.tree_util.tree_map(np.asarray, batch)

    step_fn = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    n_patches = (cfg.image_size // cfg.vision_patch_size) ** 2
    gen_args = copy.copy(args)
    gen_args.batch_size = micro_bs
    batches = (synthetic_batches if args.synthetic else folder_batches)(
        gen_args, cfg, n_patches, start_step=start_step)
    if args.accum_steps > 1:
        micro_gen = batches

        def _stacked():
            while True:
                micros = [next(micro_gen) for _ in range(args.accum_steps)]
                yield jax.tree.map(lambda *xs: np.stack(xs), *micros)

        batches = _stacked()
    key = jax.random.fold_in(jax.random.key(args.seed + 2), start_step)

    os.makedirs(args.out, exist_ok=True)
    with open(meta_path, "w") as f:
        _json.dump({"qkv_head_major": want_hm}, f)
    t0 = time.time()
    imgs = 0
    for step in range(start_step, args.steps):
        batch = shard(next(batches))
        if not tcfg.train_clip:
            batch.pop("image", None)
            batch.pop("text", None)
        if not tcfg.train_reconstruction:
            batch.pop("rec_image", None)
        if not tcfg.train_ssl:
            batch.pop("ssl", None)
        key, sub = jax.random.split(key)
        if mesh is not None:
            with jax.set_mesh(mesh):
                state, metrics = step_fn(state, batch, sub)
        else:
            state, metrics = step_fn(state, batch, sub)
        imgs += args.batch_size
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t0
            losses = " ".join(f"{k.split('/')[-1]}={v:.4f}" for k, v in m.items())
            print(f"[train_vtp] step {step + 1}/{args.steps} "
                  f"{imgs / dt:.1f} img/s {losses}", flush=True)
            if not all(np.isfinite(v) for v in m.values()):
                raise SystemExit(f"non-finite loss at step {step + 1}: {m}")
            t0, imgs = time.time(), 0
        if (step + 1) % args.ckpt_every == 0 or step + 1 == args.steps:
            # async: staged to host on return, written in background;
            # the final wait_for_checkpoints() makes the last one durable
            save_train_state(args.out, jax.device_get(state), step=step + 1,
                             block=False)
            print(f"[train_vtp] checkpoint @ step {step + 1} -> {args.out}")

    wait_for_checkpoints()
    if args.export_hf:
        export_dir = os.path.join(args.out, "hf_export")
        params = {k: v for k, v in jax.device_get(state["params"]).items()
                  if k != "dino_head"}
        save_pretrained(export_dir, cfg, params)
        print(f"[train_vtp] HF-style export -> {export_dir}")


if __name__ == "__main__":
    main()
