"""ImageNet zero-shot classification.

Behavioral reference: ``tools/test_zero_shot_hf.py`` — the 1000 embedded
classnames and 80 OpenAI prompt templates (shipped here as JSON data),
classifier built 10 classes at a time (80 x 10 texts per step, mean over
templates, renormalize), eval as ``100 * img_feat @ classifier`` with
top-1/top-5 counting.

TPU-native deltas: the text encode for the classifier build is one
jitted (800, 77) program reused for every chunk; BPE token IDs are
cached per (classnames, templates) pair on disk; the image loop shards
its global batch over the data mesh via NamedSharding.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vtp_model import get_clip_image_feature, get_clip_text_feature

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")


def load_imagenet_classnames() -> List[str]:
    with open(os.path.join(_DATA_DIR, "imagenet_classnames.json")) as f:
        return json.load(f)


def load_openai_templates() -> List[str]:
    """80 prompt templates, as format strings ('a photo of a {}.')."""
    with open(os.path.join(_DATA_DIR, "openai_imagenet_templates.json")) as f:
        return json.load(f)


def _token_cache_path(classnames, templates, context_length: int) -> str:
    h = hashlib.sha256(
        json.dumps([list(classnames), list(templates), context_length]).encode()
    ).hexdigest()[:16]
    cache_dir = os.environ.get(
        "VTP_CACHE_DIR", os.path.expanduser("~/.cache/vtp_tpu")
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"zeroshot_tokens_{h}.npy")


def tokenize_classifier_prompts(
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[str],
    context_length: int = 77,
) -> np.ndarray:
    """(num_classes * num_templates, L) token ids, disk-cached — the
    80k-text BPE pass dominates classifier build time otherwise."""
    path = _token_cache_path(classnames, templates, context_length)
    if os.path.exists(path):
        return np.load(path)
    texts = [t.format(c) for c in classnames for t in templates]
    tokens = tokenizer(texts, context_length=context_length)
    np.save(path, tokens)
    return tokens


def build_zero_shot_classifier(
    params: dict,
    cfg: VTPConfig,
    tokenizer,
    classnames: Optional[Sequence[str]] = None,
    templates: Optional[Sequence[str]] = None,
    num_classes_per_batch: int = 10,
    compute_dtype=jnp.bfloat16,
    progress: bool = False,
) -> jax.Array:
    """-> (embed_dim, num_classes) classifier matrix
    (test_zero_shot_hf.py:342-394)."""
    classnames = classnames if classnames is not None else load_imagenet_classnames()
    templates = templates if templates is not None else load_openai_templates()
    n_t = len(templates)
    tokens = tokenize_classifier_prompts(
        tokenizer, classnames, templates, context_length=cfg.text_context_length
    )
    tokens = tokens.reshape(len(classnames), n_t, -1)

    @jax.jit
    def encode_chunk(params, chunk_tokens):
        nc = chunk_tokens.shape[0]
        feats = get_clip_text_feature(
            params, cfg, chunk_tokens.reshape(nc * n_t, -1),
            normalize=True, compute_dtype=compute_dtype,
        )
        feats = feats.reshape(nc, n_t, -1).mean(axis=1)
        norm = jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        return (feats / norm).T  # (D, nc)

    cols = []
    steps = range(0, len(classnames), num_classes_per_batch)
    if progress:
        from tqdm import tqdm  # type: ignore

        steps = tqdm(list(steps), desc="building classifier")
    for start in steps:
        chunk = tokens[start : start + num_classes_per_batch]
        if chunk.shape[0] != num_classes_per_batch:
            pad = num_classes_per_batch - chunk.shape[0]
            out = encode_chunk(params, np.concatenate([chunk, chunk[:pad]], 0))
            out = out[:, : chunk.shape[0]]
        else:
            out = encode_chunk(params, chunk)
        cols.append(out)
    return jnp.concatenate(cols, axis=1)


def topk_counts(logits: jax.Array, targets: jax.Array, ks: Tuple[int, ...] = (1, 5)):
    """Top-k correct counts (test_zero_shot_hf.py:312-316)."""
    max_k = max(ks)
    _, pred = jax.lax.top_k(logits, max_k)  # (B, max_k)
    correct = pred == targets[:, None]
    return [jnp.sum(correct[:, :k]).astype(jnp.float32) for k in ks]


def evaluate_zero_shot(
    params: dict,
    cfg: VTPConfig,
    classifier: jax.Array,
    dataloader,
    compute_dtype=jnp.bfloat16,
    sharding=None,
    progress: bool = False,
) -> Tuple[float, float]:
    """Returns (top1%, top5%) (test_zero_shot_hf.py:401-441). Image
    batches come from the loader as (B, 3, S, S) fp32 NCHW, already
    resized + ImageNet-normalized."""

    @jax.jit
    def step(params, classifier, images, targets):
        feats = get_clip_image_feature(
            params, cfg, images, normalize=True, compute_dtype=compute_dtype
        )
        logits = 100.0 * feats @ classifier.astype(feats.dtype)
        c1, c5 = topk_counts(logits, targets)
        return c1, c5

    it = dataloader
    if progress:
        from tqdm import tqdm  # type: ignore

        it = tqdm(dataloader, desc="zero-shot eval")
    import contextlib

    # ambient mesh so the Pallas attention kernels engage their
    # shard_map dispatch (ops/flash_attention.py) instead of being
    # replicated by GSPMD across the data shards
    ctx = (jax.set_mesh(sharding.mesh) if sharding is not None
           else contextlib.nullcontext())
    with ctx:
        return _zero_shot_loop(it, step, params, classifier, sharding)


def _zero_shot_loop(it, step, params, classifier, sharding):
    top1 = top5 = n = 0.0
    for images, targets in it:
        images = jnp.asarray(images)
        targets = jnp.asarray(targets)
        b = images.shape[0]
        if sharding is not None:
            # pad the tail batch up to the data axis instead of silently
            # dropping the sharding; padded rows get target -1, which can
            # never match a top-k prediction, so counts are unaffected
            pad = (-b) % sharding.mesh.shape["data"]
            if pad:
                images = jnp.concatenate(
                    [images, jnp.repeat(images[-1:], pad, axis=0)], axis=0
                )
                targets = jnp.concatenate(
                    [targets, jnp.full((pad,), -1, targets.dtype)], axis=0
                )
            images = jax.device_put(images, sharding)
        c1, c5 = step(params, classifier, images, targets)
        top1 += float(c1)
        top5 += float(c5)
        n += b
    return top1 / n * 100.0, top5 / n * 100.0
