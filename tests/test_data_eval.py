"""Data pipeline + eval-harness machinery tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from vtp_tpu.data import DataLoader, ImageFolder, InfiniteSampler, ShardedSampler


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for cls in ["class_a", "class_b"]:
        d = root / cls
        d.mkdir()
        for i in range(7):
            arr = rng.integers(0, 255, (40, 40, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    return str(root)


def test_imagefolder_contract(image_dir):
    ds = ImageFolder(image_dir)
    assert ds.classes == ["class_a", "class_b"]
    assert len(ds) == 14
    img, label = ds[0]
    assert label == 0 and img.size == (40, 40)
    # torchvision parity: sorted order
    import torch.utils.data  # noqa: F401 — torch present for comparison only

    paths = [p for p, _ in ds.samples]
    assert paths == sorted(paths)


def test_sharded_sampler_matches_torch_distributed_sampler(image_dir):
    from torch.utils.data.distributed import DistributedSampler

    class Dummy:
        def __len__(self):
            return 14

    for shuffle in (False,):
        for rank in range(4):
            ref = DistributedSampler(
                Dummy(), num_replicas=4, rank=rank, shuffle=shuffle
            )
            got = ShardedSampler(14, shard=rank, num_shards=4, shuffle=shuffle).indices()
            assert list(got) == list(iter(ref)), (rank, shuffle)


def test_dataloader_batches(image_dir):
    def transform(img):
        return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0

    ds = ImageFolder(image_dir, transform=transform)
    loader = DataLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    x, y = batches[0]
    assert x.shape == (4, 3, 40, 40) and y.shape == (4,)
    assert sum(b[0].shape[0] for b in batches) == 14


def test_infinite_sampler_covers_all():
    it = iter(InfiniteSampler(10, seed=0))
    seen = [next(it) for _ in range(20)]
    assert sorted(seen[:10]) == list(range(10))
    assert sorted(seen[10:]) == list(range(10))
    assert seen[:10] != seen[10:]  # reshuffled per epoch


def test_topk_counts_matches_torch(rng):
    import torch

    from vtp_tpu.eval.zero_shot import topk_counts

    logits = rng.normal(0, 1, (16, 50)).astype(np.float32)
    targets = rng.integers(0, 50, 16)
    c1, c5 = topk_counts(jnp.asarray(logits), jnp.asarray(targets))

    out = torch.from_numpy(logits)
    tgt = torch.from_numpy(targets)
    pred = out.topk(5, 1, True, True)[1].t()
    correct = pred.eq(tgt.view(1, -1).expand_as(pred))
    want1 = float(correct[:1].reshape(-1).float().sum())
    want5 = float(correct[:5].reshape(-1).float().sum())
    assert float(c1) == want1 and float(c5) == want5


def test_linear_probe_learns_separable_data():
    """End-to-end probe-head training on trivially separable features."""
    from vtp_tpu.eval.linear_probe import (
        ProbeConfig,
        _cross_entropy,
        _head_logits,
        init_probe_heads,
        init_probe_state,
    )
    from vtp_tpu.config import VTPConfig

    cfg = VTPConfig(vision_embed_dim=16)
    pcfg = ProbeConfig(
        n_last_blocks_list=(1,), learning_rates=(1e-2, 1e-1),
        num_classes=4, epochs=1, epoch_length=50, batch_size=32,
    )
    heads = init_probe_heads(jax.random.key(0), cfg, pcfg, 32)
    state = init_probe_state(heads)

    rng = np.random.default_rng(0)
    protos = rng.normal(0, 1, (4, 32)).astype(np.float32)

    def batch(key):
        labels = rng.integers(0, 4, 32)
        x = protos[labels] + 0.1 * rng.normal(0, 1, (32, 32)).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(labels)

    @jax.jit
    def step(state, x, labels):
        def loss_fn(heads):
            return jnp.sum(_cross_entropy(_head_logits(heads["n1"], x), labels))

        loss, g = jax.value_and_grad(loss_fn)(state["heads"])
        h = state["heads"]["n1"]
        m = state["momentum"]["n1"]
        mw = 0.9 * m["w"] + g["n1"]["w"]
        mb = 0.9 * m["b"] + g["n1"]["b"]
        lr = h["lr"][:, None, None]
        new = {
            "heads": {"n1": {"w": h["w"] - lr * mw, "b": h["b"] - lr[..., 0] * mb, "lr": h["lr"]}},
            "momentum": {"n1": {"w": mw, "b": mb}},
            "step": state["step"] + 1,
        }
        return new, loss

    losses = []
    for i in range(50):
        x, y = batch(i)
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0]

    x, y = batch(99)
    logits = _head_logits(state["heads"]["n1"], x)
    acc = np.mean(np.asarray(jnp.argmax(logits[1], -1)) == np.asarray(y))
    assert acc > 0.95
