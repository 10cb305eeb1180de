"""Batched serving runtime."""

import numpy as np
import pytest

import jax

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vtp_model import VTPModel
from vtp_tpu.serve import VTPServer

TINY = VTPConfig(
    image_size=32, vision_patch_size=16, vision_embed_dim=64, vision_depth=2,
    vision_num_heads=2, vision_feature_bottleneck=16, text_context_length=8,
    text_vocab_size=64, text_embed_dim=64, text_num_heads=2, text_depth=2,
    decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
)


@pytest.fixture(scope="module")
def server():
    model = VTPModel.init(jax.random.key(0), TINY, encode_dtype=None)
    srv = VTPServer(model, batch_size=4, max_wait_ms=20)
    yield srv
    srv.shutdown()


def test_batched_encode_roundtrip(server, rng):
    imgs = [rng.standard_normal((n, 3, 32, 32)).astype(np.float32) for n in (1, 3, 2)]
    futs = [server.submit_encode(x) for x in imgs]
    outs = [f.result(timeout=120) for f in futs]
    for x, z in zip(imgs, outs):
        assert z.shape == (x.shape[0], 16, 2, 2)
    # coalesced result identical to direct call
    direct = np.asarray(server.model.get_reconstruction_latents(imgs[1]))
    np.testing.assert_allclose(outs[1], direct, atol=1e-5)

    dec = server.submit_decode(outs[0]).result(timeout=120)
    assert dec.shape == (1, 3, 32, 32)


def test_mixed_kinds(server, rng):
    img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    tok = rng.integers(1, 60, (2, 8))
    f1 = server.submit_clip_image(img)
    f2 = server.submit_clip_text(tok)
    assert f1.result(timeout=120).shape == (2, 64)
    assert f2.result(timeout=120).shape == (2, 64)


def test_mixed_kind_contention(rng):
    """Under sustained mixed load every kind completes (no starvation),
    per-kind FIFO order is preserved, and results match direct calls."""
    model = VTPModel.init(jax.random.key(1), TINY, encode_dtype=None)
    srv = VTPServer(model, batch_size=4, max_wait_ms=5, warmup=False)
    try:
        imgs = [rng.standard_normal((1, 3, 32, 32)).astype(np.float32) for _ in range(6)]
        lats = [rng.standard_normal((1, 16, 2, 2)).astype(np.float32) for _ in range(6)]
        futs = []
        for i in range(6):  # interleave kinds
            futs.append(("encode", i, srv.submit_encode(imgs[i])))
            futs.append(("decode", i, srv.submit_decode(lats[i])))
        for kind, i, f in futs:
            out = f.result(timeout=120)
            if kind == "encode":
                want = np.asarray(model.get_reconstruction_latents(imgs[i]))
            else:
                want = np.asarray(model.get_latents_decoded_images(lats[i]))
            np.testing.assert_allclose(out, want, atol=1e-5, err_msg=f"{kind} {i}")
    finally:
        srv.shutdown()


def test_serves_quantized_model(rng):
    """VTPServer composes with quantize_for_serving(): int8 encode/clip
    through the queue, fp32 decode untouched."""
    model = VTPModel.init(jax.random.key(3), TINY, encode_dtype=None)
    srv = VTPServer(model.quantize_for_serving(), batch_size=4,
                    max_wait_ms=5, warmup=False)
    try:
        img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        z = srv.submit_encode(img).result(timeout=120)
        want = np.asarray(model.get_reconstruction_latents(img), np.float32)
        got = np.asarray(z, np.float32)
        cos = float(got.ravel() @ want.ravel()
                    / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-12))
        assert cos > 0.99, cos
        dec = srv.submit_decode(got).result(timeout=120)
        assert dec.shape == (2, 3, 32, 32) and dec.dtype == np.float32
    finally:
        srv.shutdown()


def test_shutdown_fails_pending_futures(rng):
    """shutdown() must fail queued-but-unprocessed futures instead of
    leaving them pending forever; later submits fail immediately."""
    model = VTPModel.init(jax.random.key(2), TINY, encode_dtype=None)
    srv = VTPServer(model, batch_size=4, max_wait_ms=5, warmup=False)
    # park the dispatcher, then inject a request directly into the
    # queue so it is genuinely pending when shutdown() runs
    srv._stop.set()
    srv._thread.join(timeout=30)
    from vtp_tpu.serve import _Request

    req = _Request("encode", rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    with srv._cv:
        srv._queues["encode"].append(req)
    srv.shutdown()
    with pytest.raises(RuntimeError):
        req.future.result(timeout=5)
    fut2 = srv.submit_encode(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    with pytest.raises(RuntimeError):
        fut2.result(timeout=5)


def test_data_parallel_server(rng):
    """mesh= mode: the coalesced batch shards over the data axis and
    results match the single-device server bit-for-bit."""
    from vtp_tpu.parallel import make_mesh

    model = VTPModel.init(jax.random.key(0), TINY, encode_dtype=None)
    plain = VTPServer(model, batch_size=8, max_wait_ms=20, warmup=False)
    imgs = rng.standard_normal((6, 3, 32, 32)).astype(np.float32)
    want = plain.submit_encode(imgs).result(timeout=120)
    plain.shutdown()

    mesh = make_mesh(8, 1)
    model_dp = VTPModel.init(jax.random.key(0), TINY, encode_dtype=None)
    srv = VTPServer(model_dp, batch_size=8, max_wait_ms=20, warmup=False, mesh=mesh)
    try:
        # params got placed on the mesh by the framework's partition specs
        for leaf in jax.tree.leaves(srv.model.params):
            assert isinstance(leaf.sharding, jax.sharding.NamedSharding)
            assert leaf.sharding.mesh == mesh
        got = srv.submit_encode(imgs).result(timeout=120)
        dec = srv.submit_decode(got).result(timeout=120)
        assert dec.shape == (6, 3, 32, 32)
    finally:
        srv.shutdown()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_data_parallel_server_rejects_bad_batch():
    from vtp_tpu.parallel import make_mesh

    model = VTPModel.init(jax.random.key(0), TINY, encode_dtype=None)
    with pytest.raises(ValueError, match="data axis"):
        VTPServer(model, batch_size=6, warmup=False, mesh=make_mesh(8, 1))
