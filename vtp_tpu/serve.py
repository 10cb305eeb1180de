"""Batched serving runtime for the VTP tokenizer.

Production-serving layer the reference does not have: requests
(encode / decode / clip-embed) are queued, coalesced into fixed-size
batches (padding the tail), executed on TPU by a single dispatcher
thread, and results are handed back per-request via futures. Fixed
batch shapes mean every request after warmup hits a cached executable.

Usage:
    server = VTPServer(model, batch_size=32)
    fut = server.submit_encode(images_nchw)       # (n, 3, S, S) float32
    latents = fut.result()                        # (n, d, S/p, S/p)
"""

from __future__ import annotations

import itertools
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vtp_tpu.models.vtp_model import VTPModel

_seq = itertools.count()


class _Request:
    __slots__ = ("kind", "payload", "future", "seq")

    def __init__(self, kind: str, payload: np.ndarray):
        self.kind = kind
        self.payload = payload
        self.future: Future = Future()
        self.seq = next(_seq)


class VTPServer:
    """Batched inference server (threaded dispatcher).

    ``mesh``: optional ``jax.sharding.Mesh`` — the coalesced batch is
    sharded over its ``data`` axis and the params are placed by the
    framework's partition specs (replicated under pure DP), so serving
    inherits the mesh exactly like the eval harnesses do. Single-device
    when None (the default)."""

    def __init__(
        self,
        model: VTPModel,
        batch_size: int = 32,
        max_wait_ms: float = 5.0,
        warmup: bool = True,
        mesh=None,
        tp_head_major: bool = False,
    ):
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh
        if mesh is not None:
            import dataclasses as _dc

            from vtp_tpu.parallel.mesh import (
                DATA_AXIS, MODEL_AXIS, mesh_axis_size,
            )
            from vtp_tpu.parallel.sharding import (
                permute_trunk_qkv, shard_params,
            )

            n_data = mesh_axis_size(mesh, DATA_AXIS)
            if batch_size % max(n_data, 1):
                raise ValueError(
                    f"batch_size {batch_size} must divide over the mesh "
                    f"data axis ({n_data} shards)"
                )
            if tp_head_major:
                # head-major TP layout (parallel.sharding.qkv_head_major):
                # the fused attention kernels engage per model shard
                # instead of the XLA fallback (+47% — PERF.md round 5).
                # Permute the loaded canonical trunk and tag the config;
                # must happen BEFORE shard_params and any jit.
                n_model = mesh_axis_size(mesh, MODEL_AXIS)
                heads = model.config.vision_num_heads
                if n_model <= 1:
                    raise ValueError("tp_head_major needs a model axis > 1")
                if heads % n_model:
                    raise ValueError(
                        f"tp_head_major: vision_num_heads {heads} % model "
                        f"axis {n_model} != 0")
                if model.config.vision_qkv_head_major == 1:
                    model.params = dict(
                        model.params,
                        trunk=permute_trunk_qkv(
                            model.params["trunk"], heads, n_model),
                    )
                    model.config = _dc.replace(
                        model.config, vision_qkv_head_major=n_model)
                    # jit entries created before this permute closed over
                    # the canonical-layout config and would slice the
                    # permuted qkv columns as [Q|K|V] — silently wrong.
                    model._jitted.clear()
                elif model.config.vision_qkv_head_major != n_model:
                    raise ValueError(
                        f"checkpoint layout vision_qkv_head_major="
                        f"{model.config.vision_qkv_head_major} does not "
                        f"match the mesh model axis {n_model}")
            model.params = shard_params(model.params, mesh)
        self.max_wait = max_wait_ms / 1000.0
        self._stop = threading.Event()
        self._fns: Dict[str, Callable] = {
            "encode": model.get_reconstruction_latents,
            "decode": model.get_latents_decoded_images,
            "clip_image": model.get_clip_image_feature,
            "clip_text": model.get_clip_text_feature,
        }
        # Per-kind FIFO queues; the dispatcher serves the kind whose
        # head request is globally oldest, so under sustained mixed load
        # no kind can starve and per-kind order is preserved (the old
        # single-queue requeue-to-back scheme could do both).
        self._queues: Dict[str, deque] = {k: deque() for k in self._fns}
        self._cv = threading.Condition()
        if warmup:
            self._warmup()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- api

    def submit(self, kind: str, payload: np.ndarray) -> Future:
        if kind not in self._fns:
            raise ValueError(f"unknown request kind {kind}")
        req = _Request(kind, np.asarray(payload))
        with self._cv:
            if self._stop.is_set():
                req.future.set_exception(RuntimeError("VTPServer is shut down"))
                return req.future
            self._queues[kind].append(req)
            self._cv.notify_all()
        return req.future

    def submit_encode(self, images) -> Future:
        return self.submit("encode", images)

    def submit_decode(self, latents) -> Future:
        return self.submit("decode", latents)

    def submit_clip_image(self, images) -> Future:
        return self.submit("clip_image", images)

    def submit_clip_text(self, tokens) -> Future:
        return self.submit("clip_text", tokens)

    def shutdown(self) -> None:
        """Stop the dispatcher and FAIL all still-queued futures — no
        request is ever left permanently pending."""
        self._stop.set()
        with self._cv:
            self._cv.notify_all()
        self._thread.join(timeout=30)
        with self._cv:
            pending = [r for q in self._queues.values() for r in q]
            for q in self._queues.values():
                q.clear()
        for r in pending:
            r.future.set_exception(
                RuntimeError("VTPServer shut down with request pending")
            )

    # -------------------------------------------------------- internals

    def _mesh_ctx(self):
        """Ambient-mesh context for dispatcher calls: under a mesh the
        Pallas attention kernels need it to engage their shard_map
        dispatch (ops/flash_attention.py); no-op single-device."""
        import contextlib

        return jax.set_mesh(self.mesh) if self.mesh is not None else contextlib.nullcontext()

    def _to_device(self, x: jax.Array) -> jax.Array:
        if self.mesh is None:
            return x
        from vtp_tpu.parallel.sharding import batch_sharding

        return jax.device_put(x, batch_sharding(self.mesh, x.ndim))

    def _warmup(self) -> None:
        cfg = self.model.config
        s = cfg.image_size
        g = cfg.image_size // cfg.vision_patch_size
        img = jnp.zeros((self.batch_size, 3, s, s), jnp.float32)
        lat = jnp.zeros((self.batch_size, cfg.vision_feature_bottleneck, g, g), jnp.float32)
        with self._mesh_ctx():
            np.asarray(self.model.get_reconstruction_latents(self._to_device(img)))
            np.asarray(self.model.get_latents_decoded_images(self._to_device(lat)))

    def _oldest_kind(self) -> Optional[str]:
        heads = [(q[0].seq, k) for k, q in self._queues.items() if q]
        return min(heads)[1] if heads else None

    def _collect_batch(self) -> List[_Request]:
        """Serve the kind whose head request is globally oldest; keep
        pulling same-kind requests until batch_size rows or max_wait."""
        with self._cv:
            while not self._stop.is_set():
                kind = self._oldest_kind()
                if kind is not None:
                    break
                self._cv.wait(timeout=0.1)
            else:
                return []
            batch: List[_Request] = []
            rows = 0
            deadline = time.monotonic() + self.max_wait
            while not self._stop.is_set():
                q = self._queues[kind]
                while q and rows < self.batch_size:
                    req = q.popleft()
                    batch.append(req)
                    rows += req.payload.shape[0]
                if rows >= self.batch_size:
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cv.wait(timeout=remaining)
            return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._collect_batch()
            if not batch:
                continue
            kind = batch[0].kind
            payloads = [r.payload for r in batch]
            stacked = np.concatenate(payloads, axis=0)
            n = stacked.shape[0]
            try:
                outs = []
                with self._mesh_ctx():
                    for s in range(0, n, self.batch_size):
                        chunk = stacked[s : s + self.batch_size]
                        k = chunk.shape[0]
                        dev = jnp.asarray(chunk)
                        if k < self.batch_size:
                            # pad to the fixed batch shape ON DEVICE and
                            # fetch only the valid rows: the host<->device
                            # link (25 MB/batch for 256px images; an 11 MB/s
                            # straw through the remote tunnel) must never
                            # carry padding bytes. The tiny pad op compiles
                            # once per distinct k <= batch_size.
                            dev = jnp.concatenate(
                                [dev, jnp.repeat(dev[-1:], self.batch_size - k, axis=0)]
                            )
                        out = self._fns[kind](self._to_device(dev))
                        outs.append(np.asarray(out[:k]))
                result = np.concatenate(outs, axis=0)
            except Exception as e:  # pragma: no cover
                for r in batch:
                    r.future.set_exception(e)
                continue
            off = 0
            for r in batch:
                k = r.payload.shape[0]
                r.future.set_result(result[off : off + k])
                off += k
