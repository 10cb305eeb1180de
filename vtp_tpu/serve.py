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

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vtp_tpu.models.vtp_model import VTPModel


class _Request:
    __slots__ = ("kind", "payload", "future")

    def __init__(self, kind: str, payload: np.ndarray):
        self.kind = kind
        self.payload = payload
        self.future: Future = Future()


class VTPServer:
    """Single-device batched inference server (threaded dispatcher)."""

    def __init__(
        self,
        model: VTPModel,
        batch_size: int = 32,
        max_wait_ms: float = 5.0,
        warmup: bool = True,
    ):
        self.model = model
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._fns: Dict[str, Callable] = {
            "encode": model.get_reconstruction_latents,
            "decode": model.get_latents_decoded_images,
            "clip_image": model.get_clip_image_feature,
            "clip_text": model.get_clip_text_feature,
        }
        if warmup:
            self._warmup()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- api

    def submit(self, kind: str, payload: np.ndarray) -> Future:
        if kind not in self._fns:
            raise ValueError(f"unknown request kind {kind}")
        req = _Request(kind, np.asarray(payload))
        self._queue.put(req)
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
        self._stop.set()
        self._thread.join(timeout=30)

    # -------------------------------------------------------- internals

    def _warmup(self) -> None:
        cfg = self.model.config
        s = cfg.image_size
        g = cfg.image_size // cfg.vision_patch_size
        img = jnp.zeros((self.batch_size, 3, s, s), jnp.float32)
        lat = jnp.zeros((self.batch_size, cfg.vision_feature_bottleneck, g, g), jnp.float32)
        np.asarray(self.model.get_reconstruction_latents(img))
        np.asarray(self.model.get_latents_decoded_images(lat))

    def _collect_batch(self) -> List[_Request]:
        """Pull requests of one kind until batch_size rows or max_wait."""
        first = None
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
                break
            except queue.Empty:
                continue
        if first is None:
            return []
        batch = [first]
        rows = first.payload.shape[0]
        deadline = self.max_wait
        import time

        t0 = time.monotonic()
        backlog: List[_Request] = []
        while rows < self.batch_size:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req.kind != first.kind:
                backlog.append(req)  # different op: next dispatch round
                continue
            batch.append(req)
            rows += req.payload.shape[0]
        for req in backlog:
            self._queue.put(req)
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
            # pad to the fixed batch shape -> cached executable
            pad = (-n) % self.batch_size
            if pad:
                stacked = np.concatenate(
                    [stacked, np.repeat(stacked[-1:], pad, axis=0)], axis=0
                )
            try:
                outs = []
                for s in range(0, stacked.shape[0], self.batch_size):
                    out = self._fns[kind](jnp.asarray(stacked[s : s + self.batch_size]))
                    outs.append(np.asarray(out))
                result = np.concatenate(outs, axis=0)[:n]
            except Exception as e:  # pragma: no cover
                for r in batch:
                    r.future.set_exception(e)
                continue
            off = 0
            for r in batch:
                k = r.payload.shape[0]
                r.future.set_result(result[off : off + k])
                off += k
