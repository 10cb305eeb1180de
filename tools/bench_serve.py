#!/usr/bin/env python3
"""Mixed-load benchmark for the VTPServer serving runtime (serve.py).

Drives concurrent encode / decode / clip-image clients against one
`VTPServer` on the real chip and reports per-kind p50/p99 request
latency plus aggregate throughput — the production-readiness numbers
for the serving layer (the reference ships no server; this is the
framework-native analogue of its batch-eval loops).

Each client submits fixed-size row chunks back-to-back (closed loop);
request latency = submit -> future.result(), which includes queueing,
batch coalescing (max_wait), TPU execution, and the host fetch.

Usage (on TPU):
    python tools/bench_serve.py [--preset vtp-large] [--seconds 45]
        [--rows 8] [--batch_size 32] [--clients encode,decode,clip_image]

Prints one JSON line (bench.py conventions).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="vtp-large")
    p.add_argument("--seconds", type=float, default=45.0)
    p.add_argument("--rows", type=int, default=8, help="rows per request")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--clients", default="encode,decode,clip_image",
                   help="comma list of request kinds, one client thread each")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    import numpy as np

    import jax

    from vtp_tpu.config import PRESETS
    from vtp_tpu.models.vtp_model import VTPModel
    from vtp_tpu.serve import VTPServer

    cfg = PRESETS[args.preset]()
    import jax.numpy as jnp

    model = VTPModel.init(jax.random.key(0), cfg, encode_dtype=jnp.bfloat16)
    server = VTPServer(model, batch_size=args.batch_size,
                       max_wait_ms=args.max_wait_ms)

    s = cfg.image_size
    g = s // cfg.vision_patch_size
    rng = np.random.default_rng(0)
    payloads = {
        "encode": rng.standard_normal((args.rows, 3, s, s)).astype(np.float32),
        "decode": rng.standard_normal(
            (args.rows, cfg.vision_feature_bottleneck, g, g)).astype(np.float32),
        "clip_image": rng.standard_normal((args.rows, 3, s, s)).astype(np.float32),
        "clip_text": rng.integers(
            1, cfg.text_vocab_size - 2,
            (args.rows, cfg.text_context_length)).astype(np.int64),
    }

    kinds = [k.strip() for k in args.clients.split(",") if k.strip()]
    for k in kinds:
        if k not in payloads:
            raise SystemExit(f"unknown client kind {k}")

    # host<->device transfer floor: image serving intrinsically moves
    # the request/response bytes; through the remote (axon) tunnel that
    # link — not the dispatcher — can be the wall. Report it so the
    # latency numbers are interpretable (on a local PCIe/ICI host this
    # floor is negligible).
    import jax.numpy as jnp2  # noqa: F401

    probe = np.zeros((args.batch_size, 3, s, s), np.float32)  # ~25 MB
    t0 = time.perf_counter()
    n_probe = 3
    for _ in range(n_probe):
        dev = jax.device_put(probe)
        _ = np.asarray(dev)
    rt = (time.perf_counter() - t0) / n_probe
    mb = probe.nbytes / 1e6
    print(f"[serve-bench] transfer floor: {mb:.0f} MB up+down in {rt*1e3:.0f} ms "
          f"({2 * mb / rt:.0f} MB/s)", file=sys.stderr)
    transfer = {"mb_each_way": round(mb, 1), "roundtrip_ms": round(rt * 1e3, 1),
                "mb_per_sec": round(2 * mb / rt, 1)}

    # per-kind executable warmup through the server (compiles happen
    # here, not inside the measured window)
    for k in kinds:
        server.submit(k, payloads[k]).result()

    stop = threading.Event()
    lat = {k: [] for k in kinds}
    done_rows = {k: 0 for k in kinds}

    def client(kind: str):
        while not stop.is_set():
            t0 = time.perf_counter()
            fut = server.submit(kind, payloads[kind])
            fut.result()
            lat[kind].append(time.perf_counter() - t0)
            done_rows[kind] += args.rows

    threads = [threading.Thread(target=client, args=(k,), daemon=True)
               for k in kinds]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    elapsed = time.perf_counter() - t_start
    server.shutdown()

    stats = {}
    total_rows = 0
    for k in kinds:
        arr = np.sort(np.array(lat[k]))
        if len(arr) == 0:
            continue
        stats[k] = {
            "requests": int(len(arr)),
            "p50_ms": round(float(np.quantile(arr, 0.5)) * 1e3, 1),
            "p99_ms": round(float(np.quantile(arr, 0.99)) * 1e3, 1),
            "rows_per_sec": round(done_rows[k] / elapsed, 1),
        }
        total_rows += done_rows[k]
        print(f"[serve-bench] {k:11s} n={len(arr):5d} "
              f"p50={stats[k]['p50_ms']:7.1f}ms p99={stats[k]['p99_ms']:7.1f}ms "
              f"{stats[k]['rows_per_sec']:7.1f} rows/s", file=sys.stderr)

    print(json.dumps({
        "metric": (f"{args.preset} VTPServer mixed-load "
                   f"({'+'.join(kinds)}, {args.rows}-row requests, "
                   f"batch {args.batch_size}): aggregate rows/sec; "
                   f"per-kind p50/p99 in 'kinds'"),
        "value": round(total_rows / elapsed, 1),
        "unit": "rows/sec/chip",
        "vs_baseline": None,
        "kinds": stats,
        "host_device_transfer_floor": transfer,
    }))


if __name__ == "__main__":
    main()
