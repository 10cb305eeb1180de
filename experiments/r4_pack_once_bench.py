"""Round-4 experiment: measure the pack-once block-stack refactor
(blocks.py block_apply_flat — the residual stream stays packed across
the whole depth stack instead of re-packing per layer).

Targets (VERDICT r3 item 4): SSL >= 105 img/s or CLIP+rec >= 220 img/s
at vtp-base. Round-3 baselines at the same operating point (no-remat +
unrolled depth loop, B=32): CLIP+rec 209.2, SSL 96.3 img/s.

Run on the axon TPU: nohup python -u experiments/r4_pack_once_bench.py
> /tmp/r4_pack.log 2>&1 &  (never two TPU processes at once)
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from bench import measure_train  # noqa: E402

print(f"device: {jax.devices()[0]}", flush=True)

results = {}
for tag, ssl in [("cliprec", False), ("ssl", True)]:
    print(f"== {tag}", flush=True)
    try:
        results[tag] = measure_train(
            preset="vtp-base", batch=32, iters=10, ssl=ssl,
            remat=False, unroll=True,
        )
    except Exception as e:  # noqa: BLE001 - record and continue
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results[tag] = None

print(json.dumps(results, indent=2), flush=True)
