"""Round 3: quantify the iBOT x drop-path gradient spike (VERDICT #1).

With ssl_drop_rate > 0, a sample dropped from every residual branch
leaves its masked patch tokens exactly equal to the zero-initialized
mask_token; the DINO head's torch-faithful eps-clamped L2-normalize
(eps 1e-12) then has Jacobian ~1/eps on those rows, blowing the global
grad norm to ~1e11 and rescaling the whole clipped step by ~1e-11.

This script measures, on CPU at the dryrun config:
  * per-objective + total grad norms vs ssl_drop_rate, with the
    torch-faithful clamp vs the zero-safe normalize;
  * spike frequency over N independent step keys (a spike requires at
    least one fully-dropped sample among the global crops);
  * that the two normalize modes produce IDENTICAL losses (values only
    differ in the gradient at the measure-zero point).

Run: JAX_PLATFORMS=cpu python experiments/r3_grad_spike.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vtp_tpu.config import VTPConfig
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state, make_ssl_batch

CFG = VTPConfig(
    image_size=32, vision_patch_size=16, vision_embed_dim=64,
    vision_depth=2, vision_num_heads=2, vision_feature_bottleneck=16,
    text_context_length=8, text_vocab_size=128, text_embed_dim=64,
    text_num_heads=2, text_depth=2,
    decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
)


def run(drop_rate: float, zero_safe: bool, n_keys: int = 20):
    tcfg = TrainConfig(
        dino_out_dim=64, dino_hidden_dim=32, dino_bottleneck_dim=16,
        warmup_steps=0, total_steps=10,
        clip_drop_rate=drop_rate, ssl_drop_rate=drop_rate,
        zero_safe_normalize=zero_safe,
    )
    state = init_state(jax.random.key(0), CFG, tcfg)
    b = 8
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    batch = {
        "image": jax.random.normal(k1, (b, 3, 32, 32)),
        "text": jax.random.randint(k2, (b, 8), 1, 127),
        "rec_image": jax.random.normal(k1, (b, 3, 32, 32)),
        "ssl": make_ssl_batch(k3, b, global_size=32, local_size=16, n_local=2),
    }
    step = build_train_step(CFG, tcfg)
    jstep = jax.jit(lambda s, bt, k: step(s, bt, k)[1])
    jnorms = jax.jit(step.objective_grad_norms)
    norms, per_obj = [], None
    for i in range(n_keys):
        key = jax.random.key(100 + i)
        m = jstep(state, batch, key)
        norms.append(float(m["grad_norm"]))
        if i == 0:
            per_obj = {k: float(v) for k, v in jnorms(state, batch, key).items()}
            losses = {k: float(v) for k, v in m.items() if k.startswith("loss")}
    import numpy as np

    norms = np.array(norms)
    spikes = int((norms > 1e5).sum())
    return dict(
        drop=drop_rate, zero_safe=zero_safe,
        median=float(np.median(norms)), max=float(norms.max()),
        spike_frac=spikes / n_keys, per_obj=per_obj, losses=losses,
    )


def main():
    # (loss-value parity between the two modes is proven separately:
    # tests/test_train_step.py::test_zero_safe_normalize_values_and_jacobian
    # and the dryrun's unchanged step-1 losses vs round 2)
    print(f"{'drop':>5} {'safe':>5} {'median':>12} {'max':>12} {'spike%':>7}  per-objective (first key)")
    for drop in (0.0, 0.25, 0.5):
        for zero_safe in (False, True):
            r = run(drop, zero_safe, n_keys=16)
            po = " ".join(f"{k.split('/')[-1]}={v:.3g}" for k, v in sorted(r["per_obj"].items()))
            print(f"{r['drop']:>5} {str(r['zero_safe']):>5} {r['median']:>12.4g} "
                  f"{r['max']:>12.4g} {r['spike_frac']*100:>6.0f}%  {po}", flush=True)


if __name__ == "__main__":
    main()
