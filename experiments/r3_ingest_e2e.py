"""Round 3 (VERDICT #7): ingest-to-TPU end-to-end benchmark.

Measures, on a synthetic JPEG ImageFolder:
  1. host-only ingest throughput: native C++ loader vs a PIL loop doing
     the same ADM-crop + normalize (the reference transform,
     generation/tools/extract_features_vtp.py:54-66) -> the ratio the
     ingest.cpp header claims;
  2. end-to-end img/s: native loader (threaded, prefetching) feeding the
     jitted VTP-L bf16 encode on the TPU — the number with input
     included;
  3. per-pixel LSB error histogram native-vs-PIL (feeds the tightened
     parity test bound).

Caveat recorded with the numbers: this box exposes ONE CPU core, so the
host ingest rate here is a single-thread floor; the thread pool scales
on real hosts.

Run ON TPU: nohup python -u experiments/r3_ingest_e2e.py > log &
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import numpy as np

N_IMAGES = 512
BATCH = 32
TARGET = 256
ROOT = "/tmp/r3_ingest_imgs"


def make_dataset():
    from PIL import Image

    os.makedirs(f"{ROOT}/cls0", exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(N_IMAGES):
        p = f"{ROOT}/cls0/{i:04d}.jpg"
        if not os.path.exists(p):
            arr = rng.integers(0, 255, (384, 384, 3), np.uint8)
            Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def pil_batch(paths, mean, std):
    """The reference eval transform: ADM center-crop + normalize."""
    from PIL import Image

    from vtp_tpu.utils.image import center_crop_arr

    out = np.empty((len(paths), 3, TARGET, TARGET), np.float32)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB")
        arr = np.asarray(center_crop_arr(img, TARGET), np.float32) / 255.0
        arr = (arr - mean) / std
        out[i] = arr.transpose(2, 0, 1)
    return out


def main():
    paths = make_dataset()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    from vtp_tpu.data.imagefolder import ImageFolder
    from vtp_tpu.data.native_loader import NativeImageLoader
    from vtp_tpu.native import ingest_batch, native_available

    assert native_available(), "native ingest failed to build"
    folder = ImageFolder(ROOT)

    # ---- 1. host-only: native vs PIL --------------------------------
    n_warm = 2 * BATCH
    _ = ingest_batch(paths[:n_warm], TARGET, mean=mean, std=std)  # warm
    t0 = time.perf_counter()
    native_out = ingest_batch(paths, TARGET, mean=mean, std=std)
    t_native = time.perf_counter() - t0

    _ = pil_batch(paths[:BATCH], mean, std)  # warm
    t0 = time.perf_counter()
    pil_out = pil_batch(paths, mean, std)
    t_pil = time.perf_counter() - t0

    print(f"host ingest: native {N_IMAGES/t_native:7.1f} img/s | "
          f"PIL {N_IMAGES/t_pil:7.1f} img/s | ratio {t_pil/t_native:.2f}x "
          f"(single core)", flush=True)

    # ---- 3. LSB histogram -------------------------------------------
    # de-normalize both to pixel units; 1 LSB = 1/255
    lsb = np.abs(native_out - pil_out) * std[None, :, None, None] * 255.0
    hist = [float((lsb <= t).mean()) for t in (0.5, 1.5, 2.5)]
    print(f"native-vs-PIL pixel error: <=0 LSB {hist[0]*100:.3f}% | "
          f"<=1 LSB {hist[1]*100:.4f}% | <=2 LSB {hist[2]*100:.5f}% | "
          f"max {lsb.max():.2f} LSB", flush=True)

    # ---- 2. end-to-end: native loader -> TPU encode ------------------
    import jax
    import jax.numpy as jnp

    from vtp_tpu.config import PRESETS
    from vtp_tpu.models.vtp_model import get_reconstruction_latents, init_vtp_params
    from vtp_tpu.utils import cast_matmul_params

    cfg = PRESETS["vtp-large"]()
    params = init_vtp_params(jax.random.key(0), cfg)
    params["trunk"] = cast_matmul_params(params["trunk"], jnp.bfloat16)
    params = jax.device_put(params)

    @jax.jit
    def encode(params, x):
        lat = get_reconstruction_latents(params, cfg, x, jnp.bfloat16)
        return lat.astype(jnp.float32).ravel()[0]  # tiny tap fetches later

    # warm/compile
    loader = NativeImageLoader(folder, BATCH, target=TARGET, drop_last=True)
    first = next(iter(loader))[0]
    _ = float(encode(params, jnp.asarray(first)))

    t0 = time.perf_counter()
    n = 0
    taps = []
    for x, _lab in loader:
        taps.append(encode(params, jnp.asarray(x)))
        n += x.shape[0]
    _ = [float(t) for t in taps]  # host fetch = sync (axon tunnel rules)
    dt = time.perf_counter() - t0
    print(f"e2e native-ingest -> VTP-L bf16 encode: {n/dt:7.1f} img/s "
          f"({n} imgs, {dt:.1f}s; device-only encode is ~716 img/s)",
          flush=True)

    # PIL-fed comparison (same protocol, eval-parity path)
    t0 = time.perf_counter()
    n = 0
    taps = []
    for s in range(0, (len(paths) // BATCH) * BATCH, BATCH):
        x = pil_batch(paths[s:s + BATCH], mean, std)
        taps.append(encode(params, jnp.asarray(x)))
        n += BATCH
    _ = [float(t) for t in taps]
    dt = time.perf_counter() - t0
    print(f"e2e PIL-ingest    -> VTP-L bf16 encode: {n/dt:7.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
