"""Checkpoint IO.

Two formats:
  * **native**: flattened param pytree -> one safetensors file +
    ``config.json`` (keys are '/'-joined paths). Loads back with exact
    dtypes. This is the framework's own interchange format, mirroring
    the role of HF ``save_pretrained`` (modeling_vtp.py uses HF/safetensors
    exclusively — SURVEY.md section 5.4).
  * **orbax**: full training state (params + opt state + teacher +
    centers) for resumable training, sharding-aware.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import VTPConfig

_SEP = "/"
_NONE_MARKER = "__none__"


def flatten_params(params: Any) -> Dict[str, np.ndarray]:
    flat = {}

    def visit(path, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(path + (str(k),), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(path + (str(i),), v)
        elif node is None:
            flat[_SEP.join(path) + _SEP + _NONE_MARKER] = np.zeros((0,), np.float32)
        else:
            flat[_SEP.join(path)] = np.asarray(node)

    visit((), params)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        if parts[-1] == _NONE_MARKER:
            parts = parts[:-1]
            value = None
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = None if value is None else jnp.asarray(value)
    return root


def save_pretrained(path: str, config: VTPConfig, params: Any) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"model_format": "vtp_tpu", **config.to_dict()}, f, indent=2)
    flat = flatten_params(params)
    # safetensors cannot store bf16 via numpy directly on old versions;
    # ml_dtypes-backed arrays pass through on current ones.
    save_file(flat, os.path.join(path, "model.safetensors"))


def load_pretrained(path: str) -> Tuple[VTPConfig, Any]:
    from safetensors.numpy import load_file

    with open(os.path.join(path, "config.json")) as f:
        cfg_dict = json.load(f)
    if cfg_dict.get("model_format") != "vtp_tpu":
        # fall through to the torch-checkpoint converter
        from vtp_tpu.convert.from_torch import load_vtp_checkpoint

        return load_vtp_checkpoint(path)
    config = VTPConfig.from_dict(cfg_dict)
    params = unflatten_params(load_file(os.path.join(path, "model.safetensors")))
    return config, params


# ----------------------------------------------------------------- orbax


_async_ckptr = None


def _checkpointer():
    """Process-wide orbax StandardCheckpointer (an AsyncCheckpointer:
    ``save`` returns once the arrays are staged to host memory; disk
    serialization runs in a background thread — safe to keep stepping
    with donated buffers immediately after it returns)."""
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.StandardCheckpointer()
    return _async_ckptr


def save_train_state(
    directory: str, state: Any, step: Optional[int] = None, block: bool = True
) -> None:
    """``block=False`` overlaps the disk write with subsequent train
    steps; call :func:`wait_for_checkpoints` before process exit (and
    before reading the checkpoint back)."""
    path = os.path.abspath(directory)
    step = int(state["step"]) if step is None else step
    ckptr = _checkpointer()
    ckptr.save(os.path.join(path, f"step_{step:08d}"), state, force=True)
    if block:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Block until every in-flight async checkpoint write is durable."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def latest_train_state_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(directory)
        if (m := re.match(r"step_(\d+)$", d))
    ]
    return max(steps) if steps else None


def restore_train_state(
    directory: str,
    template: Any,
    step: Optional[int] = None,
    allow_dtype_mismatch: bool = False,
) -> Any:
    """Restore into ``template``'s structure/shardings.

    Guards against silent dtype casts on resume: orbax restores into the
    template's dtypes, so resuming with e.g. a different
    ``--moment_dtype`` than the checkpoint was written with would
    otherwise silently cast the saved fp32 Adam moments to bf16 (an
    untracked numerics change). Any leaf dtype mismatch raises unless
    ``allow_dtype_mismatch=True``."""
    import orbax.checkpoint as ocp

    step = latest_train_state_step(directory) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        if not allow_dtype_mismatch:
            import jax
            import numpy as np

            try:
                meta = ckptr.metadata(path)
                # StepMetadata wraps the per-leaf ArrayMetadata tree;
                # older orbax returned the tree directly
                tree_meta = getattr(meta, "item_metadata", None)
                meta = getattr(tree_meta, "tree", tree_meta) or meta
            except Exception:
                meta = None
            if meta is not None:
                def _tokens(path):
                    # normalize DictKey/SequenceKey/GetAttrKey to plain
                    # strings: orbax metadata stores namedtuple fields as
                    # dict keys ("['mu']") where the template path says
                    # ".mu" — raw keystr comparison would never match
                    out = []
                    for e in path:
                        for attr in ("key", "idx", "name"):
                            if hasattr(e, attr):
                                out.append(str(getattr(e, attr)))
                                break
                        else:
                            out.append(str(e))
                    return tuple(out)

                t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
                m_leaves = jax.tree_util.tree_flatten_with_path(
                    meta, is_leaf=lambda x: hasattr(x, "dtype")
                )[0]
                stored = {
                    _tokens(k): getattr(v, "dtype", None) for k, v in m_leaves
                }
                bad = []
                for k, leaf in t_leaves:
                    ks = _tokens(k)
                    want = getattr(leaf, "dtype", None)
                    have = stored.get(ks)
                    if (want is not None and have is not None
                            and np.dtype(want) != np.dtype(have)):
                        bad.append(
                            f"  {'/'.join(ks)}: checkpoint {have} "
                            f"vs template {want}"
                        )
                if bad:
                    raise ValueError(
                        f"checkpoint {path} dtype mismatch (did --moment_dtype "
                        "change since it was written?); pass "
                        "allow_dtype_mismatch=True to cast on restore:\n"
                        + "\n".join(bad[:10])
                        + ("" if len(bad) <= 10 else f"\n  ... {len(bad) - 10} more")
                    )
        return ckptr.restore(path, template)
