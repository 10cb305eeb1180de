"""Import the PyTorch reference (read-only at /root/reference) for
numerical-parity oracles. omegaconf is absent from the environment, so a
minimal stub is injected (only the legacy VTP training class needs it,
and only at construction time)."""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub_omegaconf() -> None:
    if "omegaconf" in sys.modules:
        return
    om = types.ModuleType("omegaconf")

    class DictConfig(dict):
        pass

    class OmegaConf:
        @staticmethod
        def load(path):
            raise NotImplementedError("omegaconf stub")

        @staticmethod
        def create(d):
            return d

        @staticmethod
        def merge(a, b):
            raise NotImplementedError("omegaconf stub")

        @staticmethod
        def from_cli(args):
            raise NotImplementedError("omegaconf stub")

    om.DictConfig = DictConfig
    om.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = om


def _stub_torchvision() -> None:
    """The reference's text_utils imports torchvision's FrozenBatchNorm2d
    (unused by the model paths we test); torchvision is absent here."""
    if "torchvision" in sys.modules:
        return
    import importlib.machinery

    import torch.nn as nn

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    tv = _mod("torchvision")
    ops = _mod("torchvision.ops")
    misc = _mod("torchvision.ops.misc")

    class FrozenBatchNorm2d(nn.Module):
        pass

    misc.FrozenBatchNorm2d = FrozenBatchNorm2d
    ops.misc = misc
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc


def reference_available() -> bool:
    import os

    return os.path.isdir(REFERENCE_PATH)


def load_reference():
    """Returns the reference's vtp package modules (torch CPU)."""
    _stub_omegaconf()
    _stub_torchvision()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import vtp.models.vtp_hf as vtp_hf  # noqa

    return vtp_hf


def torch_state_dict_to_numpy(model):
    import numpy as np

    return {k: v.detach().to("cpu").float().numpy() for k, v in model.state_dict().items()}
