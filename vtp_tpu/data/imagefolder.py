"""Class-per-directory image dataset (torchvision ImageFolder semantics,
implemented torchvision-free).

The reference's eval harnesses consume ``torchvision.datasets.ImageFolder``
(tools/test_reconstruction_hf.py:329, test_linear_probing_hf.py et al.):
classes are the sorted subdirectory names, samples are (path, class_idx),
iterated in sorted order. We reproduce that contract exactly so metric
sample ordering matches.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")


def list_image_files(directory: str) -> List[str]:
    return sorted(
        f for f in os.listdir(directory)
        if f.lower().endswith(IMG_EXTENSIONS)
    )


class ImageFolder:
    """samples[i] = (path, class_index); classes sorted like torchvision."""

    def __init__(
        self,
        root: str,
        transform: Optional[Callable[[Image.Image], np.ndarray]] = None,
        loader: Optional[Callable[[str], Image.Image]] = None,
    ):
        self.root = root
        self.transform = transform
        self.loader = loader or (lambda p: Image.open(p).convert("RGB"))
        self.classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if not self.classes:
            # flat directory of images -> single pseudo-class
            self.classes = ["."]
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in self.classes:
            cdir = os.path.join(root, c) if c != "." else root
            for f in list_image_files(cdir):
                self.samples.append((os.path.join(cdir, f), self.class_to_idx[c]))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        return img, label
