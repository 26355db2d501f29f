"""Host-side image loading.

Parity with ``health_multimodal/image/data/io.py:49-71``: JPEG/PNG via PIL,
NIfTI via SimpleITK, DICOM via pydicom (both gated — absent in this image's
environment, raising a clear error), min-max remap to uint8, grayscale.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

# This module is the decode-worker import surface (engine/extract.py::
# manifest_image_iterator pickles these loaders into a process pool): it
# must stay jax-free — remap_to_uint8 lives in ops/preprocess, which
# imports jax at module level, so it is imported lazily below.


def load_image(path: str | Path, percentiles: Optional[Tuple[float, float]] = None) -> np.ndarray:
    """Load an image as a (H, W) uint8 grayscale array."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".jpg", ".jpeg", ".png"):
        from PIL import Image

        pil = Image.open(path)
        if pil.mode == "P":
            # palette PNGs: skimage's imread (the reference loader,
            # io.py:38) applies the palette; raw indices would be remapped
            # as if they were intensities
            pil = pil.convert("RGB")
        image = np.asarray(pil)
    elif [s.lower() for s in path.suffixes[-2:]] == [".nii", ".gz"] or suffix == ".nii":
        try:
            import SimpleITK as sitk
        except ImportError as e:
            raise ImportError("NIfTI loading requires SimpleITK") from e
        image = sitk.GetArrayFromImage(sitk.ReadImage(str(path)))
        if image.shape[0] == 1:
            image = np.squeeze(image, axis=0)
        if image.ndim != 2:
            raise ValueError(f"expected a 2-D NIfTI slice, got shape {image.shape}")
    elif suffix == ".dcm":
        try:
            import pydicom
        except ImportError as e:
            raise ImportError("DICOM loading requires pydicom") from e
        image = pydicom.dcmread(path).pixel_array
    else:
        raise ValueError(f"Image type not supported, filename was: {path}")

    from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
        remap_to_uint8,
    )

    image = remap_to_uint8(np.asarray(image), percentiles)
    if image.ndim == 3:  # RGB(A) -> luma grayscale (PIL 'L' convention)
        from PIL import Image

        image = np.asarray(Image.fromarray(image).convert("L"))
    return image


def load_image_raw_uint8(path: str | Path) -> np.ndarray:
    """CheXpert extraction-path loader (``DataRetrieval.py:89``
    ``torchvision.io.read_image``): raw uint8, grayscaled, NO remap."""
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img)
