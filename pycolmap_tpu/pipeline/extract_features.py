"""Database-writing feature extraction pipeline.

API parity: pycolmap/pipeline/extract_features.h:143-153 (``extract_features``)
wrapping the reference's threaded extractor controller (SURVEY.md §3.1).
Here the "controller" is a simple loop: the heavy work (the SIFT kernels)
runs on device per image; DB writes are transactional.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pycolmap_tpu.features.sift import Sift, SiftExtractionOptions
from pycolmap_tpu.pipeline.images import (
    CameraMode,
    ImageReaderOptions,
    import_images,
    read_image_gray_u8,
)
from pycolmap_tpu.scene import Database, DatabaseTransaction


def _resize_to_max(img: np.ndarray, max_size: int):
    """Downsample so max(h, w) <= max_size; returns (img, scale).

    uint8 stays uint8 across the resize (quantization <= 1/255, far below
    SIFT's noise floor) so the device upload keeps the 4x u8 size win."""
    h, w = img.shape
    if max(h, w) <= max_size:
        return img, 1.0
    scale = max_size / max(h, w)
    import jax
    import jax.numpy as jnp

    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    out = np.asarray(
        jax.image.resize(
            jnp.asarray(img, dtype=jnp.float32), (new_h, new_w),
            method="bilinear",
        )
    )
    if img.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out, max(h, w) / max_size


def extract_features(
    database_path,
    image_path,
    image_names=None,
    camera_mode: CameraMode = CameraMode.AUTO,
    camera_model: str = "SIMPLE_RADIAL",
    reader_options: ImageReaderOptions = None,
    sift_options: SiftExtractionOptions = None,
    device=None,
    verbose: bool = False,
):
    """Import images + extract SIFT + write keypoints/descriptors to the DB."""
    if reader_options is None:
        reader_options = ImageReaderOptions()
    if camera_model:
        reader_options.camera_model = camera_model
    if sift_options is None:
        sift_options = SiftExtractionOptions()

    import_images(database_path, image_path, camera_mode, image_names, reader_options)

    db = Database(database_path)
    sift = Sift(sift_options)
    image_path = Path(image_path)
    # same-size images batch into one vmapped device call (P3 data-parallel
    # extraction, SURVEY.md §2c; single-image extraction is latency-bound)
    batch_size = 4

    def _flush(batch):
        if not batch:
            return
        results = sift.extract_batch([arr for _, arr, _ in batch])
        for (img, _, inv_scale), (kps, descs) in zip(batch, results):
            if inv_scale != 1.0:
                kps = kps.copy()
                kps[:, 0] *= inv_scale
                kps[:, 1] *= inv_scale
                kps[:, 2] *= inv_scale
            descs_u8 = np.clip(np.round(descs * 512.0), 0, 255).astype(np.uint8)
            with DatabaseTransaction(db):
                db.write_keypoints(img.image_id, kps)
                db.write_descriptors(img.image_id, descs_u8)
            if verbose:
                print(f"extracted {len(kps):5d} features: {img.name}")

    try:
        images = db.read_all_images()
        pending = {}  # shape -> list of (img, array, inv_scale)
        for img in images:
            if db.exists_keypoints(img.image_id) and db.exists_descriptors(img.image_id):
                continue
            f = image_path / img.name
            if not f.exists():
                continue
            arr = read_image_gray_u8(f)
            arr_small, inv_scale = _resize_to_max(arr, sift_options.max_image_size)
            batch = pending.setdefault(arr_small.shape, [])
            batch.append((img, arr_small, inv_scale))
            if len(batch) >= batch_size:
                _flush(batch)
                pending[arr_small.shape] = []
        for batch in pending.values():
            _flush(batch)
    finally:
        db.close()
