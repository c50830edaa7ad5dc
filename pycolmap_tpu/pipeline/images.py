"""Image ingestion, camera inference, and undistortion.

API parity: pycolmap/pipeline/images.h — ``import_images`` (:24-63),
``infer_camera_from_image`` EXIF-focal heuristic (:65-94),
``undistort_images`` (:96-148), ``CameraMode`` (:151-155),
``ImageReaderOptions`` (:158-200), ``UndistortCameraOptions`` (:209-233).

Reading uses PIL (the reference uses FreeImage); the undistortion remap is a
batched JAX kernel over the whole output grid.
"""

from __future__ import annotations

import enum
import os
from pathlib import Path

import numpy as np

from pycolmap_tpu.scene import Camera, Database, DatabaseTransaction, Image
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass

IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".pgm", ".ppm"}


class CameraMode(enum.IntEnum):
    AUTO = 0
    SINGLE = 1
    PER_FOLDER = 2
    PER_IMAGE = 3


@options_dataclass
class ImageReaderOptions(BaseOptions):
    """Mirrors reference ImageReaderOptions (images.h:158-200)."""

    camera_model: str = "SIMPLE_RADIAL"
    single_camera: bool = False
    single_camera_per_folder: bool = False
    single_camera_per_image: bool = False
    existing_camera_id: int = -1
    camera_params: str = ""
    default_focal_length_factor: float = 1.2
    mask_path: str = ""


@options_dataclass
class UndistortCameraOptions(BaseOptions):
    """Mirrors reference UndistortCameraOptions (images.h:209-233)."""

    blank_pixels: float = 0.0
    min_scale: float = 0.2
    max_scale: float = 2.0
    max_image_size: int = -1
    roi_min_x: float = 0.0
    roi_min_y: float = 0.0
    roi_max_x: float = 1.0
    roi_max_y: float = 1.0


def list_images(image_path) -> list[str]:
    """Relative paths of all images under image_path, sorted."""
    image_path = Path(image_path)
    out = []
    for root, _, files in os.walk(image_path):
        for f in sorted(files):
            if Path(f).suffix.lower() in IMAGE_EXTENSIONS:
                out.append(str(Path(root).relative_to(image_path) / f))
    return sorted(out)


def read_image_gray(path) -> np.ndarray:
    """HxW float32 grayscale in [0, 1]."""
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        im = im.convert("L")
        return np.asarray(im, dtype=np.float32) / 255.0


def read_image_gray_u8(path) -> np.ndarray:
    """HxW uint8 grayscale — for device consumers that normalize on
    device (features/sift.py): the raw u8 crosses the remote tunnel 4x
    smaller than f32, which dominated the whole-extract wall (BASELINE r5)."""
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def read_image_rgb(path) -> np.ndarray:
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        im = im.convert("RGB")
        return np.asarray(im, dtype=np.uint8)


def _exif_focal_px(path, width: int) -> float | None:
    """EXIF focal length -> pixels (heuristic per images.h:75-86)."""
    from PIL import ExifTags, Image as PILImage

    try:
        with PILImage.open(path) as im:
            exif = im.getexif()
            if not exif:
                return None
            tag_by_name = {v: k for k, v in ExifTags.TAGS.items()}
            f35 = exif.get(tag_by_name.get("FocalLengthIn35mmFilm"))
            if f35:
                return float(f35) / 35.0 * width
            focal_mm = exif.get(tag_by_name.get("FocalLength"))
            if focal_mm:
                # assume 35mm-equivalent sensor width unless plane res known
                return float(focal_mm) / 35.0 * width
    except Exception:
        return None
    return None


def infer_camera_from_image(image_path, options: ImageReaderOptions = None) -> Camera:
    """Build a camera for one image: EXIF focal if available, else
    default_focal_length_factor * max(width, height) (ref: images.h:65-94)."""
    if options is None:
        options = ImageReaderOptions()
    from PIL import Image as PILImage

    with PILImage.open(image_path) as im:
        width, height = im.size
    focal = _exif_focal_px(image_path, width)
    has_prior = focal is not None
    if focal is None:
        focal = options.default_focal_length_factor * max(width, height)
    cam = Camera.create(0, options.camera_model, focal, width, height)
    cam.has_prior_focal_length = has_prior
    if options.camera_params:
        cam.set_params_from_string(options.camera_params)
    return cam


def import_images(
    database_path,
    image_path,
    camera_mode: CameraMode = CameraMode.AUTO,
    image_names=None,
    options: ImageReaderOptions = None,
):
    """Ingest images into the database (ref: images.h:24-63)."""
    if options is None:
        options = ImageReaderOptions()
    image_path = Path(image_path)
    names = image_names if image_names else list_images(image_path)
    camera_mode = CameraMode(camera_mode)

    db = Database(database_path)
    try:
        with DatabaseTransaction(db):
            cam_for_folder: dict[str, int] = {}
            single_cam_id = None
            for name in names:
                if db.image_id_from_name(name) is not None:
                    continue
                full = image_path / name
                cam = infer_camera_from_image(full, options)
                if camera_mode in (CameraMode.SINGLE, CameraMode.AUTO) and not options.single_camera_per_image:
                    use_single = (
                        camera_mode == CameraMode.SINGLE or options.single_camera
                        or camera_mode == CameraMode.AUTO
                    )
                else:
                    use_single = False
                if camera_mode == CameraMode.PER_FOLDER or options.single_camera_per_folder:
                    folder = str(Path(name).parent)
                    if folder in cam_for_folder:
                        cam_id = cam_for_folder[folder]
                    else:
                        cam_id = db.write_camera(cam)
                        cam_for_folder[folder] = cam_id
                elif camera_mode == CameraMode.PER_IMAGE or options.single_camera_per_image:
                    cam_id = db.write_camera(cam)
                elif use_single:
                    if single_cam_id is None:
                        single_cam_id = db.write_camera(cam)
                    cam_id = single_cam_id
                else:
                    cam_id = db.write_camera(cam)
                img = Image(name=name, camera_id=cam_id)
                db.write_image(img)
    finally:
        db.close()


def undistort_camera(camera: Camera, options: UndistortCameraOptions = None) -> Camera:
    """Compute the undistorted PINHOLE camera (upstream UndistortCamera)."""
    if options is None:
        options = UndistortCameraOptions()
    new_cam = Camera.create(
        camera.camera_id, "PINHOLE", camera.focal_length, camera.width, camera.height
    )
    new_cam.params[0] = camera.focal_length_x
    new_cam.params[1] = camera.focal_length_y
    new_cam.params[2] = camera.principal_point_x
    new_cam.params[3] = camera.principal_point_y

    # determine scaling so that no blank pixels remain (blank_pixels=0) by
    # examining the undistorted border positions
    w, h = camera.width, camera.height
    n = 64
    border = []
    xs = np.linspace(0.5, w - 0.5, n)
    ys = np.linspace(0.5, h - 0.5, n)
    top = np.stack([xs, np.full(n, 0.5)], axis=1)
    bottom = np.stack([xs, np.full(n, h - 0.5)], axis=1)
    left = np.stack([np.full(n, 0.5), ys], axis=1)
    right = np.stack([np.full(n, w - 0.5), ys], axis=1)
    pts = np.concatenate([top, bottom, left, right])
    uv = camera.cam_from_img(pts)  # undistorted normalized coords
    # project through new pinhole camera
    xy = uv * [new_cam.params[0], new_cam.params[1]] + [
        new_cam.params[2], new_cam.params[3]
    ]
    # scale the focal so the undistorted border maps inside the image
    cx, cy = new_cam.params[2], new_cam.params[3]
    span_x = max(xy[:, 0].max() - cx, cx - xy[:, 0].min())
    span_y = max(xy[:, 1].max() - cy, cy - xy[:, 1].min())
    scale_x = (w / 2) / span_x if span_x > 0 else 1.0
    scale_y = (h / 2) / span_y if span_y > 0 else 1.0
    if options.blank_pixels == 0:
        scale = min(scale_x, scale_y)
    else:
        scale = max(scale_x, scale_y)
    scale = float(np.clip(scale, options.min_scale, options.max_scale))
    new_cam.params[0] *= scale
    new_cam.params[1] *= scale
    return new_cam


def undistort_image(image_arr: np.ndarray, camera: Camera, new_camera: Camera):
    """Remap an HxW[xC] image to the undistorted camera (batched JAX gather)."""
    import jax.numpy as jnp

    h, w = new_camera.height, new_camera.width
    ys, xs = np.mgrid[0:h, 0:w]
    pix = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=1)
    uv = new_camera.cam_from_img(pix)  # normalized (pinhole: linear)
    src = camera.img_from_cam(uv)  # distorted source pixels
    src_x = src[:, 0].reshape(h, w) - 0.5
    src_y = src[:, 1].reshape(h, w) - 0.5

    from pycolmap_tpu.features.sift import _bilinear_gather

    arr = np.asarray(image_arr, dtype=np.float32)
    if arr.ndim == 2:
        out = np.asarray(
            _bilinear_gather(jnp.asarray(arr), jnp.asarray(src_y), jnp.asarray(src_x))
        )
    else:
        chans = [
            np.asarray(
                _bilinear_gather(
                    jnp.asarray(arr[..., c]), jnp.asarray(src_y), jnp.asarray(src_x)
                )
            )
            for c in range(arr.shape[-1])
        ]
        out = np.stack(chans, axis=-1)
    if image_arr.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out


def undistort_images(
    output_path,
    input_path,
    image_path,
    output_type: str = "COLMAP",
    options: UndistortCameraOptions = None,
    image_names=None,
):
    """Undistort a reconstruction's images into a dense workspace
    (ref: images.h:96-148). Writes sparse/ model + images/ remaps."""
    from pycolmap_tpu.scene import Reconstruction

    if options is None:
        options = UndistortCameraOptions()
    output_path = Path(output_path)
    image_path = Path(image_path)
    rec = Reconstruction(input_path)
    (output_path / "images").mkdir(parents=True, exist_ok=True)
    (output_path / "sparse").mkdir(parents=True, exist_ok=True)

    new_cams = {}
    for cam_id, cam in rec.cameras.items():
        new_cams[cam_id] = undistort_camera(cam, options)

    from PIL import Image as PILImage

    select = set(image_names) if image_names else None
    for img in rec.images.values():
        if not img.registered:
            continue
        if select is not None and img.name not in select:
            continue
        src_file = image_path / img.name
        if not src_file.exists():
            continue
        arr = read_image_rgb(src_file)
        cam = rec.cameras[img.camera_id]
        out = undistort_image(arr, cam, new_cams[img.camera_id])
        dst = output_path / "images" / img.name
        dst.parent.mkdir(parents=True, exist_ok=True)
        PILImage.fromarray(out).save(dst)

    # write undistorted sparse model
    for cam_id, cam in new_cams.items():
        rec.cameras[cam_id] = cam
    rec.write_binary(output_path / "sparse")
    return rec
