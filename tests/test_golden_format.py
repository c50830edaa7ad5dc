"""Golden byte-level tests of the COLMAP binary model format.

The blobs below are hand-assembled per the upstream format definition
(scene/reconstruction.h:68-103 Read/WriteBinary; struct layouts:
cameras.bin = u64 count + (i32 id, i32 model, u64 w, u64 h, f64 params[]);
images.bin  = u64 count + (i32 id, f64 qwqxqyqz[4], f64 t[3], i32 cam,
              name\\0, u64 n, (f64 x, f64 y, u64 pid)[n]);
points3D.bin= u64 count + (u64 id, f64 xyz[3], u8 rgb[3], f64 err,
              u64 len, (u32 img, u32 idx)[len])).
Guards byte-compatibility with COLMAP tooling independent of our writer.
"""

import struct

import numpy as np

from pycolmap_tpu.scene import Reconstruction


def build_golden(tmp_path):
    inv = 2**64 - 1
    cameras = struct.pack("<Q", 1) + struct.pack(
        "<iiQQ", 1, 2, 640, 480
    ) + struct.pack("<dddd", 600.0, 320.0, 240.0, 0.05)  # SIMPLE_RADIAL
    (tmp_path / "cameras.bin").write_bytes(cameras)

    images = struct.pack("<Q", 1)
    images += struct.pack(
        "<idddddddi", 7, 1.0, 0.0, 0.0, 0.0, 0.5, -0.25, 2.0, 1
    )
    images += b"photo.jpg\x00"
    images += struct.pack("<Q", 2)
    images += struct.pack("<ddQ", 100.5, 200.25, 3)
    images += struct.pack("<ddQ", 10.0, 20.0, inv)
    (tmp_path / "images.bin").write_bytes(images)

    points = struct.pack("<Q", 1)
    points += struct.pack(
        "<QdddBBBd", 3, 1.5, -2.5, 8.0, 10, 20, 30, 0.75
    )
    points += struct.pack("<Q", 1)
    points += struct.pack("<II", 7, 0)
    (tmp_path / "points3D.bin").write_bytes(points)


def test_read_golden_bytes(tmp_path):
    build_golden(tmp_path)
    rec = Reconstruction()
    rec.read_binary(tmp_path)
    cam = rec.cameras[1]
    assert cam.model == "SIMPLE_RADIAL"
    assert cam.width == 640 and cam.height == 480
    assert np.allclose(cam.params, [600.0, 320.0, 240.0, 0.05])
    img = rec.images[7]
    assert img.name == "photo.jpg"
    assert img.camera_id == 1
    assert np.allclose(img.cam_from_world.translation, [0.5, -0.25, 2.0])
    assert np.allclose(img.cam_from_world.rotation.matrix(), np.eye(3))
    assert img.num_points2D == 2
    assert np.allclose(img.points2D_xy[0], [100.5, 200.25])
    assert int(img.points2D_point3D_ids[0]) == 3
    pt = rec.points3D[3]
    assert np.allclose(pt.xyz, [1.5, -2.5, 8.0])
    assert tuple(pt.color) == (10, 20, 30)
    assert pt.error == 0.75
    assert pt.track.elements[0].image_id == 7
    rec.check()


def test_rewrite_is_byte_identical(tmp_path):
    build_golden(tmp_path)
    rec = Reconstruction()
    rec.read_binary(tmp_path)
    out = tmp_path / "rewrite"
    out.mkdir()
    rec.write_binary(out)
    for name in ("cameras.bin", "images.bin", "points3D.bin"):
        assert (out / name).read_bytes() == (tmp_path / name).read_bytes(), name


def test_text_binary_equivalence(tmp_path):
    build_golden(tmp_path)
    rec = Reconstruction()
    rec.read_binary(tmp_path)
    txt = tmp_path / "text"
    txt.mkdir()
    rec.write_text(txt)
    rec2 = Reconstruction()
    rec2.read_text(txt)
    assert np.allclose(
        rec2.images[7].cam_from_world.matrix(), rec.images[7].cam_from_world.matrix()
    )
    assert np.allclose(rec2.points3D[3].xyz, rec.points3D[3].xyz)
    bin2 = tmp_path / "bin2"
    bin2.mkdir()
    rec2.write_binary(bin2)
    assert (bin2 / "cameras.bin").read_bytes() == (tmp_path / "cameras.bin").read_bytes()
