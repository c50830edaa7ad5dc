"""Camera-block sharding (two-level Schur first cut; VERDICT r3 #3)."""

import numpy as np

from pycolmap_tpu.parallel.camera_sharding import (
    assign_cameras_block_cyclic,
    shard_rows,
    two_level_schur_solve,
)


def test_block_cyclic_assignment_balanced():
    a = assign_cameras_block_cyclic(1000, 8, block=8)
    assert a.shape == (1000,)
    counts = np.bincount(a, minlength=8)
    assert counts.max() - counts.min() <= 8
    # neighboring blocks land on different shards
    assert a[0] != a[8]


def test_shard_rows_places_on_mesh():
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("obs",))
    arr = np.arange(130 * 6, dtype=np.float32).reshape(130, 6)
    sharded = shard_rows(arr, mesh)
    assert sharded.shape[0] % mesh.devices.size == 0
    np.testing.assert_array_equal(np.asarray(sharded)[:130], arr)


def test_two_level_schur_solve_matches_dense():
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("obs",))
    rng = np.random.default_rng(0)
    # SPD system shaped like a reduced camera matrix (D = 6*I + NP)
    D = 6 * 20 + 4
    A = rng.normal(size=(D, D)).astype(np.float32)
    S = A @ A.T + D * np.eye(D, dtype=np.float32)
    rhs = rng.normal(size=D).astype(np.float32)

    x = two_level_schur_solve(S, rhs, mesh, cg_iters=200, eta=1e-7)
    x_ref = np.linalg.solve(S.astype(np.float64), rhs.astype(np.float64))
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3
