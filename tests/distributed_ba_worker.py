"""Worker for the multi-process sharded-BA test (VERDICT r3 missing #3).

Each of N processes joins a jax.distributed coordinator (2 virtual CPU
devices per process), builds the SAME C3-shaped synthetic bundle problem,
and solves it on the global 2N-device mesh: bucket arrays enter via
jax.make_array_from_process_local_data (each process contributes its point
shard — ba_kernels._put_sharded_last_axis), the camera system assembles via
XLA-inserted psums over the global mesh, and results replicate back to all
processes. Writes "<tmpdir>/ba_worker<k>.json" with the solve summary.
"""

import json
import os
import sys


def main():
    tmpdir, process_id, num_processes, port = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
        + " --xla_cpu_parallel_codegen_split_count=1"
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)

    import numpy as np

    from pycolmap_tpu.parallel.distributed import init_distributed

    pid, nproc = init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert pid == process_id and nproc == num_processes

    from jax.sharding import Mesh

    from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
    from pycolmap_tpu.sfm.bundle_adjustment import (
        BundleAdjustmentOptions,
        solve_bundle,
    )

    mesh = Mesh(np.array(jax.devices()), ("obs",))
    assert mesh.devices.size == 2 * num_processes

    # C3 shapes (BASELINE.md): 128 images, scaled-down point count so the
    # 2-proc CPU solve stays CI-sized; every process builds the identical
    # problem (host-replicated graph, device-sharded points)
    problem = make_synthetic_bundle(
        num_images=128, num_points=20_000, obs_per_point=6,
        pose_noise=0.05, point_noise=0.10, refine_intrinsics=True, seed=0,
    )
    options = BundleAdjustmentOptions()
    options.max_num_iterations = 5
    options.print_summary = False
    new_problem, summary = solve_bundle(problem, options, cg_iters=15,
                                        mesh=mesh)

    # per-host problem slice (VERDICT r4 missing #4): this process's bucket
    # planes must be 1/nproc of the global width, host AND device-local
    from pycolmap_tpu.sfm import ba_kernels as bk

    local = bk.bucketize(problem, col_range=(pid, nproc))
    meta = bk.bucket_meta(problem)
    for b, (rows_full, _, Pb, _) in zip(local, meta):
        assert b.mask.shape[1] * nproc == Pb, (b.mask.shape, Pb)
    dev_buckets, _, rows_l, _ = bk._bucketize_cached(problem, mesh)
    for b, (rows_full, _, Pb, _) in zip(dev_buckets, meta):
        # global logical shape, per-process addressable shards only
        assert b.mask.shape[1] == Pb
        local_cols = sum(
            s.data.shape[-1] for s in b.mask.addressable_shards
        )
        assert local_cols == Pb // nproc, (local_cols, Pb, nproc)
    out = {
        "process_id": pid,
        "initial_cost": float(summary.initial_cost),
        "final_cost": float(summary.final_cost),
        "num_iterations": int(summary.num_iterations),
        "quat0": np.asarray(new_problem.cam_quat)[1].tolist(),
        "point0": np.asarray(new_problem.points)[7].tolist(),
    }
    with open(os.path.join(tmpdir, f"ba_worker{process_id}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
