"""Worker entry for the REAL multi-process distribution test (SURVEY §4.5).

Launched as N concurrent subprocesses by tests/test_distributed.py. Each
worker initializes the jax.distributed runtime on a CPU backend (2 virtual
devices per process), proves the cross-process comm backend with a psum
over the GLOBAL mesh, then runs its shard of the extract/match protocol
concurrently with its peers (the reference's analog is threaded
controllers, match_features.h:76-81; here the unit is a process, the
multi-host unit).

Writes "<tmpdir>/worker<k>.ok" with its results on success.
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
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pycolmap_tpu.parallel.distributed import (
        extract_features_sharded,
        init_distributed,
        match_exhaustive_sharded,
    )

    pid, nproc = init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert pid == process_id and nproc == num_processes, (pid, nproc)
    assert len(jax.devices()) == 2 * num_processes  # global view

    # --- comm backend: psum over the GLOBAL mesh (spans both processes) ---
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()), ("d",))
    local = np.full((2, 8), float(process_id + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), local
    )
    total = jax.jit(
        shard_map(
            lambda a: jax.lax.psum(jnp_sum_keepdim(a), "d"),
            mesh=mesh, in_specs=P("d"), out_specs=P(),
        )
    )(arr)
    expect = 8.0 * 2 * sum(range(1, num_processes + 1))
    got = float(np.asarray(total)[0, 0])
    assert abs(got - expect) < 1e-5, (got, expect)

    # --- concurrent sharded extraction + matching (filesystem protocol) ---
    db = os.path.join(tmpdir, "db.db")
    imgs = os.path.join(tmpdir, "images")
    extract_features_sharded(
        db, imgs, process_id=process_id, num_processes=num_processes
    )
    # all feature shards must exist before matching reads them; barrier
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("features_done")
    if process_id == 0:
        from pycolmap_tpu.parallel.distributed import (
            merge_feature_shards,
            shard_database_path,
        )

        merge_feature_shards(
            db,
            [shard_database_path(db, k) for k in range(num_processes)],
        )
    multihost_utils.sync_global_devices("features_merged")
    match_exhaustive_sharded(
        db, process_id=process_id, num_processes=num_processes
    )
    multihost_utils.sync_global_devices("matches_done")

    with open(os.path.join(tmpdir, f"worker{process_id}.ok"), "w") as f:
        json.dump({"psum": got, "process_id": pid}, f)


def jnp_sum_keepdim(a):
    import jax.numpy as jnp

    return jnp.sum(a, keepdims=True)


if __name__ == "__main__":
    main()
