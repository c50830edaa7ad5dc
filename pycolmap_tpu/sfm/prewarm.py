"""Background pre-compilation of the mapper's early BA shape signatures.

Through the remote-compile tunnel every fresh XLA signature costs tens of
seconds (BASELINE.md cold-start caveat). The bucketed solver's signature is
the tuple of all padded sizes (ba_kernels._pad_4x), so the set of signatures
an incremental-mapping run meets is small and predictable: local-BA windows
(<= ~8 images padded to 8, point buckets stepping 128 -> 512 -> 2048) and
the first global rounds. This module compiles those signatures on tiny
synthetic problems in a daemon thread while feature extraction / matching /
correspondence-graph construction still run, hiding the compile latency
(ROADMAP.md perf item 1; analog of the reference overlapping its threaded
controllers, pipeline/sfm.h:46-93).
"""

from __future__ import annotations

import os
import threading

_started = set()
_lock = threading.Lock()


_CASES = [
    # (num_images, num_points, obs_per_point, is_global). Bucket shapes
    # follow ba_kernels.bucketize: tracks of length t land in the first
    # bucket with T >= t, padded to 4x steps of 128.
    # local windows (I_pad = 8): growing T=4 bucket 128 -> 512 -> 2048
    (6, 100, 3, False),
    (6, 300, 3, False),
    (6, 1200, 3, False),
    # local window with a populated T=8 bucket
    (6, 300, 6, False),
    # early global rounds (I_pad = 32)
    (20, 300, 4, True),
    (20, 800, 4, True),
]


def prewarm_mapper_ba(
    model_id: int,
    local_options,
    global_options,
    cg_iters: int = 30,
):
    """Start (at most once per signature set) a daemon compile thread.

    local_options / global_options: the BundleAdjustmentOptions the mapper
    will actually solve with (their loss type and iteration budget are part
    of the jit signature). No-ops on CPU backends (tests) and when
    PYCOLMAP_TPU_PREWARM=0. Returns the thread (or None) so callers/tests
    can join it.
    """
    if os.environ.get("PYCOLMAP_TPU_PREWARM", "1") == "0":
        return None
    try:
        import jax

        if jax.default_backend() == "cpu":
            return None
    except Exception:  # pragma: no cover
        return None

    local_iters = int(local_options.max_num_iterations)
    global_iters = int(global_options.max_num_iterations)
    key = (
        model_id, local_iters, global_iters,
        int(local_options.loss_function_type),
        int(global_options.loss_function_type), cg_iters,
    )
    with _lock:
        if key in _started:
            return None
        _started.add(key)

    def work():
        try:
            from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
            from pycolmap_tpu.sfm import ba_kernels as bk

            for ni, npts, opp, is_global in _CASES:
                problem = make_synthetic_bundle(
                    num_images=ni,
                    num_points=npts,
                    obs_per_point=opp,
                    refine_intrinsics=True,
                    seed=0,
                )
                problem = problem._replace(model_id=model_id)
                options = global_options if is_global else local_options
                # derive the exact jit signature by host-side bucketize (ms)
                # and AOT-compile it — no solve EXECUTION on the chip (the
                # old path ran real LM iterations competing with
                # critical-path work through the serialized tunnel), and the
                # executable persists to the aot_cache for future processes
                buckets = bk.bucketize(problem)
                bk.compile_solver_signature(
                    tuple(b.points.shape[1] for b in buckets),
                    tuple(b.mask.shape[0] for b in buckets),
                    bk._pad_4x(problem.num_images, 8),
                    bk._pad_4x(problem.num_cameras, 1),
                    model_id,
                    int(options.loss_function_type),
                    cg_iters,
                    int(options.max_num_iterations),
                    knobs=bk._env_knobs(),
                )
        except Exception:  # never take the pipeline down from the warm path
            pass

    t = threading.Thread(
        target=work, name="pycolmap-tpu-ba-prewarm", daemon=True
    )
    t.start()
    return t
