"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the multi-chip stand-in prescribed by SURVEY.md §4.5 — sharding and
collective paths compile and run on N virtual CPU devices; the driver's
separate dryrun validates the same code multi-chip.

Note: the environment's sitecustomize registers a TPU ("axon") PJRT plugin at
interpreter start and overrides JAX_PLATFORMS, so the env-var route is dead by
the time this file runs; ``jax.config.update`` before first backend use still
wins, and XLA_FLAGS is read lazily at backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen segfaults deterministically partway
    # through the suite (observed 2026-08-19 at test ~129, inside
    # backend_compile_and_load on the bucketed BA solver; independent of the
    # axon plugin and of the persistent cache). Serializing codegen avoids
    # the crash at a small compile-time cost.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# The package enables a persistent compilation cache (pycolmap_tpu/__init__),
# but XLA:CPU's LoadedExecutable::serialize() can SIGABRT on large programs
# (observed 2026-08-19 on the bucketed BA solver: Fatal abort inside
# put_executable_and_time -> executable.serialize(), killing the whole
# suite). Tests run single-process on CPU where cross-run cache warmth is
# worth less than suite stability, so disable the disk cache here; TPU runs
# (bench, scale tests) keep it.
jax.config.update("jax_enable_compilation_cache", False)
