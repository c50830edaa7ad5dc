"""Pallas TPU kernels for feature matching.

Fused descriptor-distance + running top-2 kernel: the [N1, N2] similarity
matrix of the brute-force matcher is never materialized — each grid step
computes one [TM, TN] tile on the MXU and folds it into per-row running
(best, second-best, argbest) statistics in VMEM. For N≈8k descriptors this
cuts HBM traffic from ~256 MB (full matrix write+read+sort) to the two
descriptor reads, and removes the separate top_k pass.

Used by features.matcher on TPU backends; the jnp path remains the
reference implementation (and the CPU fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256  # rows (queries) per grid step
TN = 256  # columns (targets) per inner tile


def _top2_kernel(d1_ref, d2_ref, n2_ref, best_ref, second_ref, idx_ref):
    """Grid over row tiles; inner fori over column tiles.

    d1_ref: [TM, D] VMEM; d2_ref: [N2p, D] VMEM (full, shared);
    n2_ref: [1, 1] SMEM actual column count;
    outputs per row tile: best/second sim [TM, 1], best idx [TM, 1].
    """
    n2 = n2_ref[0, 0]
    d1 = d1_ref[:]
    num_col_tiles = d2_ref.shape[0] // TN

    def body(j, carry):
        best, second, bidx = carry
        d2_tile = d2_ref[pl.ds(j * TN, TN), :]
        sim = jax.lax.dot_general(
            d1, d2_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TM, TN]
        col = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) + j * TN
        sim = jnp.where(col < n2, sim, -2.0)
        # tile-local top-2
        t_best = jnp.max(sim, axis=1, keepdims=True)
        t_arg = jnp.argmax(sim, axis=1)[:, None] + j * TN
        sim_wo = jnp.where(col == t_arg, -2.0, sim)
        t_second = jnp.max(sim_wo, axis=1, keepdims=True)
        # merge with running stats
        new_best = jnp.maximum(best, t_best)
        new_idx = jnp.where(t_best > best, t_arg, bidx)
        new_second = jnp.maximum(
            jnp.minimum(best, t_best), jnp.maximum(second, t_second)
        )
        new_second = jnp.minimum(new_second, new_best)
        return new_best, new_second, new_idx

    init = (
        jnp.full((TM, 1), -2.0, dtype=jnp.float32),
        jnp.full((TM, 1), -2.0, dtype=jnp.float32),
        jnp.zeros((TM, 1), dtype=jnp.int32),
    )
    best, second, bidx = jax.lax.fori_loop(0, num_col_tiles, body, init)
    best_ref[:] = best
    second_ref[:] = second
    idx_ref[:] = bidx


@functools.partial(jax.jit, static_argnames=())
def pallas_top2(d1, d2, n2):
    """d1 [N1p, D], d2 [N2p, D] (padded to TM/TN multiples, unit-norm f32).

    Returns (best_sim [N1p], second_sim [N1p], best_idx [N1p]).
    """
    return _pallas_top2_impl(d1, d2, jnp.asarray(n2, dtype=jnp.int32))


def _pallas_top2_impl(d1, d2, n2):
    """Unjitted core of pallas_top2 (shared by the single and vmapped
    batch entry points; vmap adds a batch grid dimension)."""
    n1p = d1.shape[0]
    grid = (n1p // TM,)
    best, second, idx = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, d1.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d2.shape[0], d2.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n1p, 1), jnp.int32),
        ],
    )(d1, d2, n2.reshape(1, 1))
    return best[:, 0], second[:, 0], idx[:, 0]


@jax.jit
def pallas_top2_batch(d1, d2, n2):
    """Batched fused matcher: d1 [B, N1p, D], d2 [B, N2p, D], n2 [B] int32.

    One device program matches a whole block of image pairs (SURVEY §2c P1
    pair-parallel dispatch: per-pair calls cost 10-25 ms tunnel latency
    each; a block costs one)."""
    return jax.vmap(_pallas_top2_impl)(d1, d2, n2)


def use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def match_top2(d1p: np.ndarray, d2p: np.ndarray, n1: int, n2: int):
    """Pad-to-tile wrapper. Inputs already unit-norm f32, row counts n1/n2.

    Returns (best_sim [n1], second_sim [n1], best_idx [n1]).
    """

    def pad_rows(a, m):
        n = a.shape[0]
        npad = ((n + m - 1) // m) * m
        if npad == n:
            return a
        return np.concatenate(
            [a, np.zeros((npad - n,) + a.shape[1:], dtype=a.dtype)]
        )

    d1t = pad_rows(d1p, TM)
    d2t = pad_rows(d2p, TN)
    best, second, idx = pallas_top2(
        jnp.asarray(d1t), jnp.asarray(d2t), n2
    )
    return (
        np.asarray(best)[:n1],
        np.asarray(second)[:n1],
        np.asarray(idx)[:n1],
    )
