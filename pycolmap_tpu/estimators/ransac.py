"""Batched LORANSAC engine: all hypotheses × all points scored on device.

TPU-native replacement for the reference's serial RANSAC/LORANSAC template
loops (ref: optim/bindings.h:7-27; upstream optim/ransac.h, optim/loransac.h,
reached via estimators/essential_matrix.h:5). Design (SURVEY.md §2c P2):

- draw a *chunk* of K minimal samples at once (Fisher–Yates via argsort of
  uniform keys — fully vectorized, deterministic given the PRNG key);
- run the batched minimal solver -> K×S hypotheses;
- score every hypothesis against every correspondence in one tensor op
  (inlier count first, capped residual sum as tie-break — the reference's
  InlierSupportMeasurer ordering);
- host loop adds chunks until COLMAP's confidence formula says stop
  (dynamic trial count semantics with static shapes);
- local optimization: iterative non-minimal refit on the current inlier set
  (the LO step of LORANSAC).

Determinism: every public estimator seeds a fixed counted key, mirroring the
reference's SetPRNGSeed(0) on entry (ref: estimators/fundamental_matrix.h:21).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class RANSACOptions(BaseOptions):
    """Defaults match reference RANSACOptions (ref: optim/bindings.h:12-17)."""

    max_error: float = 4.0
    min_inlier_ratio: float = 0.01
    confidence: float = 0.9999
    dyn_num_trials_multiplier: float = 3.0
    min_num_trials: int = 1000
    max_num_trials: int = 100000

    def check(self) -> bool:
        assert self.max_error > 0
        assert 0 <= self.min_inlier_ratio <= 1
        assert 0 < self.confidence <= 1
        assert self.min_num_trials <= self.max_num_trials
        return True


@dataclass
class RANSACReport:
    success: bool
    model: Any = None
    num_trials: int = 0
    support_num_inliers: int = 0
    inlier_mask: Optional[np.ndarray] = None

    @property
    def inlier_ratio(self):
        if self.inlier_mask is None or len(self.inlier_mask) == 0:
            return 0.0
        return self.support_num_inliers / len(self.inlier_mask)


def _sample_indices(key, num_points, sample_size, num_samples, valid_mask):
    """[K, m] distinct indices per row via argsort of uniform keys.

    valid_mask [N]: padded rows get +inf keys so they are never sampled
    (shape bucketing keeps the jitted chunk's shapes from recompiling for
    every distinct correspondence count).
    """
    u = jax.random.uniform(key, (num_samples, num_points))
    u = u + (1.0 - valid_mask)[None, :] * 1e6
    # top-m smallest keys = uniform sample without replacement
    _, idx = jax.lax.top_k(-u, sample_size)
    return idx


def dyn_num_trials(num_inliers, num_points, sample_size, confidence, multiplier):
    """COLMAP's adaptive trial count (upstream ransac.h ComputeNumTrials)."""
    if num_inliers == 0 or num_points == 0:
        return float("inf")
    ratio = num_inliers / num_points
    nom = 1 - confidence
    denom = 1 - ratio**sample_size
    if denom <= 0:
        return 0
    if nom <= 0 or denom >= 1.0:
        # ratio^m underflowed: effectively zero chance per sample
        return float("inf")
    return math.ceil(math.log(nom) / math.log(denom) * multiplier)


class BatchedLORANSAC:
    """Generic batched LORANSAC.

    Parameters
    ----------
    minimal_solver:
        (idx [K, m], *data) -> (models pytree with leading [K, S], valid [K, S]).
        Receives the sampled index array and the full data arrays; gathering
        is the solver's job (keeps layout control with the solver).
    residual_fn:
        (models [K, S], *data) -> squared residuals [K, S, N].
    refit_solver:
        optional (weights [N], *data) -> models pytree [1, S'] + valid for the
        LO step (non-minimal weighted refit).
    sample_size: minimal sample cardinality m.
    chunk_size: hypotheses drawn per device round.
    """

    def __init__(
        self,
        minimal_solver: Callable,
        residual_fn: Callable,
        sample_size: int,
        refit_solver: Optional[Callable] = None,
        chunk_size: int = 512,
        num_lo_iterations: int = 2,
        name: Optional[str] = None,
    ):
        self.minimal_solver = minimal_solver
        self.residual_fn = residual_fn
        self.refit_solver = refit_solver
        self.sample_size = sample_size
        self.chunk_size = chunk_size
        self.num_lo_iterations = num_lo_iterations
        # estimators that give a stable name dispatch through the
        # persistent executable cache: a fresh mapper process pays a remote
        # compile per (estimator, padded-N) signature otherwise
        self.name = name
        self._chunk_jit = jax.jit(self._run_chunk)
        self._refit_jit = jax.jit(self._run_refit) if refit_solver else None
        # fused chunk + in-jit LO loop: the host LO orchestration cost 2-3
        # blocking ~20 ms tunnel round trips per estimate on top of the
        # chunk's one — for mapper registration (one chunk, always-LO) the
        # fused program is a single dispatch (r5)
        self._chunk_lo_jit = (
            jax.jit(self._run_chunk_lo) if refit_solver else None
        )

    def _dispatch(self, jf, tag, *args):
        if self.name is None:
            return jf(*args)
        from pycolmap_tpu.utils import aot_cache

        if not aot_cache.enabled():
            return jf(*args)
        import sys as _sys

        from pycolmap_tpu.ops import epipolar as _ep
        from pycolmap_tpu.ops import solvers as _sv

        salt = aot_cache.source_salt(_sys.modules[__name__], _sv, _ep)
        full_tag = (
            f"ransac:{self.name}:{tag}:{self.sample_size}:"
            f"{self.chunk_size}:{self.num_lo_iterations}"
        )
        return aot_cache.cached_call(jf, full_tag, salt, {}, *args)

    # -- device kernels ------------------------------------------------------
    def _score(self, residuals, max_error_sq):
        """residuals [K, S, N] -> (num_inliers [K,S], tiebreak score [K,S])."""
        inl = residuals <= max_error_sq
        num_inliers = jnp.sum(inl, axis=-1)
        capped = jnp.sum(jnp.minimum(residuals, max_error_sq), axis=-1)
        return num_inliers, capped

    def _run_chunk(self, key, max_error_sq, valid_mask, *data):
        n = data[0].shape[0]
        idx = _sample_indices(key, n, self.sample_size, self.chunk_size, valid_mask)
        models, valid = self.minimal_solver(idx, *data)
        residuals = self.residual_fn(models, *data)  # [K, S, N]
        residuals = jnp.where(valid_mask[None, None, :] > 0, residuals, jnp.inf)
        num_inliers, capped = self._score(residuals, max_error_sq)
        num_inliers = jnp.where(valid, num_inliers, 0)
        capped = jnp.where(valid, capped, jnp.inf)
        # best = max inliers, tie-break min capped residual; invalid
        # hypotheses (capped = inf) must score -inf, not NaN
        flat_inl = num_inliers.reshape(-1)
        flat_cap = capped.reshape(-1)
        order_score = jnp.where(
            jnp.isfinite(flat_cap),
            flat_inl.astype(jnp.float32) - flat_cap / (flat_cap + 1.0),
            -jnp.inf,
        )
        best_flat = jnp.argmax(order_score)
        best_model = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:])[best_flat], models
        )
        best_inliers = flat_inl[best_flat]
        best_capped = flat_cap[best_flat]
        best_residuals = residuals.reshape((-1, n))[best_flat]
        return best_model, best_inliers, best_capped, best_residuals

    def _run_refit(self, weights, max_error_sq, valid_mask, *data):
        models, valid = self.refit_solver(weights, *data)
        residuals = self.residual_fn(models, *data)
        residuals = jnp.where(valid_mask[None, None, :] > 0, residuals, jnp.inf)
        num_inliers, capped = self._score(residuals, max_error_sq)
        num_inliers = jnp.where(valid, num_inliers, 0)
        capped = jnp.where(valid, capped, jnp.inf)
        flat_inl = num_inliers.reshape(-1)
        flat_cap = capped.reshape(-1)
        order_score = jnp.where(
            jnp.isfinite(flat_cap),
            flat_inl.astype(jnp.float32) - flat_cap / (flat_cap + 1.0),
            -jnp.inf,
        )
        best_flat = jnp.argmax(order_score)
        best_model = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:])[best_flat], models
        )
        n = data[0].shape[0]
        return (
            best_model,
            flat_inl[best_flat],
            flat_cap[best_flat],
            residuals.reshape((-1, n))[best_flat],
        )

    def _run_chunk_lo(self, key, max_error_sq, valid_mask, *data):
        """Chunk + the full LO refit loop in ONE program. Equivalent to the
        host loop: weights from the incumbent's residuals, keep-best; a
        refit that does not improve leaves the carry unchanged (the next
        iteration then recomputes identical weights and is a no-op)."""
        init = self._run_chunk(key, max_error_sq, valid_mask, *data)

        def lo_body(carry, _):
            model, num_inl, capped, residuals = carry
            weights = (
                (residuals <= max_error_sq) & (valid_mask > 0)
            ).astype(jnp.float32)
            enough = jnp.sum(weights) >= self.sample_size
            r_model, r_inl, r_cap, r_res = self._run_refit(
                weights, max_error_sq, valid_mask, *data
            )
            better = enough & (
                (r_inl > num_inl)
                | ((r_inl == num_inl) & (r_cap < capped))
            )
            model = jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, b, a), model, r_model
            )
            num_inl = jnp.where(better, r_inl, num_inl)
            capped = jnp.where(better, r_cap, capped)
            residuals = jnp.where(better, r_res, residuals)
            return (model, num_inl, capped, residuals), None

        carry, _ = jax.lax.scan(
            lo_body, init, None, length=self.num_lo_iterations
        )
        return carry

    # -- host orchestration --------------------------------------------------
    @staticmethod
    def _pad_pow2(n, lo=256):
        """Pad to 4x-steps (256, 1k, 4k, 16k...): ~half the compile variants
        of pow2 steps — each fresh compile costs ~70s+ on remote-compile
        backends, which dominates cold-start mapping far more than the
        wasted padding compute."""
        n = max(n, lo)
        b = lo
        while b < n:
            b *= 4
        return b

    def estimate(self, options: RANSACOptions, *data, seed: int = 0) -> RANSACReport:
        """Run chunks until the confidence criterion is met, then LO-refit.

        Data rows are padded to power-of-two sizes with a validity mask so
        the jitted chunk compiles once per bucket instead of once per
        distinct correspondence count (compiles cost ~0.5 s each through
        the remote-compile path — they dominated matching/mapping wall time
        before bucketing).
        """
        n = int(np.asarray(data[0]).shape[0])
        if n < self.sample_size:
            return RANSACReport(success=False)
        n_pad = self._pad_pow2(n)
        valid_np = np.zeros(n_pad, dtype=np.float32)
        valid_np[:n] = 1.0

        def pad_rows(a):
            a = np.asarray(a)
            if n_pad == n:
                return a
            return np.concatenate(
                [a, np.zeros((n_pad - n,) + a.shape[1:], dtype=a.dtype)]
            )

        # keep data host-side: the jitted chunk transfers all args in one
        # batch; eager jnp.asarray costs one dispatch per array
        data = tuple(pad_rows(d) for d in data)
        valid_mask = valid_np
        max_error_sq = np.float32(options.max_error**2)

        key = jax.random.PRNGKey(seed)
        best = None  # (num_inliers, capped, model, residuals)
        best_lo_done = False
        trials = 0
        max_trials = min(
            options.max_num_trials,
            # cap implied by min_inlier_ratio (upstream RANSAC constructor)
            dyn_num_trials(
                max(int(options.min_inlier_ratio * n), self.sample_size),
                n,
                self.sample_size,
                options.confidence,
                options.dyn_num_trials_multiplier,
            ),
        )
        first = True
        while trials < max_trials:
            key, sub = jax.random.split(key)
            # one round trip: fetch every chunk output together. The first
            # chunk runs the FUSED chunk+LO program (the common case — a
            # confident first chunk — then needs no further dispatches);
            # later chunks run plain, with host LO on the final best.
            if first and self._chunk_lo_jit is not None:
                jf, tag = self._chunk_lo_jit, "chunk_lo"
            else:
                jf, tag = self._chunk_jit, "chunk"
            model, num_inl, capped, residuals = jax.device_get(
                self._dispatch(jf, tag, sub, max_error_sq, valid_mask, *data)
            )
            num_inl = int(num_inl)
            capped_f = float(capped)
            trials += self.chunk_size
            if best is None or (num_inl, -capped_f) > (best[0], -best[1]):
                best = (num_inl, capped_f, model, residuals)
                best_lo_done = first and self._chunk_lo_jit is not None
            first = False
            if trials >= options.min_num_trials or trials >= max_trials:
                needed = dyn_num_trials(
                    best[0], n, self.sample_size,
                    options.confidence, options.dyn_num_trials_multiplier,
                )
                if trials >= needed:
                    break
        if best is None or best[0] < self.sample_size:
            return RANSACReport(success=False, num_trials=trials)

        num_inl, capped_f, model, residuals = best
        # -- local optimization: iterative weighted refit on inliers --------
        # (skipped when the winning model already went through the fused
        # in-jit LO loop)
        if self._refit_jit is not None and not best_lo_done:
            for _ in range(self.num_lo_iterations):
                weights = (
                    (np.asarray(residuals) <= float(max_error_sq))
                    & (valid_np > 0)
                ).astype(np.float32)
                if weights.sum() < self.sample_size:
                    break
                r_model, r_inl, r_capped, r_residuals = jax.device_get(
                    self._dispatch(
                        self._refit_jit, "refit", weights, max_error_sq,
                        valid_mask, *data,
                    )
                )
                if (int(r_inl), -float(r_capped)) > (num_inl, -capped_f):
                    num_inl, capped_f = int(r_inl), float(r_capped)
                    model, residuals = r_model, r_residuals
                else:
                    break

        inlier_mask = (np.asarray(residuals) <= float(max_error_sq))[:n]
        return RANSACReport(
            success=True,
            model=jax.tree_util.tree_map(np.asarray, model),
            num_trials=trials,
            support_num_inliers=num_inl,
            inlier_mask=inlier_mask,
        )
