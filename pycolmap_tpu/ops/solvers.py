"""Batched minimal solvers in JAX — the hypothesis generators for RANSAC.

TPU-native replacements for colmap/estimators minimal solvers (ref:
SURVEY.md §2b "Minimal solvers"; upstream absolute_pose.cc, essential_matrix.cc,
fundamental_matrix.cc, homography_matrix.cc, triangulation.cc, similarity
transform). Design contract: every solver maps a *batch* of sample sets to a
batch of hypotheses with fixed shapes — RANSAC scores all hypotheses against
all points as one tensor op (SURVEY.md §2c P2), instead of the reference's
serial hypothesis loop (ref: optim/ransac.h via estimators/*.h).

Conventions:
- image points are in *normalized camera plane* coordinates unless noted;
- all functions broadcast over a leading batch axis B;
- invalid solutions are returned as identity/zero with a validity mask, never
  as NaN (NaN poisons downstream scoring).

Small dense eigenproblems (9x9, 4x4) are solved via ``jnp.linalg.eigh`` of the
normal matrix AᵀA — symmetric eigendecompositions map onto TPU-supported
kernels, unlike nonsymmetric ``eig`` which XLA only provides on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pycolmap_tpu.ops import quaternion as qops


# ---------------------------------------------------------------------------
# closed-form polynomial roots (batched)
# ---------------------------------------------------------------------------


def solve_cubic_real(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d = 0 (batched scalars).

    Returns (roots [..., 3], valid [..., 3]); always at least one real root
    when a != 0 (falls back to quadratic/linear when a ~ 0).
    """
    eps = 1e-12
    a_safe = jnp.where(jnp.abs(a) < eps, 1.0, a)
    p = (3 * a_safe * c - b * b) / (3 * a_safe * a_safe)
    q = (2 * b**3 - 9 * a_safe * b * c + 27 * a_safe**2 * d) / (27 * a_safe**3)
    shift = -b / (3 * a_safe)
    disc = (q / 2) ** 2 + (p / 3) ** 3

    # one real root (disc > 0): Cardano
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2 + sqrt_disc)
    v = jnp.cbrt(-q / 2 - sqrt_disc)
    t_single = u + v

    # three real roots (disc <= 0): trigonometric form
    p_neg = jnp.minimum(p, -eps)
    m = 2 * jnp.sqrt(-p_neg / 3)
    acos_arg = jnp.clip(3 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3
    t0 = m * jnp.cos(theta)
    t1 = m * jnp.cos(theta - 2 * jnp.pi / 3)
    t2 = m * jnp.cos(theta - 4 * jnp.pi / 3)

    three = disc <= 0
    r0 = jnp.where(three, t0, t_single) + shift
    r1 = jnp.where(three, t1, t_single) + shift
    r2 = jnp.where(three, t2, t_single) + shift
    roots = jnp.stack([r0, r1, r2], axis=-1)
    valid = jnp.stack(
        [jnp.ones_like(three), three, three], axis=-1
    )
    # two Newton polish steps recover float32 accuracy lost in Cardano
    for _ in range(2):
        pv = ((a[..., None] * roots + b[..., None]) * roots + c[..., None]) * roots + d[..., None]
        dv = (3 * a[..., None] * roots + 2 * b[..., None]) * roots + c[..., None]
        roots = roots - pv / jnp.where(jnp.abs(dv) < eps, eps, dv)

    # degenerate cubic -> quadratic b x^2 + c x + d
    is_quad = jnp.abs(a)[..., None] < eps
    b_safe = jnp.where(jnp.abs(b) < eps, 1.0, b)
    qdisc = c * c - 4 * b * d
    qs = jnp.sqrt(jnp.maximum(qdisc, 0.0))
    q0 = (-c + qs) / (2 * b_safe)
    q1 = (-c - qs) / (2 * b_safe)
    quad_roots = jnp.stack([q0, q1, jnp.zeros_like(q0)], axis=-1)
    quad_valid = jnp.stack(
        [qdisc >= 0, qdisc >= 0, jnp.zeros_like(qdisc, dtype=bool)], axis=-1
    )
    roots = jnp.where(is_quad, quad_roots, roots)
    valid = jnp.where(is_quad, quad_valid, valid)
    return roots, valid


def solve_quartic_real(a, b, c, d, e):
    """Real roots of a x^4 + b x^3 + c x^2 + d x + e = 0 (batched).

    Ferrari's method via the resolvent cubic. Returns (roots [..., 4],
    valid [..., 4]).
    """
    eps = 1e-12
    a_safe = jnp.where(jnp.abs(a) < eps, 1.0, a)
    # depressed quartic y^4 + p y^2 + q y + r, x = y - b/(4a)
    b_, c_, d_, e_ = b / a_safe, c / a_safe, d / a_safe, e / a_safe
    p = c_ - 3 * b_ * b_ / 8
    q = d_ - b_ * c_ / 2 + b_**3 / 8
    r = e_ - b_ * d_ / 4 + b_ * b_ * c_ / 16 - 3 * b_**4 / 256
    shift = -b_ / 4

    # resolvent cubic: z^3 - p z^2 - 4 r z + (4 p r - q^2) = 0
    zr, zv = solve_cubic_real(
        jnp.ones_like(p), -p, -4 * r, 4 * p * r - q * q
    )
    # pick the real root maximizing z - p (so sqrt arg is largest / stable)
    score = jnp.where(zv, zr - p[..., None], -jnp.inf)
    z = jnp.take_along_axis(zr, jnp.argmax(score, axis=-1)[..., None], axis=-1)[..., 0]

    u2 = z - p
    u = jnp.sqrt(jnp.maximum(u2, 0.0))
    u_safe = jnp.where(u < eps, 1.0, u)
    # factor into two quadratics: y^2 ± u y + (z/2 ∓ q/(2u))
    w1 = z / 2 - q / (2 * u_safe)
    w2 = z / 2 + q / (2 * u_safe)

    d1 = u * u - 4 * w1
    d2 = u * u - 4 * w2
    s1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    y0 = (-u + s1) / 2
    y1 = (-u - s1) / 2
    y2 = (u + s2) / 2
    y3 = (u - s2) / 2
    roots = jnp.stack([y0, y1, y2, y3], axis=-1) + shift[..., None]
    valid = jnp.stack([d1 >= 0, d1 >= 0, d2 >= 0, d2 >= 0], axis=-1)
    # u ~ 0 degenerate (biquadratic): y^2 = (-p ± sqrt(p^2-4r))/2
    bi = (u < eps)[..., None]
    bdisc = p * p - 4 * r
    bs = jnp.sqrt(jnp.maximum(bdisc, 0.0))
    t_pos = (-p + bs) / 2
    t_neg = (-p - bs) / 2
    by0 = jnp.sqrt(jnp.maximum(t_pos, 0.0))
    by2 = jnp.sqrt(jnp.maximum(t_neg, 0.0))
    b_roots = jnp.stack([by0, -by0, by2, -by2], axis=-1) + shift[..., None]
    b_valid = jnp.stack(
        [(bdisc >= 0) & (t_pos >= 0)] * 2 + [(bdisc >= 0) & (t_neg >= 0)] * 2,
        axis=-1,
    )
    roots = jnp.where(bi, b_roots, roots)
    valid = jnp.where(bi, b_valid, valid)
    # Newton polish for float32 accuracy
    an, bn, cn, dn, en = (x[..., None] for x in (a, b, c, d, e))
    for _ in range(2):
        pv = (((an * roots + bn) * roots + cn) * roots + dn) * roots + en
        dv = ((4 * an * roots + 3 * bn) * roots + 2 * cn) * roots + dn
        roots = roots - pv / jnp.where(jnp.abs(dv) < eps, eps, dv)
    return roots, valid


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def smallest_eigvec(A):
    """Eigenvector of the smallest eigenvalue of symmetric A [..., n, n]."""
    w, v = jnp.linalg.eigh(A)
    return v[..., :, 0]


def normalize_points_2d(x, w=None):
    """Hartley normalization: similarity T s.t. centroid 0, RMS dist sqrt(2).

    x: [..., N, 2]; w: optional [..., N] weights. Returns (x_norm, T [...,3,3]).
    """
    if w is None:
        w = jnp.ones(x.shape[:-1], dtype=x.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    centroid = jnp.sum(x * w[..., None], axis=-2) / wsum
    diff = x - centroid[..., None, :]
    rms = jnp.sqrt(
        jnp.maximum(
            jnp.sum(jnp.sum(diff * diff, axis=-1) * w, axis=-1) / wsum[..., 0],
            1e-12,
        )
    )
    scale = jnp.sqrt(2.0) / rms
    x_norm = diff * scale[..., None, None]
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    T = jnp.stack(
        [
            scale, zeros, -scale * centroid[..., 0],
            zeros, scale, -scale * centroid[..., 1],
            zeros, zeros, ones,
        ],
        axis=-1,
    ).reshape(x.shape[:-2] + (3, 3))
    return x_norm, T


# ---------------------------------------------------------------------------
# homography: n-point weighted DLT (n >= 4)
# ---------------------------------------------------------------------------


def homography_dlt(x1, x2, w=None):
    """H such that x2 ~ H x1. x1, x2: [..., N, 2]; w: [..., N] weights.

    Weighted normalized DLT; works for minimal (N=4) and refit (N large,
    weights = inlier mask). Returns H [..., 3, 3] (unnormalized scale).
    """
    if w is None:
        w = jnp.ones(x1.shape[:-1], dtype=x1.dtype)
    x1n, T1 = normalize_points_2d(x1, w)
    x2n, T2 = normalize_points_2d(x2, w)
    u, v = x1n[..., 0], x1n[..., 1]
    up, vp = x2n[..., 0], x2n[..., 1]
    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    # rows: [-u,-v,-1, 0,0,0, u*up, v*up, up] and [0,0,0, -u,-v,-1, u*vp, v*vp, vp]
    r1 = jnp.stack([-u, -v, -one, zero, zero, zero, u * up, v * up, up], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -u, -v, -one, u * vp, v * vp, vp], axis=-1)
    A = jnp.concatenate([r1 * w[..., None], r2 * w[..., None]], axis=-2)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    h = smallest_eigvec(AtA)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # denormalize: H = T2^-1 Hn T1
    H = jnp.linalg.solve(T2, Hn @ T1)
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1.0, H[..., 2:3, 2:3])


# ---------------------------------------------------------------------------
# fundamental / essential matrices
# ---------------------------------------------------------------------------


def _epipolar_design(x1, x2, w):
    u, v = x1[..., 0], x1[..., 1]
    up, vp = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u)
    A = jnp.stack(
        [up * u, up * v, up, vp * u, vp * v, vp, u, v, one], axis=-1
    )
    return A * w[..., None]


def fundamental_8pt(x1, x2, w=None):
    """Normalized weighted 8-point algorithm. x: [..., N, 2], N >= 8.

    Returns F [..., 3, 3] with rank-2 constraint enforced.
    """
    if w is None:
        w = jnp.ones(x1.shape[:-1], dtype=x1.dtype)
    x1n, T1 = normalize_points_2d(x1, w)
    x2n, T2 = normalize_points_2d(x2, w)
    A = _epipolar_design(x1n, x2n, w)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    f = smallest_eigvec(AtA)
    Fn = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(Fn)
    S = S.at[..., 2].set(0.0)
    Fn = U @ (S[..., :, None] * Vt)
    F = jnp.swapaxes(T2, -1, -2) @ Fn @ T1
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1, keepdims=True)
    return F / jnp.maximum(norm[..., None], 1e-12)


def essential_8pt(x1, x2, w=None):
    """8-point essential matrix: 8pt + projection onto the essential manifold
    (singular values (1, 1, 0)).

    TPU-first design note: the reference uses Nistér 5-point as the minimal
    solver (ref: estimators/essential_matrix.h:48-52). Its degree-10
    polynomial needs a nonsymmetric eigensolver, which XLA lacks on TPU;
    batched hypothesis generation is cheap here, so we draw 8-point samples
    instead and compensate with more RANSAC trials (same robustness target,
    hardware-friendly math).
    """
    F = fundamental_8pt(x1, x2, w)
    U, S, Vt = jnp.linalg.svd(F)
    # project: det(U Vt) sign fix, singular values -> (1,1,0)
    det = jnp.linalg.det(U @ Vt)
    s = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.zeros_like(det)], -1)
    E = U @ (s[..., :, None] * Vt)
    return E


# ---------------------------------------------------------------------------
# Nistér 5-point essential matrix
# ---------------------------------------------------------------------------
#
# Polynomial bookkeeping for E(x, y, z) = x*B0 + y*B1 + z*B2 + B3 where
# {B0..B3} is the 4-dim null space of the 5x9 epipolar design matrix.
# Degree-1 polynomials are length-4 coefficient vectors over [x, y, z, 1];
# degree-2 over MON2; degree-3 over MON3 (20 monomials).

_MON2 = "x2 xy xz y2 yz z2 x y z 1"  # indices 0..9 (documentation)
_MON3 = (
    "x3 x2y x2z x2 xy2 xyz xy xz2 xz x y3 y2z y2 yz2 yz y z3 z2 z 1"
)  # indices 0..19

# (mon2 index, deg1 index over [x,y,z,1]) -> mon3 index
_O2_MAP = (
    (0, 0, 0), (0, 1, 1), (0, 2, 2), (0, 3, 3),
    (1, 0, 1), (1, 1, 4), (1, 2, 5), (1, 3, 6),
    (2, 0, 2), (2, 1, 5), (2, 2, 7), (2, 3, 8),
    (3, 0, 4), (3, 1, 10), (3, 2, 11), (3, 3, 12),
    (4, 0, 5), (4, 1, 11), (4, 2, 13), (4, 3, 14),
    (5, 0, 7), (5, 1, 13), (5, 2, 16), (5, 3, 17),
    (6, 0, 3), (6, 1, 6), (6, 2, 8), (6, 3, 9),
    (7, 0, 6), (7, 1, 12), (7, 2, 14), (7, 3, 15),
    (8, 0, 8), (8, 1, 14), (8, 2, 17), (8, 3, 18),
    (9, 0, 9), (9, 1, 15), (9, 2, 18), (9, 3, 19),
)

# Nistér column order: 10 "eliminated" monomials first, then
# [xz2, xz, x, yz2, yz, y, z3, z2, z, 1]
_NISTER_PERM = (0, 10, 1, 4, 2, 3, 11, 12, 5, 6, 7, 8, 9, 13, 14, 15, 16, 17, 18, 19)


def _poly1_mul(a, b):
    """deg1 [..., 4] x deg1 [..., 4] -> deg2 [..., 10] over MON2."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            ax * bx,
            ax * by + ay * bx,
            ax * bz + az * bx,
            ay * by,
            ay * bz + az * by,
            az * bz,
            ax * bw + aw * bx,
            ay * bw + aw * by,
            az * bw + aw * bz,
            aw * bw,
        ],
        axis=-1,
    )


def _poly2_mul1(c, b):
    """deg2 [..., 10] x deg1 [..., 4] -> deg3 [..., 20] over MON3."""
    terms = [jnp.zeros(c.shape[:-1], c.dtype) for _ in range(20)]
    for i2, i1, i3 in _O2_MAP:
        terms[i3] = terms[i3] + c[..., i2] * b[..., i1]
    return jnp.stack(terms, axis=-1)


def _polyval_desc(coeffs, z):
    """Horner evaluation; coeffs [..., D+1] highest degree first."""
    out = coeffs[..., 0]
    for k in range(1, coeffs.shape[-1]):
        out = out * z + coeffs[..., k]
    return out


def _essential_5pt_single(x1, x2):
    """Nistér 5-point solver for ONE sample. x1, x2: [5, 2] normalized coords.

    Returns (E [10, 3, 3], valid [10]). TPU-first design: the classic
    degree-10 polynomial is solved by sign-change isolation on a tan-angle
    grid + fixed-iteration bisection (branch-free, batched), instead of the
    companion-matrix nonsymmetric eig XLA lacks on TPU.
    Ref parity: estimators/essential_matrix.h:48-52 (LORANSAC 5-point).
    """
    one = jnp.ones(5, dtype=x1.dtype)
    A = jnp.stack(
        [
            x2[:, 0] * x1[:, 0], x2[:, 0] * x1[:, 1], x2[:, 0],
            x2[:, 1] * x1[:, 0], x2[:, 1] * x1[:, 1], x2[:, 1],
            x1[:, 0], x1[:, 1], one,
        ],
        axis=-1,
    )  # [5, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    basis = Vt[5:9]  # [4, 9]: E = x*B0 + y*B1 + z*B2 + B3
    # E entries as degree-1 polynomials: Epoly [3, 3, 4]
    Epoly = jnp.moveaxis(basis.reshape(4, 3, 3), 0, -1)

    # --- the 10 cubic constraints -> M [10, 20] ---------------------------
    def det_row():
        def cof(i1, j1, i2, j2):
            return _poly1_mul(Epoly[i1, j1], Epoly[i2, j2])

        c0 = cof(1, 1, 2, 2) - cof(1, 2, 2, 1)
        c1 = cof(1, 2, 2, 0) - cof(1, 0, 2, 2)
        c2 = cof(1, 0, 2, 1) - cof(1, 1, 2, 0)
        return (
            _poly2_mul1(c0, Epoly[0, 0])
            + _poly2_mul1(c1, Epoly[0, 1])
            + _poly2_mul1(c2, Epoly[0, 2])
        )

    # T = E E^T (deg-2, symmetric), M2 = 2T - tr(T) I
    T = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            acc = _poly1_mul(Epoly[i, 0], Epoly[j, 0])
            acc = acc + _poly1_mul(Epoly[i, 1], Epoly[j, 1])
            acc = acc + _poly1_mul(Epoly[i, 2], Epoly[j, 2])
            T[i][j] = acc
            T[j][i] = acc
    tr = T[0][0] + T[1][1] + T[2][2]
    rows = [det_row()]
    for i in range(3):
        for j in range(3):
            acc = _poly2_mul1(2.0 * T[i][0], Epoly[0, j])
            acc = acc + _poly2_mul1(2.0 * T[i][1], Epoly[1, j])
            acc = acc + _poly2_mul1(2.0 * T[i][2], Epoly[2, j])
            acc = acc - _poly2_mul1(tr, Epoly[i, j])
            rows.append(acc)
    M = jnp.stack(rows)[:, jnp.array(_NISTER_PERM)]  # [10, 20]

    # --- Gauss-Jordan: R = M_left^-1 M_right ------------------------------
    R = jnp.linalg.solve(M[:, :10], M[:, 10:])  # [10, 10]
    # last-10 monomial order: [xz2, xz, x, yz2, yz, y, z3, z2, z, 1]
    e, f = R[4], R[5]
    g, h = R[6], R[7]
    i_, j_ = R[8], R[9]

    def kpoly(u, v):
        """<u> - z<v> -> (p [4] x-coeffs z^3..1, q [4] y-coeffs, r [5] z^4..1)."""
        p = jnp.stack([-v[0], u[0] - v[1], u[1] - v[2], u[2]])
        q = jnp.stack([-v[3], u[3] - v[4], u[4] - v[5], u[5]])
        r = jnp.stack([-v[6], u[6] - v[7], u[7] - v[8], u[8] - v[9], u[9]])
        return p, q, r

    kp, kq, kr = kpoly(e, f)
    lp, lq, lr = kpoly(g, h)
    mp, mq, mr = kpoly(i_, j_)

    # det of the 3x3 polynomial matrix B = [[kp,kq,kr],[lp,lq,lr],[mp,mq,mr]]
    conv = jnp.convolve
    qr_lm = conv(lq, mr) - conv(lr, mq)  # deg 7 [8]
    pr_lm = conv(lp, mr) - conv(lr, mp)  # deg 7 [8]
    pq_lm = conv(lp, mq) - conv(lq, mp)  # deg 6 [7]
    n = conv(kp, qr_lm) - conv(kq, pr_lm) + conv(kr, pq_lm)  # [11], z^10..1
    n = n / jnp.maximum(jnp.max(jnp.abs(n)), 1e-20)

    # --- real roots: tan-angle grid + bisection ----------------------------
    G = 512
    theta = jnp.linspace(-jnp.pi / 2 + 1e-4, jnp.pi / 2 - 1e-4, G)

    def qval(th):
        s, t = jnp.sin(th), jnp.cos(th)
        # homogeneous evaluation: t^10 * n(s/t), bounded for all th
        powers_s = s[..., None] ** jnp.arange(10, -1, -1)
        powers_t = t[..., None] ** jnp.arange(0, 11)
        return jnp.sum(n * powers_s * powers_t, axis=-1)

    qg = qval(theta)
    change = jnp.sign(qg[:-1]) * jnp.sign(qg[1:]) < 0  # [G-1]
    pos = jnp.where(change, jnp.arange(G - 1), 2 * G)
    take = jnp.sort(pos)[:10]
    valid = take < G
    take_safe = jnp.where(valid, take, 0)
    lo = theta[take_safe]
    hi = theta[take_safe + 1]
    qlo = qval(lo)

    def bisect_body(_, carry):
        lo, hi, qlo = carry
        mid = 0.5 * (lo + hi)
        qm = qval(mid)
        go_right = jnp.sign(qm) == jnp.sign(qlo)
        lo_new = jnp.where(go_right, mid, lo)
        hi_new = jnp.where(go_right, hi, mid)
        qlo_new = jnp.where(go_right, qm, qlo)
        return lo_new, hi_new, qlo_new

    lo, hi, _ = jax.lax.fori_loop(0, 48, bisect_body, (lo, hi, qlo))
    z = jnp.tan(0.5 * (lo + hi))  # [10]

    # --- back-substitute x, y; assemble E ----------------------------------
    kp_z = _polyval_desc(kp, z)
    kq_z = _polyval_desc(kq, z)
    kr_z = _polyval_desc(kr, z)
    lp_z = _polyval_desc(lp, z)
    lq_z = _polyval_desc(lq, z)
    lr_z = _polyval_desc(lr, z)
    det2 = kp_z * lq_z - kq_z * lp_z
    det2_safe = jnp.where(jnp.abs(det2) < 1e-20, 1e-20, det2)
    x = (kq_z * lr_z - kr_z * lq_z) / det2_safe
    y = (kr_z * lp_z - kp_z * lr_z) / det2_safe

    B = basis.reshape(4, 3, 3)
    E = (
        x[:, None, None] * B[0]
        + y[:, None, None] * B[1]
        + z[:, None, None] * B[2]
        + B[3]
    )  # [10, 3, 3]
    norm = jnp.linalg.norm(E.reshape(10, 9), axis=-1)
    ok = (
        valid
        & jnp.isfinite(norm)
        & (norm > 1e-12)
        & jnp.all(jnp.isfinite(E.reshape(10, 9)), axis=-1)
    )
    E = E / jnp.where(norm > 1e-12, norm, 1.0)[:, None, None]
    E = jnp.where(ok[:, None, None], E, jnp.eye(3, dtype=E.dtype))
    return E, ok


def essential_5pt(x1, x2):
    """Batched Nistér 5-point. x1, x2: [K, 5, 2] -> (E [K, 10, 3, 3], valid [K, 10])."""
    return jax.vmap(_essential_5pt_single)(x1, x2)


def fundamental_7pt(x1, x2):
    """7-point algorithm: up to 3 solutions. x: [..., 7, 2].

    Returns (F [..., 3, 3, 3], valid [..., 3]).
    """
    w = jnp.ones(x1.shape[:-1], dtype=x1.dtype)
    x1n, T1 = normalize_points_2d(x1, w)
    x2n, T2 = normalize_points_2d(x2, w)
    A = _epipolar_design(x1n, x2n, w)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    eigw, eigv = jnp.linalg.eigh(AtA)
    f1 = eigv[..., :, 0]
    f2 = eigv[..., :, 1]
    F1 = f1.reshape(f1.shape[:-1] + (3, 3))
    F2 = f2.reshape(f2.shape[:-1] + (3, 3))

    # det(a F1 + (1-a) F2) = 0 -> cubic in a
    D = F1 - F2

    def det3(M):
        return jnp.linalg.det(M)

    # coefficients via evaluation at 4 points (deg-3 polynomial interpolation)
    # p(a) = det(F2 + a D); evaluate at a = 0, 1, -1, 2
    p0 = det3(F2)
    p1 = det3(F2 + D)
    pm1 = det3(F2 - D)
    p2 = det3(F2 + 2 * D)
    # p(a) = c3 a^3 + c2 a^2 + c1 a + c0
    c0 = p0
    c2 = (p1 + pm1) / 2 - p0
    c3 = (p2 - 2 * p1 + p0 - 2 * c2) / 6
    c1 = p1 - c0 - c2 - c3
    roots, valid = solve_cubic_real(c3, c2, c1, c0)
    a = roots[..., :, None, None]
    Fn = F2[..., None, :, :] + a * D[..., None, :, :]
    F = (
        jnp.swapaxes(T2, -1, -2)[..., None, :, :]
        @ Fn
        @ T1[..., None, :, :]
    )
    norm = jnp.linalg.norm(
        F.reshape(F.shape[:-2] + (9,)), axis=-1, keepdims=True
    )[..., None]
    return F / jnp.maximum(norm, 1e-12), valid


def decompose_essential(E):
    """E [..., 3, 3] -> (R1, R2, t) candidate decompositions (Hartley-Zisserman)."""
    U, S, Vt = jnp.linalg.svd(E)
    # flip signs so U and V are proper rotations
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))
    U = U * jnp.where(detU[..., None, None] < 0, -1.0, 1.0)
    Vt = Vt * jnp.where(detV[..., None, None] < 0, -1.0, 1.0)
    W = jnp.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


# ---------------------------------------------------------------------------
# triangulation
# ---------------------------------------------------------------------------


def triangulate_dlt(proj, x, w=None):
    """Multi-view DLT triangulation.

    proj: [..., M, 3, 4] projection matrices (world -> normalized image plane,
    i.e. [R|t] for calibrated cameras); x: [..., M, 2] normalized points;
    w: [..., M] view weights/mask. Returns X [..., 3] (world).
    """
    if w is None:
        w = jnp.ones(x.shape[:-1], dtype=x.dtype)
    r0 = x[..., 0:1] * proj[..., 2, :] - proj[..., 0, :]  # [..., M, 4]
    r1 = x[..., 1:2] * proj[..., 2, :] - proj[..., 1, :]
    A = jnp.concatenate([r0 * w[..., None], r1 * w[..., None]], axis=-2)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    Xh = smallest_eigvec(AtA)
    wcoord = Xh[..., 3]
    denom = jnp.where(jnp.abs(wcoord) < 1e-12, 1e-12, wcoord)
    return Xh[..., :3] / denom[..., None]


def triangulate_midpoint(center1, dir1, center2, dir2):
    """Mid-point triangulation for two rays (world frame)."""
    # solve [d1, -d2] [s; t] = c2 - c1 in least squares
    d11 = jnp.sum(dir1 * dir1, axis=-1)
    d12 = jnp.sum(dir1 * dir2, axis=-1)
    d22 = jnp.sum(dir2 * dir2, axis=-1)
    dc = center2 - center1
    b1 = jnp.sum(dir1 * dc, axis=-1)
    b2 = jnp.sum(dir2 * dc, axis=-1)
    det = d11 * d22 - d12 * d12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (b1 * d22 - b2 * d12) / det
    t = (b1 * d12 - b2 * d11) / det
    p1 = center1 + s[..., None] * dir1
    p2 = center2 + t[..., None] * dir2
    return 0.5 * (p1 + p2)


# ---------------------------------------------------------------------------
# absolute pose: P3P (Grunert) + DLT-PnP for refits
# ---------------------------------------------------------------------------


def p3p(x, X):
    """P3P (Grunert's distance formulation + quartic).

    x: [..., 3, 2] normalized image points; X: [..., 3, 3] world points.
    Returns (quat [..., 4, 4] wxyz, trans [..., 4, 3], valid [..., 4]) — up
    to 4 cam_from_world pose candidates.
    """
    # unit rays
    rays = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    f1, f2, f3 = rays[..., 0, :], rays[..., 1, :], rays[..., 2, :]
    P1, P2, P3 = X[..., 0, :], X[..., 1, :], X[..., 2, :]

    # inter-point distances
    a = jnp.linalg.norm(P2 - P3, axis=-1)  # opposite vertex 1
    b = jnp.linalg.norm(P1 - P3, axis=-1)
    c = jnp.linalg.norm(P1 - P2, axis=-1)
    cos_alpha = jnp.sum(f2 * f3, axis=-1)
    cos_beta = jnp.sum(f1 * f3, axis=-1)
    cos_gamma = jnp.sum(f1 * f2, axis=-1)

    a2, b2, c2 = a * a, b * b, c * c
    # Grunert's quartic in v = s3/s1 (coefficients per Haralick et al. 1991;
    # verified symbolically against synthetic poses).
    eps = 1e-12
    b2_safe = jnp.where(b2 < eps, 1.0, b2)
    p = (a2 - c2) / b2_safe
    q = (a2 + c2) / b2_safe

    A4 = (p - 1) ** 2 - 4 * c2 / b2_safe * cos_alpha**2
    A3 = 4 * (
        p * (1 - p) * cos_beta
        - (1 - q) * cos_alpha * cos_gamma
        + 2 * c2 / b2_safe * cos_alpha**2 * cos_beta
    )
    A2 = 2 * (
        p**2
        - 1
        + 2 * p**2 * cos_beta**2
        + 2 * (b2 - c2) / b2_safe * cos_alpha**2
        - 4 * q * cos_alpha * cos_beta * cos_gamma
        + 2 * (b2 - a2) / b2_safe * cos_gamma**2
    )
    A1 = 4 * (
        -p * (1 + p) * cos_beta
        + 2 * a2 / b2_safe * cos_gamma**2 * cos_beta
        - (1 - q) * cos_alpha * cos_gamma
    )
    A0 = (1 + p) ** 2 - 4 * a2 / b2_safe * cos_gamma**2

    roots, valid = solve_quartic_real(A4, A3, A2, A1, A0)  # v = s3/s1

    def pose_from_root(v):
        # s1 from the beta equation: s1^2 (1 + v^2 - 2 v cos_beta) = b^2
        denom1 = 1 + v * v - 2 * v * cos_beta
        s1 = jnp.sqrt(b2 / jnp.where(denom1 < eps, eps, denom1))
        # u = s2/s1 from combining the alpha and gamma equations
        uden = 2 * (cos_gamma - v * cos_alpha)
        u = ((-1 + p) * v * v - 2 * p * cos_beta * v + 1 + p) / jnp.where(
            jnp.abs(uden) < eps, eps, uden
        )
        s2 = u * s1
        s3 = v * s1
        # Newton polish of (s1,s2,s3) on the three law-of-cosines equations —
        # recovers the accuracy float32 loses in the quartic
        for _ in range(3):
            g1 = s2 * s2 + s3 * s3 - 2 * s2 * s3 * cos_alpha - a2
            g2 = s1 * s1 + s3 * s3 - 2 * s1 * s3 * cos_beta - b2
            g3 = s1 * s1 + s2 * s2 - 2 * s1 * s2 * cos_gamma - c2
            J = jnp.stack(
                [
                    jnp.zeros_like(s1), 2 * s2 - 2 * s3 * cos_alpha, 2 * s3 - 2 * s2 * cos_alpha,
                    2 * s1 - 2 * s3 * cos_beta, jnp.zeros_like(s1), 2 * s3 - 2 * s1 * cos_beta,
                    2 * s1 - 2 * s2 * cos_gamma, 2 * s2 - 2 * s1 * cos_gamma, jnp.zeros_like(s1),
                ],
                axis=-1,
            ).reshape(s1.shape + (3, 3))
            g = jnp.stack([g1, g2, g3], axis=-1)
            JtJ = jnp.swapaxes(J, -1, -2) @ J + 1e-9 * jnp.eye(3, dtype=J.dtype)
            rhs = jnp.einsum("...ji,...j->...i", J, g)
            delta = jnp.linalg.solve(JtJ, rhs[..., None])[..., 0]
            s1 = s1 - delta[..., 0]
            s2 = s2 - delta[..., 1]
            s3 = s3 - delta[..., 2]
        cam_pts = jnp.stack(
            [s1[..., None] * f1, s2[..., None] * f2, s3[..., None] * f3], axis=-2
        )
        return cam_pts, (s1 > 0) & (s2 > 0) & (s3 > 0) & (denom1 > eps)

    quats, transs, valids = [], [], []
    for k in range(4):
        v = roots[..., k]
        cam_pts, pos_ok = pose_from_root(v)
        q_k, t_k, ok = _rigid_from_3pts(X, cam_pts)
        quats.append(q_k)
        transs.append(t_k)
        valids.append(valid[..., k] & pos_ok & ok)
    return (
        jnp.stack(quats, axis=-2),
        jnp.stack(transs, axis=-2),
        jnp.stack(valids, axis=-1),
    )


def _rigid_from_3pts(world_pts, cam_pts):
    """Absolute orientation cam_from_world from 3 corresponding points.

    Procrustes on the 3-point sets (centroid + SVD). Returns (quat, t, ok).
    """
    wc = jnp.mean(world_pts, axis=-2, keepdims=True)
    cc = jnp.mean(cam_pts, axis=-2, keepdims=True)
    Wd = world_pts - wc
    Cd = cam_pts - cc
    H = jnp.einsum("...ni,...nj->...ij", Wd, Cd)  # world -> cam covariance
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    R = jnp.swapaxes(Vt, -1, -2) @ (D[..., :, None] * jnp.swapaxes(U, -1, -2))
    t = cc[..., 0, :] - jnp.einsum("...ij,...j->...i", R, wc[..., 0, :])
    ok = S[..., 1] > 1e-12  # non-degenerate (not collinear)
    return qops.matrix_to_quat(R), t, ok


def pnp_dlt(x, X, w=None):
    """Linear PnP for n >= 6 points (DLT on the 3x4 projection matrix).

    x: [..., N, 2] normalized points; X: [..., N, 3] world points; w weights.
    Returns (quat wxyz, trans) of cam_from_world with R orthogonalized.
    """
    if w is None:
        w = jnp.ones(x.shape[:-1], dtype=x.dtype)
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    zero = jnp.zeros_like(Xh)
    u = x[..., 0:1]
    v = x[..., 1:2]
    r1 = jnp.concatenate([Xh, zero, -u * Xh], axis=-1)  # [..., N, 12]
    r2 = jnp.concatenate([zero, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1 * w[..., None], r2 * w[..., None]], axis=-2)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    pvec = smallest_eigvec(AtA)
    P = pvec.reshape(pvec.shape[:-1] + (3, 4))
    M = P[..., :3]
    # sign: points should have positive depth on average
    depths = jnp.einsum("...ij,...nj->...ni", P, Xh)[..., 2]
    sign = jnp.sign(jnp.sum(jnp.sign(depths) * w, axis=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    P = P * sign[..., None, None]
    M = P[..., :3]
    # scale + orthogonalize via SVD
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(detUV)] * 2 + [detUV], axis=-1)
    R = U @ (D[..., :, None] * Vt)
    scale = jnp.mean(S, axis=-1) * jnp.ones_like(detUV)
    scale = jnp.where(scale < 1e-12, 1e-12, scale)
    t = P[..., 3] / scale[..., None]
    return qops.matrix_to_quat(R), t


def epnp(x, X, w=None, gn_iters: int = 5):
    """EPnP non-minimal PnP for n >= 4 points (Lepetit et al. IJCV'09; the
    reference's non-minimal absolute-pose solver, ref absolute_pose.h:148).

    x: [..., N, 2] normalized image points; X: [..., N, 3] world points;
    w: [..., N] weights. Returns (quat wxyz, trans) of cam_from_world.

    Batched and jit-friendly: control points from weighted PCA, 12x12
    eigendecomposition, the N=1/2/3 beta approximations each Gauss-Newton
    refined on the 6 control-point distance constraints, best case chosen
    by weighted reprojection error.
    """
    if w is None:
        w = jnp.ones(x.shape[:-1], dtype=x.dtype)
    eps = 1e-10
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), eps)
    wn = w / wsum  # [..., N]

    # -- control points: weighted centroid + principal directions ----------
    c0 = jnp.sum(X * wn[..., None], axis=-2)  # [..., 3]
    A = X - c0[..., None, :]
    cov = jnp.einsum("...n,...ni,...nj->...ij", wn, A, A)
    lam, V = jnp.linalg.eigh(cov)  # ascending
    sig = jnp.sqrt(jnp.maximum(lam, eps))
    # planar guard: for (near-)coplanar scenes the smallest sigma collapses
    # the 4th control point onto the centroid and Cmat goes singular in f32;
    # floor each sigma relative to the LARGEST so the control tetrahedron
    # keeps finite volume (reference EPnP switches to a 3-control-point
    # planar formulation; a relative floor keeps one batched code path)
    sig = jnp.maximum(sig, sig[..., -1:] * 1e-3)
    ctrl_w = jnp.stack(
        [c0]
        + [c0 + sig[..., k, None] * V[..., :, k] for k in (2, 1, 0)],
        axis=-2,
    )  # [..., 4, 3]

    # -- barycentric coordinates -------------------------------------------
    ones4 = jnp.ones(ctrl_w.shape[:-2] + (1, 4), dtype=x.dtype)
    Cmat = jnp.concatenate(
        [jnp.swapaxes(ctrl_w, -1, -2), ones4], axis=-2
    )  # [..., 4, 4]; columns are [c_j; 1]
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    alpha = jnp.swapaxes(
        jnp.linalg.solve(Cmat, jnp.swapaxes(Xh, -1, -2)), -1, -2
    )  # [..., N, 4]

    # -- M^T M (never materialize M beyond per-point rows) -----------------
    u = x[..., 0:1]  # [..., N, 1]
    v = x[..., 1:2]
    zero = jnp.zeros_like(alpha[..., None])
    # per control point j the 3 columns are alpha_j*(1,0,-u) / (0,1,-v)
    ru = jnp.stack(
        [alpha[..., None] * jnp.ones_like(zero), zero,
         -alpha[..., None] * u[..., None]], axis=-1
    ).reshape(alpha.shape[:-1] + (12,))
    rv = jnp.stack(
        [zero, alpha[..., None] * jnp.ones_like(zero),
         -alpha[..., None] * v[..., None]], axis=-1
    ).reshape(alpha.shape[:-1] + (12,))
    rows = jnp.stack([ru, rv], axis=-2)  # [..., N, 2, 12]
    MtM = jnp.einsum("...nri,...nrj->...ij", rows * w[..., None, None], rows)
    _, evecs = jnp.linalg.eigh(MtM)
    V4 = evecs[..., :, :4]  # 4 smallest — [..., 12, 4]
    vctrl = jnp.swapaxes(V4, -1, -2).reshape(V4.shape[:-2] + (4, 4, 3))
    # vctrl[k, j] = control point j of null-basis vector k

    pairs = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    dv = jnp.stack(
        [vctrl[..., a, :] - vctrl[..., b, :] for a, b in pairs], axis=-2
    )  # [..., 4, 6, 3]
    dw = jnp.stack(
        [ctrl_w[..., a, :] - ctrl_w[..., b, :] for a, b in pairs], axis=-2
    )
    rho = jnp.sum(dw * dw, axis=-1)  # [..., 6]

    # dot products dv_j . dv_k per pair
    def ddot(j, k):
        return jnp.sum(dv[..., j, :, :] * dv[..., k, :, :], axis=-1)

    d11, d12, d22 = ddot(0, 0), ddot(0, 1), ddot(1, 1)
    d13, d23, d33 = ddot(0, 2), ddot(1, 2), ddot(2, 2)

    def lstsq_sym(L, b):
        # normal-equation least squares, batched small systems
        LtL = jnp.einsum("...pi,...pj->...ij", L, L)
        LtL = LtL + eps * jnp.eye(LtL.shape[-1], dtype=L.dtype)
        Ltb = jnp.einsum("...pi,...p->...i", L, b)
        return jnp.linalg.solve(LtL, Ltb[..., None])[..., 0]

    # case N=1
    b11 = jnp.sum(d11 * rho, axis=-1) / jnp.maximum(
        jnp.sum(d11 * d11, axis=-1), eps
    )
    beta_c1 = jnp.stack(
        [jnp.sqrt(jnp.maximum(b11, 0.0))]
        + [jnp.zeros_like(b11)] * 3, axis=-1
    )
    # case N=2: unknowns (b11, b12, b22)
    L2 = jnp.stack([d11, 2 * d12, d22], axis=-1)
    s2 = lstsq_sym(L2, rho)
    b1 = jnp.sqrt(jnp.abs(s2[..., 0]))
    b2 = jnp.sqrt(jnp.abs(s2[..., 2])) * jnp.sign(s2[..., 1]) * jnp.where(
        s2[..., 0] < 0, -1.0, 1.0
    )
    beta_c2 = jnp.stack(
        [b1, b2, jnp.zeros_like(b1), jnp.zeros_like(b1)], axis=-1
    )
    # case N=3: unknowns (b11, b12, b22, b13, b23, b33) — 6 eqs, 6 unknowns
    L3 = jnp.stack([d11, 2 * d12, d22, 2 * d13, 2 * d23, d33], axis=-1)
    s3 = lstsq_sym(L3, rho)
    b1 = jnp.sqrt(jnp.abs(s3[..., 0]))
    b2 = jnp.sqrt(jnp.abs(s3[..., 2])) * jnp.sign(s3[..., 1])
    b3 = jnp.sqrt(jnp.abs(s3[..., 5])) * jnp.sign(s3[..., 3])
    beta_c3 = jnp.stack([b1, b2, b3, jnp.zeros_like(b1)], axis=-1)

    def gauss_newton(beta):
        def gn_step(beta, _):
            cc_d = jnp.einsum("...k,...kpi->...pi", beta, dv)  # [..., 6, 3]
            r = jnp.sum(cc_d * cc_d, axis=-1) - rho  # [..., 6]
            J = 2 * jnp.einsum("...pi,...kpi->...pk", cc_d, dv)  # [..., 6, 4]
            JtJ = jnp.einsum("...pi,...pj->...ij", J, J)
            JtJ = JtJ + 1e-8 * jnp.eye(4, dtype=J.dtype)
            Jtr = jnp.einsum("...pi,...p->...i", J, r)
            return beta - jnp.linalg.solve(JtJ, Jtr[..., None])[..., 0], None

        beta, _ = jax.lax.scan(gn_step, beta, None, length=gn_iters)
        return beta

    def pose_from_beta(beta):
        cc = jnp.einsum("...k,...kji->...ji", beta, vctrl)  # [..., 4, 3]
        pc = jnp.einsum("...nj,...ji->...ni", alpha, cc)  # [..., N, 3]
        # cheirality: flip the null-space sign so depths are positive
        flip = jnp.where(
            jnp.sum(jnp.sign(pc[..., 2]) * w, axis=-1) < 0, -1.0, 1.0
        )
        pc = pc * flip[..., None, None]
        _, quat, t = umeyama(X, pc, w, with_scale=False)
        return quat, t

    def reproj_err(quat, t):
        p_cam = qops.quat_rotate(quat[..., None, :], X) + t[..., None, :]
        z = p_cam[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        proj = p_cam[..., :2] / z_safe[..., None]
        err = jnp.sum((proj - x) ** 2, axis=-1)
        err = jnp.where(z <= 1e-8, 1e6, err)
        return jnp.sum(err * wn, axis=-1)

    best_q, best_t, best_e = None, None, None
    for beta0 in (beta_c1, beta_c2, beta_c3):
        quat, t = pose_from_beta(gauss_newton(beta0))
        e = reproj_err(quat, t)
        if best_e is None:
            best_q, best_t, best_e = quat, t, e
        else:
            take = e < best_e
            best_q = jnp.where(take[..., None], quat, best_q)
            best_t = jnp.where(take[..., None], t, best_t)
            best_e = jnp.minimum(e, best_e)
    return best_q, best_t


# ---------------------------------------------------------------------------
# similarity transform (Umeyama)
# ---------------------------------------------------------------------------


def umeyama(src, dst, w=None, with_scale=True):
    """Weighted Umeyama: s, R, t minimizing |dst - (s R src + t)|².

    src, dst: [..., N, 3]; w: [..., N]. Returns (scale, quat wxyz, t).
    """
    if w is None:
        w = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    mu_s = jnp.sum(src * w[..., None], axis=-2) / wsum
    mu_d = jnp.sum(dst * w[..., None], axis=-2) / wsum
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    cov = jnp.einsum("...n,...ni,...nj->...ij", w, dc, sc) / wsum[..., :, None]
    var_s = jnp.sum(jnp.sum(sc * sc, axis=-1) * w, axis=-1) / wsum[..., 0]
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.linalg.det(U) * jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    R = U @ (D[..., :, None] * Vt)
    if with_scale:
        scale = jnp.sum(S * D, axis=-1) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.ones_like(var_s)
    t = mu_d - scale[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return scale, qops.matrix_to_quat(R), t
