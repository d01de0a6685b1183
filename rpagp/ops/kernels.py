"""Kernel functions: full-D base kernels and randomly-projected additive kernels.

TPU-native rebuild of the reference's novel layer
([U] gp_models/kernels.py — GeneralizedProjectionKernel /
PolynomialProjectionKernel; [G] gpytorch/kernels/{rbf_kernel, matern_kernel,
scale_kernel}.py for the base kernels; unverified paths, see SURVEY.md).

Design stance (SURVEY.md §7): GPyTorch composes kernels as lazy-tensor
objects; in JAX the idiomatic equivalent is *plain functions over a param
pytree*. A kernel here is a static `KernelSpec` (hashable config, safe to
close over under jit) plus:

  gram(spec, params, buffers, x1, x2)  -> dense (n, m) Gram block
  gram_diag(spec, params, buffers, x)  -> (n,) diagonal
  mvm(spec, params, buffers, x1, x2, V) -> K @ V, blocked, never
                                            materializing (J, n, m)

The RPA kernel is
    k(x, x') = outputscale * (1/J) * sum_j  prod_i k1d(P_{ji} x / l_{ji},
                                                       P_{ji} x' / l_{ji})
with P fixed random projections (arXiv:1912.12834). All J*d 1-D components
evaluate as ONE batched op with a leading (J*d) axis — the TPU analog of
GPyTorch batch-mode kernels — so the VPU sees a single large elementwise
computation and XLA fuses the projection matmul (MXU) into it.

Everything is f32 by default; the projection matmul x @ P is the only MXU
op and may run bf16-in/f32-out on TPU via `proj_dtype`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.transforms import softplus

# ---------------------------------------------------------------------------
# Static kernel specification
# ---------------------------------------------------------------------------

FULL_D_FAMILIES = ("rbf", "matern12", "matern32", "matern52")

# The J->inf LIMIT of the RPA kernel for gaussian projections + RBF base
# (arXiv:1912.12834 Thm 1): p ~ N(0, I/D) gives p.(x-x') ~ N(0,
# ||x-x'||^2/D), and E_z~N(0,s^2) exp(-z^2/(2 l^2)) = 1/sqrt(1+s^2/l^2):
#
#     k_inf(x, x') = outputscale / sqrt(1 + ||x - x'||^2 / (D l^2))
#
# Runnable as a MODEL (not just the test/figure oracle in
# scripts/j_convergence.py) so the finite-J accuracy gap can be
# separated from the kernel-FAMILY gap on any dataset: if rp_poly_jJ
# trails exact_rbf but matches rp_limit_rbf, the gap is the family on
# that data (benign, the paper's regime); if it trails rp_limit_rbf by
# more than the O(1/sqrt(J)) band, the finite-J spec is at fault.
LIMIT_FAMILIES = ("rp_limit_rbf",)


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """Static (hashable) kernel configuration — safe to close over in jit.

    family: "rbf" | "matern12" | "matern32" | "matern52"  (full-D kernel), or
            "projection" (the RPA additive kernel).
    For full-D kernels:
      ard: one lengthscale per input dim if True, shared if False.
    For projection kernels:
      J: number of additive components.
      degrees: per-component degree d_j (number of 1-D sub-kernels multiplied
               within component j). PolynomialProjectionKernel == uniform
               degrees (d,)*J; GeneralizedProjectionKernel == heterogeneous.
      bases: per-component base 1-D kernel family.
      proj_dist: projection sampling distribution (see projections.gen_rp).
      learn_proj: if True the projection matrix is a trainable parameter
                  (reference's learn_proj flag); else a fixed buffer.
      per_component_scale: one outputscale per component instead of shared.
      space_proj: post-process projections to be near-equally spaced.
      ski / grid_size: evaluate each 1-D component with grid interpolation
                  (handled by ops.ski; the dense gram here stays exact).
      interp: SKI interpolation execution plan — "dense" (default; build
                  the (block, m) interpolation matrix on the fly and ride
                  the MXU: no gathers, ~5x the sorted plan's speed at
                  HouseElectric scale) or "sorted" (sort/cumsum/gather
                  plan; exact-f32 adjoints, kept for parity testing).
    """

    family: str = "rbf"
    ard: bool = True
    # projection-kernel fields
    J: int = 0
    degrees: Tuple[int, ...] = ()
    bases: Tuple[str, ...] = ()
    # sub_dim = the reference's `k`: each sub-kernel sees a k-dim
    # projection. For RBF, an isotropic k-dim sub-kernel factors EXACTLY
    # into k 1-D factors sharing one lengthscale — implemented as that
    # tied product (for Matern bases the tied product is a modeling
    # choice, not the k-dim Matern; the reference's experiments use RBF).
    sub_dim: int = 1
    proj_dist: str = "gaussian"
    learn_proj: bool = False
    per_component_scale: bool = False
    space_proj: bool = False
    ski: bool = False
    grid_size: int = 0
    interp: str = "dense"

    @property
    def is_projection(self) -> bool:
        return self.family == "projection"

    @property
    def total_proj_dims(self) -> int:
        return int(sum(self.degrees)) * self.sub_dim

    @property
    def num_lengthscales(self) -> int:
        """One lengthscale per sub-kernel (k 1-D factors share one)."""
        return int(sum(self.degrees))

    @staticmethod
    def polynomial(J: int, d: int = 1, base: str = "rbf", k: int = 1,
                   **kw) -> "KernelSpec":
        """PolynomialProjectionKernel(J, k, d, base) equivalent."""
        return KernelSpec(
            family="projection", J=J, degrees=(d,) * J, bases=(base,) * J,
            sub_dim=k, **kw
        )

    @staticmethod
    def generalized(degrees, bases, **kw) -> "KernelSpec":
        """GeneralizedProjectionKernel equivalent (heterogeneous components)."""
        degrees = tuple(int(d) for d in degrees)
        bases = tuple(bases)
        assert len(degrees) == len(bases)
        return KernelSpec(
            family="projection", J=len(degrees), degrees=degrees, bases=bases, **kw
        )


# ---------------------------------------------------------------------------
# 1-D stationary base kernels on pre-scaled differences t = (z - z') / l
# ---------------------------------------------------------------------------

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979


def _k1d(base: str, t):
    """Stationary 1-D kernel value at scaled difference t (elementwise, VPU)."""
    if base == "rbf":
        return jnp.exp(-0.5 * t * t)
    a = jnp.abs(t)
    if base == "matern12":
        return jnp.exp(-a)
    if base == "matern32":
        s = _SQRT3 * a
        return (1.0 + s) * jnp.exp(-s)
    if base == "matern52":
        s = _SQRT5 * a
        return (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    raise ValueError(f"unknown 1-D base kernel {base!r}")


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def init_kernel_params(key, spec: KernelSpec, D: int, dtype=jnp.float32):
    """Build (params, buffers) pytrees for a kernel.

    Raw values init to 0.0 => softplus(0) ~ 0.6931 for lengthscale /
    outputscale — identical to GPyTorch's defaults ([G]
    gpytorch/kernels/kernel.py raw-parameter init) so hyperparameter
    trajectories are comparable with the reference.
    """
    from ..projections import gen_rp, space_equally  # local to avoid cycle

    zeros = partial(jnp.zeros, dtype=dtype)
    if spec.family in FULL_D_FAMILIES:
        n_ls = D if spec.ard else 1
        params = {
            "raw_lengthscale": zeros((n_ls,)),
            "raw_outputscale": zeros(()),
        }
        return params, {}
    if spec.family in LIMIT_FAMILIES:
        # one SHARED lengthscale: the limit integral ties every
        # projection's 1-D base lengthscale to a single l (ARD has no
        # analog — the gaussian projection mixes input dims isotropically)
        return {"raw_lengthscale": zeros((1,)),
                "raw_outputscale": zeros(())}, {}

    if not spec.is_projection:
        raise ValueError(f"unknown kernel family {spec.family!r}")

    M = spec.total_proj_dims  # total 1-D projections = sum(degrees) * k
    P = gen_rp(key, D, M, spec.proj_dist, dtype=dtype)
    if spec.space_proj:
        P, _ = space_equally(P)
    n_scales = spec.J if spec.per_component_scale else 1
    params = {
        # one lengthscale per SUB-KERNEL (its k 1-D factors share it)
        "raw_lengthscale": zeros((spec.num_lengthscales,)),
        "raw_outputscale": zeros((n_scales,)) if spec.per_component_scale else zeros(()),
    }
    buffers = {}
    if spec.learn_proj:
        params["proj"] = P
    else:
        buffers["proj"] = P
    return params, buffers


def _get_proj(params, buffers):
    return params["proj"] if "proj" in params else buffers["proj"]


# ---------------------------------------------------------------------------
# Component bookkeeping for heterogeneous (generalized) kernels
# ---------------------------------------------------------------------------


def _component_groups(spec: KernelSpec):
    """Group components by (degree, base) so each group is one batched op.

    Returns list of (degree, base, component_indices, flat_proj_indices):
    components in a group share degree & base and evaluate as a single
    leading-axis batch — no per-component Python loop at trace time beyond
    the (static, small) number of distinct groups.
    """
    groups = {}
    offset = 0
    k = spec.sub_dim
    for j, (d, b) in enumerate(zip(spec.degrees, spec.bases)):
        groups.setdefault((d, b), ([], []))
        comp_idx, flat_idx = groups[(d, b)]
        comp_idx.append(j)
        flat_idx.extend(range(offset, offset + d * k))
        offset += d * k
    return [
        (d, b, tuple(ci), tuple(fi)) for (d, b), (ci, fi) in sorted(groups.items())
    ]


# ---------------------------------------------------------------------------
# Dense Gram evaluation
# ---------------------------------------------------------------------------


def _full_d_gram(spec: KernelSpec, params, x1, x2):
    """Full-D stationary kernel Gram via the MXU-friendly sqdist identity.

    The cross-term matmul runs at Precision.HIGHEST: kernel matrices are
    acutely sensitive to sqdist cancellation error near zero distance
    (bf16-default matmuls put ~1e-2 absolute error on the diagonal, enough
    to break PSD-ness and Cholesky). The matmul is thin (K = D), so full
    f32 passes cost almost nothing relative to the n*m elementwise work.
    """
    ls = softplus(params["raw_lengthscale"])  # (D,) or (1,)
    u1 = x1 / ls
    u2 = x2 / ls
    # ||u1||^2 + ||u2||^2 - 2 u1.u2 — the matmul hits the MXU.
    cross = jnp.matmul(u1, u2.T, precision=jax.lax.Precision.HIGHEST)
    sq = (
        jnp.sum(u1 * u1, axis=-1)[:, None]
        + jnp.sum(u2 * u2, axis=-1)[None, :]
        - 2.0 * cross
    )
    sq = jnp.maximum(sq, 0.0)
    if x2 is x1:
        # exact zeros on the diagonal of a symmetric Gram
        n = x1.shape[0]
        sq = sq * (1.0 - jnp.eye(n, dtype=sq.dtype))
    if spec.family == "rbf":
        k = jnp.exp(-0.5 * sq)
    else:
        r = jnp.sqrt(sq + 1e-20)
        k = _k1d(spec.family, r)  # matern families depend on |t| only
    outputscale = softplus(params["raw_outputscale"])
    return outputscale * k


def _limit_gram(spec: KernelSpec, params, x1, x2):
    """Closed-form J->inf RPA limit kernel (see LIMIT_FAMILIES note):
    k_inf = os / sqrt(1 + ||x-x'||^2 / (D l^2)). Same MXU sqdist
    identity and HIGHEST-precision cross term as _full_d_gram."""
    ls = softplus(params["raw_lengthscale"])[0]  # shared scalar
    D = x1.shape[1]
    cross = jnp.matmul(x1, x2.T, precision=jax.lax.Precision.HIGHEST)
    sq = (
        jnp.sum(x1 * x1, axis=-1)[:, None]
        + jnp.sum(x2 * x2, axis=-1)[None, :]
        - 2.0 * cross
    )
    sq = jnp.maximum(sq, 0.0)
    if x2 is x1:
        n = x1.shape[0]
        sq = sq * (1.0 - jnp.eye(n, dtype=sq.dtype))
    outputscale = softplus(params["raw_outputscale"])
    return outputscale * jax.lax.rsqrt(1.0 + sq / (D * ls * ls))


def _projected_coords(spec: KernelSpec, params, buffers, x):
    """x (n, D) -> scaled projected coordinates (M, n), M = sum(degrees).

    The projection x @ P is the kernel's only matmul — MXU work — and the
    lengthscale division fuses into it under XLA.
    """
    P = _get_proj(params, buffers)
    ls = softplus(params["raw_lengthscale"])  # (num_lengthscales,)
    if spec.sub_dim > 1:
        ls = jnp.repeat(ls, spec.sub_dim)  # tie each sub-kernel's k factors
    # HIGHEST precision: projected coordinates feed 1-D differences, so
    # bf16-default matmul error would shift every kernel value; the matmul
    # is thin (K = D), full f32 passes are cheap.
    z = jnp.matmul(x, P, precision=jax.lax.Precision.HIGHEST)  # (n, M) — MXU
    return (z / ls).T  # (M, n)


def _component_scales(spec: KernelSpec, params, dtype):
    """Per-component weights w_j with sum-structure sigma^2/J baked in: (J,)."""
    outputscale = softplus(params["raw_outputscale"])
    if spec.per_component_scale:
        return outputscale / spec.J  # (J,)
    return jnp.full((spec.J,), 1.0, dtype) * outputscale / spec.J


def _projection_gram(spec: KernelSpec, params, buffers, x1, x2):
    """Dense RPA Gram: (n, m). Materializes (J, n, m) per group — exact path
    only (small/medium n); the CG path uses `mvm` below instead."""
    u1 = _projected_coords(spec, params, buffers, x1)  # (M, n)
    u2 = u1 if x2 is x1 else _projected_coords(spec, params, buffers, x2)
    w = _component_scales(spec, params, x1.dtype)  # (J,)
    n, m = x1.shape[0], x2.shape[0]
    out = jnp.zeros((n, m), x1.dtype)
    for d, base, comp_idx, flat_idx in _component_groups(spec):
        dk = d * spec.sub_dim  # 1-D factors per component
        fi = jnp.asarray(flat_idx)
        a = u1[fi]  # (g*dk, n)
        b = u2[fi]  # (g*dk, m)
        t = a[:, :, None] - b[:, None, :]  # (g*dk, n, m) — VPU
        kv = _k1d(base, t)
        if dk > 1:
            kv = jnp.prod(kv.reshape(len(comp_idx), dk, n, m), axis=1)  # (g, n, m)
        else:
            kv = kv.reshape(len(comp_idx), n, m)
        wg = w[jnp.asarray(comp_idx)]
        out = out + jnp.tensordot(wg, kv, axes=1)
    return out


def gram(spec: KernelSpec, params, buffers, x1, x2):
    """Dense Gram matrix K(x1, x2) — (n, m)."""
    if spec.is_projection:
        return _projection_gram(spec, params, buffers, x1, x2)
    if spec.family in LIMIT_FAMILIES:
        return _limit_gram(spec, params, x1, x2)
    return _full_d_gram(spec, params, x1, x2)


def gram_diag(spec: KernelSpec, params, buffers, x):
    """diag K(x, x) — (n,). All stationary pieces: k(0) per component."""
    n = x.shape[0]
    outputscale = softplus(params["raw_outputscale"])
    if not spec.is_projection:
        return jnp.full((n,), 1.0, x.dtype) * outputscale
    # k1d(0) == 1 for every supported base; prod over degree == 1.
    w = _component_scales(spec, params, x.dtype)
    return jnp.full((n,), 1.0, x.dtype) * jnp.sum(w)


# ---------------------------------------------------------------------------
# Blocked MVM: K(x1, x2) @ V without materializing (J, n, m)
# ---------------------------------------------------------------------------


def mvm(
    spec: KernelSpec,
    params,
    buffers,
    x1,
    x2,
    V,
    block_rows: int = 2048,
    allow_pallas: bool = False,
):
    """Compute K(x1, x2) @ V, (n, t), streaming row blocks of K.

    The iterative-inference workhorse (BBMM-CG's one op per iteration —
    reference analog [G] gpytorch/utils/linear_cg.py's matmul closure).
    Each block computes a (rows, m) Gram slab (all J components fused) and
    contracts with V immediately, so peak memory is O(J * block * m), never
    O(J * n * m). `lax.map` keeps the loop in XLA with static shapes; rows
    are padded to a whole number of blocks. The block size is auto-capped
    so the (J*d, block, m) intermediate stays within a fixed element
    budget (~64M elems = 256 MB f32) regardless of caller settings, and
    the per-block computation is rematerialized (jax.checkpoint) so
    reverse-mode through an MVM stores O(block * t), not the Gram slabs.
    """
    # Pallas fused Gram-MVM path: needs BOTH the call-site flag and the
    # RPAGP_PALLAS_GRAM=1 env opt-in — the XLA route measured faster on
    # every variant tried (docs/BENCHMARKS.md "Pallas vs XLA", round 2).
    if allow_pallas and spec.is_projection:
        from . import pallas_gram

        if pallas_gram.supports(spec) and pallas_gram.on_tpu():
            u1 = _projected_coords(spec, params, buffers, x1).T  # (n, M)
            u2 = u1 if x2 is x1 else _projected_coords(spec, params, buffers, x2).T
            w = _component_scales(spec, params, x1.dtype)
            return pallas_gram.projected_gram_mvm(
                u1, u2, w, V, base=spec.bases[0]
            )

    n, m = x1.shape[0], x2.shape[0]
    M_total = max(1, spec.total_proj_dims if spec.is_projection else 1)
    budget_elems = 1 << 26
    block_rows = min(block_rows, max(16, budget_elems // (M_total * max(m, 1))))
    nb = max(1, -(-n // block_rows))
    n_pad = nb * block_rows
    x1p = jnp.pad(x1, ((0, n_pad - n), (0, 0)))
    x1b = x1p.reshape(nb, block_rows, x1.shape[1])

    @jax.checkpoint
    def block_fn(xb):
        Kb = gram(spec, params, buffers, xb, x2)  # (block, m)
        # f32-accurate contraction: CG convergence stalls on bf16 MVM noise.
        return jnp.matmul(Kb, V, precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(block_fn, x1b)  # (nb, block, t)
    return out.reshape(n_pad, -1)[:n]
