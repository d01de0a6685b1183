"""Model-spec config system: JSON specs -> frozen dataclass configs.

Rebuild of the reference's config layer ([U] model_specs/*.json consumed by
[U] gp_experiment_runner.py — unverified, SURVEY.md §5 "Config / flag
system"): JSON files describing kernel family, J, degree, projection
distribution, base kernel, SKI grid size, and optimizer settings, so
reference experiment specs translate 1:1. No hydra/gin — a frozen
dataclass + plain json, same as the reference's argparse+JSON approach.
"""

from __future__ import annotations

import dataclasses
import json

from ..models.exact_gp import ModelSpec
from ..ops.kernels import KernelSpec


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 0.1
    max_iters: int = 1000
    patience: int = 20
    rel_tol: float = 1e-6
    # LR schedule (reference analog: the optional torch.optim.lr_scheduler
    # wiring in [U] training_routines.py): "constant" | "cosine" | "step"
    lr_schedule: str = "constant"
    lr_decay_rate: float = 0.1  # cosine: final-lr fraction; step: decay x
    lr_decay_every: int = 0  # step schedule period (0 -> max_iters // 3)


def make_optimizer(tr: TrainConfig):
    """Adam with the configured LR schedule (optax)."""
    import optax

    if tr.lr_schedule == "constant":
        sched = tr.lr
    elif tr.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            tr.lr, decay_steps=max(1, tr.max_iters), alpha=tr.lr_decay_rate
        )
    elif tr.lr_schedule == "step":
        every = tr.lr_decay_every or max(1, tr.max_iters // 3)
        sched = optax.exponential_decay(
            tr.lr, transition_steps=every, decay_rate=tr.lr_decay_rate,
            staircase=True,
        )
    else:
        raise ValueError(f"unknown lr_schedule {tr.lr_schedule!r}")
    return optax.adam(sched)


@dataclasses.dataclass(frozen=True)
class ExperimentSpec:
    model: ModelSpec
    train: TrainConfig
    name: str = "experiment"
    model_family: str = "exact_gp"  # "exact_gp" | "svgp"
    # SVGP-only knobs
    num_inducing: int = 512
    batch_size: int = 1024


def kernel_spec_from_dict(d: dict) -> KernelSpec:
    typ = d.get("type", "rbf")
    if typ in ("rbf", "matern12", "matern32", "matern52"):
        return KernelSpec(family=typ, ard=bool(d.get("ard", True)))
    if typ in ("rp_limit", "rp_limit_rbf", "limit"):
        # closed-form J->inf RPA limit (gaussian projections + RBF base)
        return KernelSpec(family="rp_limit_rbf", ard=False)
    if typ in ("projection", "rp_poly", "polynomial_projection"):
        common = dict(
            proj_dist=d.get("proj_dist", "gaussian"),
            learn_proj=bool(d.get("learn_proj", False)),
            per_component_scale=bool(d.get("per_component_scale", False)),
            space_proj=bool(d.get("space_proj", False)),
            ski=bool(d.get("ski", False)),
            grid_size=int(d.get("grid_size", 0)),
            interp=str(d.get("interp", "dense")),
        )
        if "degrees" in d:  # generalized (heterogeneous) form
            bases = d.get("bases", ["rbf"] * len(d["degrees"]))
            return KernelSpec.generalized(d["degrees"], bases, **common)
        return KernelSpec.polynomial(
            J=int(d.get("J", 10)),
            d=int(d.get("d", 1)),
            k=int(d.get("k", 1)),
            base=d.get("base", "rbf"),
            **common,
        )
    raise ValueError(f"unknown kernel type {typ!r}")


def experiment_spec_from_dict(d: dict, name: str = "experiment") -> ExperimentSpec:
    kspec = kernel_spec_from_dict(d.get("kernel", {}))
    inf = d.get("inference", {})
    model = ModelSpec(
        kernel=kspec,
        mean=d.get("mean", "constant"),
        max_cholesky_size=int(inf.get("max_cholesky_size", 4096)),
        cg_tol=float(inf.get("cg_tol", 1e-2)),
        cg_max_iters=int(inf.get("cg_max_iters", 100)),
        precond_rank=int(inf.get("precond_rank", 15)),
        num_probes=int(inf.get("num_probes", 10)),
        mvm_block_rows=int(inf.get("mvm_block_rows", 4096)),
        love_rank=int(inf.get("love_rank", 0)),
        precond_refresh=int(inf.get("precond_refresh", 1)),
        solver=str(inf.get("solver", "auto")),
        grid_jitter=float(inf.get("grid_jitter", 1e-6)),
    )
    tr = d.get("training", {})
    train = TrainConfig(
        lr=float(tr.get("lr", 0.1)),
        max_iters=int(tr.get("max_iters", 1000)),
        patience=int(tr.get("patience", 20)),
        rel_tol=float(tr.get("rel_tol", 1e-6)),
        lr_schedule=str(tr.get("lr_schedule", "constant")),
        lr_decay_rate=float(tr.get("lr_decay_rate", 0.1)),
        lr_decay_every=int(tr.get("lr_decay_every", 0)),
    )
    return ExperimentSpec(
        model=model,
        train=train,
        name=d.get("name", name),
        model_family=d.get("model", "exact_gp"),
        num_inducing=int(d.get("num_inducing", 512)),
        batch_size=int(d.get("batch_size", 1024)),
    )


def load_spec(path: str) -> ExperimentSpec:
    with open(path) as f:
        d = json.load(f)
    name = path.rsplit("/", 1)[-1].removesuffix(".json")
    return experiment_spec_from_dict(d, name=name)
