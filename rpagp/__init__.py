"""rpagp — TPU-native Randomly Projected Additive Gaussian Processes.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference repo idelbrid/Randomly-Projected-Additive-GPs (Delbridge, Bindel
& Wilson, ICML 2020, arXiv:1912.12834) *and* of the GPyTorch inference
engine it sits on — rebuilt TPU-first. See SURVEY.md for the layer map and
reference pointers.

Public surface:
  KernelSpec / ModelSpec          — static configs
  init_model / exact_mll / predict — model layer (models.exact_gp)
  mll                              — unified exact/iterative MLL (mll.py)
  posterior / posterior_cov / sample_posterior — predictive API (mll.py)
  make_predictor                   — cached eval-mode predictor (mll.py)
  train_to_convergence / train_fixed — hyperparameter optimization
  gen_rp                           — random projection sampling
  load_dataset / kfold_splits      — UCI data layer
"""

import time as _time

_IMPORT_T0 = _time.perf_counter()  # pre-jax timestamp (RPAGP_TIMING)

from .ops.kernels import KernelSpec
from .models.exact_gp import ModelSpec, init_model, exact_mll, predict
from .mll import (mll, posterior, posterior_cov, sample_posterior,
                  make_predictor)
from .projections import gen_rp, space_equally
from .train import train_to_convergence, train_fixed
from .utils.datasets import load_dataset, kfold_splits, single_split

__version__ = "0.1.0"
