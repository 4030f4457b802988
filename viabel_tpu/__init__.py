"""viabel-tpu: TPU-native black-box variational inference.

A from-scratch JAX/XLA/Pallas redesign with the full capabilities of VIABEL
(https://github.com/jhuggins/viabel): black-box VI over parametric
approximation families, and computable posterior-error diagnostics.

Public API mirrors the reference's ``docs/source/api/api.rst`` surface:
approximation families, models, variational objectives, optimizers
(including the FASO and RAABBVI meta-optimizers), diagnostics, and the
``bbvi`` / ``vi_diagnostics`` convenience entry points — plus TPU-native
additions (``FullRankGaussian``, sharded/vmapped parallel estimation in
``viabel_tpu.parallel``, Pallas kernels in ``viabel_tpu.ops``).
"""

from .families import (
    ApproximationFamily,
    MFGaussian,
    MFStudentT,
    FullRankGaussian,
    MultivariateT,
    LRGaussian,
    NeuralNet,
    NVPFlow,
)
from .models import Model, SubsampledModel, TemperedModel, zoo
from .objectives import (
    VariationalObjective,
    StochasticVariationalObjective,
    ExclusiveKL,
    IWELBO,
    DISInclusiveKL,
    AlphaDivergence,
)
from .optimizers import (
    Optimizer,
    StochasticGradientOptimizer,
    RMSProp,
    AveragedRMSProp,
    Adam,
    AveragedAdam,
    Adagrad,
    WindowedAdagrad,
)
from .faso import FASO, RAABBVI
from .diagnostics import (
    all_diagnostics,
    error_bounds,
    wasserstein_bounds,
    divergence_bound,
    ksd,
    ksd_test,
)
from .psis import psislw, psisloo, gpdfitnew, gpinv, sumlogs
from .distributions import multivariate_t_logpdf
from .pathfinder import pathfinder, multipath_pathfinder, pathfinder_init
from .transforms import ParamSpec, TransformedModel
from .convenience import (bbvi, vi_diagnostics, elbo_estimates,
                          select_best_restart, pilot_standardize)
from . import checkpoint, hmc, ops, parallel, qmc, transforms

__version__ = "0.1.0"

__all__ = [
    # families
    "ApproximationFamily", "MFGaussian", "MFStudentT", "FullRankGaussian",
    "MultivariateT", "LRGaussian", "NeuralNet", "NVPFlow",
    # models
    "Model", "SubsampledModel", "TemperedModel", "zoo",
    # objectives
    "VariationalObjective", "StochasticVariationalObjective",
    "ExclusiveKL", "IWELBO", "DISInclusiveKL", "AlphaDivergence",
    # optimizers
    "Optimizer", "StochasticGradientOptimizer", "RMSProp", "AveragedRMSProp",
    "Adam", "AveragedAdam", "Adagrad", "WindowedAdagrad", "FASO", "RAABBVI",
    # diagnostics
    "all_diagnostics", "error_bounds", "wasserstein_bounds", "divergence_bound",
    "ksd", "ksd_test",
    "psislw", "psisloo", "gpdfitnew", "gpinv", "sumlogs",
    "multivariate_t_logpdf",
    # pathfinder
    "pathfinder", "multipath_pathfinder", "pathfinder_init",
    # constrained-parameter transforms
    "ParamSpec", "TransformedModel", "transforms",
    # randomized quasi-Monte Carlo base sampling
    "qmc",
    # convenience
    "bbvi", "vi_diagnostics", "elbo_estimates", "select_best_restart",
    "pilot_standardize",
]
