from swift_tpu.sampling.solvers import (
    edm_sampler,
    ablation_sampler,
    dpm_solver,
    dpm_solver_2s,
    scm_solver,
    scm_solve2,
)
from swift_tpu.sampling.factory import sampler_factory, param_sampler_factory
from swift_tpu.sampling.rollout import forecast_rollout
from swift_tpu.sampling.ensemble import EnsembleRollout
