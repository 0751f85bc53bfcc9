from swift_tpu.sampling.solvers import (
    edm_sampler,
    ablation_sampler,
    dpm_solver,
    dpm_solver_2s,
    scm_solver,
    scm_solve2,
)
from swift_tpu.sampling.factory import sampler_factory
