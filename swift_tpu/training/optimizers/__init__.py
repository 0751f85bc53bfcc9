from swift_tpu.training.optimizers.muon import (
    muon,
    muon_with_aux_adam,
    newton_schulz,
)
from swift_tpu.training.optimizers.mars import mars
