from swift_tpu.training.loss import (
    EDMLoss,
    TrigFlowLoss,
    SCMLoss,
    MSELoss,
    CRPSLoss,
    latitude_weights,
    variable_weights,
)
