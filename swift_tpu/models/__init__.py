from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.models.precond import EDMPrecond, PassPrecond, Network
