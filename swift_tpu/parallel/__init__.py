from swift_tpu.parallel.mesh import (
    get_mesh,
    make_mesh,
    shard_batch,
    replicate,
)
from swift_tpu.parallel.pipeline import pipelined_swinv2_forward
