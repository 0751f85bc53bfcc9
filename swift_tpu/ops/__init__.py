from swift_tpu.ops.windows import window_partition, window_reverse, cyclic_shift
from swift_tpu.ops.embeddings import timestep_embedding
