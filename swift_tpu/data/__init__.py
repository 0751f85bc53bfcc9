from swift_tpu.data.era5 import ERA5Dataset, ERA5RollOutDataset
from swift_tpu.data.samplers import InfiniteSampler, DeltaBatchSampler, AttributeSubset
