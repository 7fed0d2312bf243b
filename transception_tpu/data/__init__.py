from transception_tpu.data.synapse import (  # noqa: F401
    SynapseSliceDataset,
    SynapseVolumeDataset,
    SyntheticSliceDataset,
    SyntheticVolumeDataset,
)
from transception_tpu.data.loader import HostDataLoader  # noqa: F401
