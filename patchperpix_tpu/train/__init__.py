from .data import (AugmentConfig, CropSampler, Prefetcher, SampleData,
                   SamplerConfig, load_sample)  # noqa: F401
from .device_data import (DeviceSampler,
                          device_sampler_supported)  # noqa: F401
from .trainer import (TrainConfig, get_latest_checkpoint, load_checkpoint,
                      make_train_step, save_checkpoint,
                      train_until)  # noqa: F401
