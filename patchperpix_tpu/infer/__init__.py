from .predict import predict_volume, predict_sample_to_zarr  # noqa: F401
from .decode import (decode_sample, decode_volume,  # noqa: F401
                     CodeDecoder, CodeAffReader)
