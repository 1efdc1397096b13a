from .predict import predict_volume, predict_sample_to_zarr  # noqa: F401
from .decode import decode_sample  # noqa: F401
