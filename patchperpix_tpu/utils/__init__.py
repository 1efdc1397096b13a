from . import io, postprocess, skeleton  # noqa: F401
