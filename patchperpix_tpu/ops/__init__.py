from . import np_reference, synthetic  # noqa: F401
