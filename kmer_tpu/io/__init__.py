from . import fastx, packing  # noqa: F401
