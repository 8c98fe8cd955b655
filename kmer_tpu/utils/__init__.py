from . import cli, log  # noqa: F401
