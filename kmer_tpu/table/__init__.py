from . import count_table  # noqa: F401
