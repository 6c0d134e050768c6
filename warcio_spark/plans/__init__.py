from . import frontier  # noqa: F401
