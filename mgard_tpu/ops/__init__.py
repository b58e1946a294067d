from . import axis, refactor  # noqa: F401
