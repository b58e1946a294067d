from .metadata import FormatError, Metadata  # noqa: F401
