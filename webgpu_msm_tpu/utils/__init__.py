from . import convert, fixtures  # noqa: F401
