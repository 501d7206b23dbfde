from .build import NativeBuildError, build, load  # noqa: F401
