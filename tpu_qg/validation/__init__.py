from .twin import ReferenceTwin  # noqa: F401
