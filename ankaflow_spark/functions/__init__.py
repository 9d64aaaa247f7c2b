from .fn import register_engine_functions  # noqa: F401
