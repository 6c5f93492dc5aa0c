from .registry import register_engine_functions

__all__ = ["register_engine_functions"]
