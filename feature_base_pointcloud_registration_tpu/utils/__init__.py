from .timing import TicToc, StageTimer, trace_profile

__all__ = ["TicToc", "StageTimer", "trace_profile"]
