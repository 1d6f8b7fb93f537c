from vdx.utils.logging import EventLog, timed

__all__ = ["EventLog", "timed"]
