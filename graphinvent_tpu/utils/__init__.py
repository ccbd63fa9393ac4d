from graphinvent_tpu.utils.logging import JobLogger

__all__ = ["JobLogger"]
