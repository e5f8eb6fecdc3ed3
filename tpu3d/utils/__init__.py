from tpu3d.utils.trace import Tracer, trace_span, get_tracer

__all__ = ["Tracer", "trace_span", "get_tracer"]
