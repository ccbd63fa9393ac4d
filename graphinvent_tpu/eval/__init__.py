from graphinvent_tpu.eval.properties import graph_set_properties
from graphinvent_tpu.eval.analyzer import Analyzer

__all__ = ["graph_set_properties", "Analyzer"]
