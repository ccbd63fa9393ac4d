from graphinvent_tpu.sampling.generator import GraphSampler, SampleResult

__all__ = ["GraphSampler", "SampleResult"]
