from tpufusion.serve.pipeline import LidarPipeline
from tpufusion.serve.replay import ReplayHarness, LatencyStats

__all__ = ["LidarPipeline", "ReplayHarness", "LatencyStats"]
