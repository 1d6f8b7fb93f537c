from vdx.analysis import basic, comprehensive
from vdx.analysis.common import METRICS_07, METRICS_08, PRIMARY_METRICS, load_results

__all__ = ["basic", "comprehensive", "METRICS_07", "METRICS_08", "PRIMARY_METRICS", "load_results"]
