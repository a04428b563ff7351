from .metric_main import calc_metric, register_metric, list_metrics  # noqa: F401
